"""Runtime bloom join filter (operators/runtimefilter.py): the
prefiltered join must equal the plain join exactly (superset + real
join), the prefilter must pass a strict subset on selective keys,
the predicate must stay scan-stage (no exchange), and NULL keys are
dropped."""

from __future__ import annotations

from pyspark.sql import functions as F

from funding_monitoring_spark.operators.runtimefilter import (
    bloom_mask_words,
    bloom_prefilter,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bloom_prefilter_join_equals_plain_join(spark):
    probe = spark.createDataFrame(
        [(i, i % 500) for i in range(20_000)], "id long, k long"
    ).repartition(8)
    build = spark.createDataFrame(
        [(j,) for j in (3, 77, 250, 499)], "k long"
    )
    words = bloom_mask_words(build, F.col("k"))
    pre = bloom_prefilter(probe, F.col("k"), words)
    got = sorted(
        tuple(r) for r in pre.join(F.broadcast(build), "k").collect()
    )
    want = sorted(
        tuple(r) for r in probe.join(F.broadcast(build), "k").collect()
    )
    assert got == want and len(got) == 4 * 40


def test_bloom_prefilter_strict_subset_and_superset(spark):
    probe = spark.createDataFrame(
        [(i, i % 500) for i in range(20_000)], "id long, k long"
    )
    build = spark.createDataFrame([(7,), (123,)], "k long")
    words = bloom_mask_words(build, F.col("k"))
    n_pre = bloom_prefilter(probe, F.col("k"), words).count()
    n_match = probe.filter(F.col("k").isin(7, 123)).count()
    assert n_match <= n_pre  # never drops a real match
    assert n_pre < 20_000  # actually filters
    # at 2 keys x 4 bits in 4096, false positives should be rare
    assert n_pre <= n_match * 4


def test_bloom_prefilter_drops_null_keys(spark):
    probe = spark.createDataFrame(
        [(1, 7), (2, None), (3, 8)], "id long, k long"
    )
    build = spark.createDataFrame([(7,), (8,)], "k long")
    words = bloom_mask_words(build, F.col("k"))
    got = {r.id for r in bloom_prefilter(probe, F.col("k"), words).collect()}
    assert got == {1, 3}


def test_bloom_prefilter_is_scan_stage(spark):
    """The predicate must evaluate before any exchange: the filtered
    frame's physical plan contains no Exchange at all (filter over
    scan), and no Python eval node (pure column algebra)."""
    probe = spark.createDataFrame(
        [(i, i % 50) for i in range(1000)], "id long, k long"
    )
    build = spark.createDataFrame([(7,)], "k long")
    words = bloom_mask_words(build, F.col("k"))
    plan = _plan(bloom_prefilter(probe, F.col("k"), words))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_bloom_mask_words_layout(spark):
    """63-bit word layout: every word fits a non-negative bigint, and
    a key's bits land where the probe side will look for them."""
    build = spark.createDataFrame([(42,)], "k long")
    words = bloom_mask_words(build, F.col("k"))
    assert len(words) == -(-4096 // 63)
    assert all(0 <= w < 2**63 for w in words)
    assert sum(bin(w).count("1") for w in words) <= 4  # k hashes


def test_bloom_mask_words_tolerates_null_build_keys(spark):
    """A NULL build-side key must be dropped before hashing (the
    probe side already drops NULLs), not crash the driver collect."""
    build = spark.createDataFrame(
        [(3,), (None,), (77,)], "k long"
    )
    words = bloom_mask_words(build, F.col("k"))
    probe = spark.createDataFrame(
        [(i, k) for i, k in enumerate([3, 77, 200, None])],
        "id long, k long",
    )
    got = sorted(
        r.id for r in bloom_prefilter(probe, F.col("k"), words).collect()
    )
    assert 0 in got and 1 in got and 3 not in got
