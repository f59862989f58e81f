"""Properties of deterministic key-hash sampling that the differential
oracle can't express: run-to-run determinism, nested samples,
train/test disjointness, and plan quality (predicate stays in the
scan stage — no shuffle)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from funding_monitoring_spark.operators.sampling import (
    hash_sample,
    train_test_split,
)
from funding_monitoring_spark.plans import plan_string
from funding_monitoring_spark.sources.tables import load_table


def _ids(df):
    return {r[0] for r in df.select("doc_id").collect()}


def test_sample_deterministic_across_runs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = _ids(hash_sample(docs, "doc_id", 0.3, seed=11))
    b = _ids(hash_sample(docs, "doc_id", 0.3, seed=11))
    assert a == b and a


def test_samples_nest_by_fraction(spark, sf_dir):
    """Threshold sampling: a smaller fraction is a subset of a larger
    one at the same seed — lets a pipeline grow its sample without
    re-selecting from scratch."""
    docs = load_table(spark, sf_dir, "documents")
    small = _ids(hash_sample(docs, "doc_id", 0.1, seed=3))
    big = _ids(hash_sample(docs, "doc_id", 0.4, seed=3))
    assert small < big


def test_different_seeds_differ(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = _ids(hash_sample(docs, "doc_id", 0.3, seed=1))
    b = _ids(hash_sample(docs, "doc_id", 0.3, seed=2))
    assert a != b


def test_train_test_exact_partition(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    split = train_test_split(docs, "doc_id", 0.8, seed=5)
    train = _ids(split.filter(F.col("split") == "train"))
    test = _ids(split.filter(F.col("split") == "test"))
    assert train.isdisjoint(test)
    assert len(train) + len(test) == docs.count()
    # roughly the requested ratio (hash mixes the keyspace)
    assert 0.6 < len(train) / docs.count() < 0.95


def test_sample_predicate_no_shuffle(spark, sf_dir):
    """The sampling predicate must evaluate scan-side: no exchange in
    the plan, and only the needed columns read."""
    docs = load_table(spark, sf_dir, "documents")
    plan = plan_string(hash_sample(docs, "doc_id", 0.2).select("doc_id"))
    assert not re.search(r"Exchange", plan), plan
    assert "BatchEvalPython" not in plan, plan


def test_weighted_priority_sample_prefers_heavy_rows(spark, sf_dir):
    """Priority sampling properties: exactly k rows per group,
    deterministic across runs, and weight-proportional — the sampled
    rows' mean weight exceeds the population mean (longer docs are
    proportionally likelier under q = w/u)."""
    from pyspark.sql import functions as F

    from funding_monitoring_spark.operators.sampling import (
        weighted_priority_sample,
    )
    from funding_monitoring_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    s1 = weighted_priority_sample(
        docs, "lang", "doc_id", "n_chars", 10, seed=7
    )
    rows = s1.collect()
    per_group = {}
    for r in rows:
        per_group.setdefault(r.lang, []).append(r.doc_id)
    n_langs = docs.select("lang").distinct().count()
    assert len(per_group) == n_langs
    for ids in per_group.values():
        assert len(ids) == 10 and len(set(ids)) == 10

    # determinism: a second evaluation selects the identical rows
    s2 = weighted_priority_sample(
        docs, "lang", "doc_id", "n_chars", 10, seed=7
    )
    assert sorted((r.lang, r.doc_id) for r in s2.collect()) == sorted(
        (r.lang, r.doc_id) for r in rows
    )

    pop_mean = docs.agg(F.avg("n_chars")).collect()[0][0]
    samp_mean = s1.agg(F.avg("n_chars")).collect()[0][0]
    assert samp_mean > pop_mean, (samp_mean, pop_mean)
