"""Schema-on-read alignment for multi-generation stores."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from funding_monitoring_spark.sources.evolution import (
    align_to_schema,
    read_evolving_parquet,
)

TARGET = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.DoubleType()),
        T.StructField("tag", T.StringType()),
    ]
)


def test_generations_union_and_align(spark, tmp_path):
    """Gen-1 files (k int, v float) + gen-2 files (k long, v double,
    tag string) read as ONE stable target schema: old rows get typed
    NULL tags, narrow ints/floats widen explicitly."""
    store = str(tmp_path / "store")
    spark.createDataFrame(
        [(1, 1.5), (2, 2.5)], "k int, v float"
    ).write.mode("append").parquet(store)
    spark.createDataFrame(
        [(3, 3.5, "new")], "k long, v double, tag string"
    ).write.mode("append").parquet(store)
    out = read_evolving_parquet(spark, store, TARGET)
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "bigint",
        "double",
        "string",
    ]
    rows = {r.k: (r.v, r.tag) for r in out.collect()}
    assert rows[1] == (1.5, None)
    assert rows[3] == (3.5, "new")


def test_extra_column_rejected_unless_opted_in(spark):
    df = spark.createDataFrame(
        [(1, 1.0, "t", "oops")], "k long, v double, tag string, junk string"
    )
    with pytest.raises(ValueError, match="junk"):
        align_to_schema(df, TARGET)
    pruned = align_to_schema(df, TARGET, allow_extra=True)
    assert pruned.columns == ["k", "v", "tag"]


def test_narrowing_drift_fails_loudly(spark, tmp_path):
    """A stored double must NOT silently cast down: the DataFrame-level
    aligner raises, and the explicit-schema reader fails the scan."""
    df = spark.createDataFrame([(1, 1.0, 2.0)], "k long, v double, tag double")
    with pytest.raises(ValueError, match="tag"):
        align_to_schema(df, TARGET)
    store = str(tmp_path / "store")
    spark.createDataFrame(
        [(1, 1.0)], "k long, v double"
    ).write.parquet(store)
    narrow = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.IntegerType())]
    )
    with pytest.raises(Exception, match="MISMATCH|mismatch"):
        read_evolving_parquet(spark, store, narrow).collect()


def test_alignment_stays_in_scan(spark, tmp_path):
    """The alignment is projection-only: no exchange in the plan."""
    store = str(tmp_path / "store")
    spark.createDataFrame([(1, 1.5)], "k int, v float").write.parquet(store)
    out = read_evolving_parquet(spark, store, TARGET).filter(
        F.col("k") > 0
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_lossy_widening_needs_opt_in(spark):
    """long->double rounds above 2^53, so it must be an explicit
    choice, not a silent default."""
    df = spark.createDataFrame([((1 << 60) + 1,)], "v long")
    target = T.StructType([T.StructField("v", T.DoubleType())])
    with pytest.raises(ValueError, match="allow_lossy"):
        align_to_schema(df, target)
    out = align_to_schema(df, target, allow_lossy=True)
    assert out.schema == target


# ---- property test: random generation splits round-trip ----------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

#: (narrow, wide) spark-sql type pairs drawn per column — identity or a
#: value-preserving widening from _SAFE_WIDENINGS
_TYPE_PAIRS = [
    ("int", "int"),
    ("int", "long"),
    ("short", "int"),
    ("short", "long"),
    ("float", "float"),
    ("float", "double"),
    ("int", "double"),
    ("long", "long"),
    ("string", "string"),
]


def _py_val(draw, sql_type, i):
    if sql_type in ("short",):
        return draw(st.integers(-32768, 32767))
    if sql_type in ("int",):
        return draw(st.integers(-(2**31), 2**31 - 1))
    if sql_type in ("long",):
        # keep within 2^53 so a double target could never be the
        # explanation for a mismatch (long->double is gated anyway)
        return draw(st.integers(-(2**53), 2**53))
    if sql_type in ("float", "double"):
        # quarter-grid floats survive float32<->float64 exactly
        return draw(st.integers(-4000, 4000)) / 4.0
    return draw(st.text(alphabet="abcXYZ", max_size=6))


@st.composite
def _generations(draw):
    n_cols = draw(st.integers(1, 4))
    pairs = [
        draw(st.sampled_from(_TYPE_PAIRS)) for _ in range(n_cols)
    ]
    extra = draw(st.booleans())  # gen-2-only column
    n1 = draw(st.integers(1, 4))
    n2 = draw(st.integers(1, 4))
    gen1 = [
        tuple(
            _py_val(draw, pairs[c][0], i) for c in range(n_cols)
        )
        for i in range(n1)
    ]
    gen2 = [
        tuple(
            [_py_val(draw, pairs[c][1], i) for c in range(n_cols)]
            + ([_py_val(draw, "string", i)] if extra else [])
        )
        for i in range(n2)
    ]
    return pairs, extra, gen1, gen2


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(data=_generations())
def test_random_generation_split_roundtrips(data, spark, tmp_path_factory):
    """PROPERTY: for any column set with value-preserving widenings and
    an optional gen-2-only column, writing gen-1 narrow + gen-2 wide
    and reading through read_evolving_parquet equals aligning each
    generation with align_to_schema and unioning — same multiset of
    rows, same stable schema."""
    pairs, extra, gen1, gen2 = data
    cols = [f"c{i}" for i in range(len(pairs))]
    narrow_ddl = ", ".join(
        f"{c} {p[0]}" for c, p in zip(cols, pairs)
    )
    wide_ddl = ", ".join(f"{c} {p[1]}" for c, p in zip(cols, pairs))
    if extra:
        wide_ddl += ", extra string"
    store = str(tmp_path_factory.mktemp("evo") / "store")
    df1 = spark.createDataFrame(gen1, narrow_ddl)
    df2 = spark.createDataFrame(gen2, wide_ddl)
    df1.write.mode("append").parquet(store)
    df2.write.mode("append").parquet(store)
    target = df2.schema

    via_reader = read_evolving_parquet(spark, store, target)
    via_align = align_to_schema(df1, target).unionByName(
        align_to_schema(df2, target)
    )
    assert via_reader.schema == target == via_align.schema
    none_last = lambda t: tuple((v is None, v) for v in t)
    got = sorted(map(tuple, via_reader.collect()), key=none_last)
    want = sorted(map(tuple, via_align.collect()), key=none_last)
    assert got == want
