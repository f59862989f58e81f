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
