"""Parquet table sources with schema awareness.

The reference's table scans (ORM queries evaluated by Postgres,
reference scripts/funding_stats_etl.py:21-36) become parquet scans here;
Catalyst pushes filters/column pruning into the scan, which is the
Spark analogue of "the database executes the predicate" (SURVEY.md §2.1
S5). At 100 TB, fact tables are expected to be laid out as
date-partitioned parquet/lakehouse directories so partition pruning
kicks in before file listing; the loader accepts either a single
``<table>.parquet`` file (the fixture layout) or a partitioned dir.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from funding_monitoring_spark.schemas import FIXTURE_TABLES

FIXTURE_TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    """Fixture layout: one ``<name>.parquet`` per table; fall back to a
    ``<name>/`` directory for partitioned layouts."""
    flat = os.path.join(sf_dir, f"{name}.parquet")
    return flat if os.path.exists(flat) else os.path.join(sf_dir, name)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. No eager schema cast: the fixture parquet already
    matches schemas.FIXTURE_TABLES, and staying with the file's own
    schema keeps predicate pushdown/column pruning trivially safe.

    Two normalizations, both for the events fixture's timestamp column:

    - parquet TIMESTAMP(NANOS) is illegal for Spark's vectorized
      reader, so it is read as a nanosecond long
      (legacy.parquet.nanosAsLong) and truncated to a microsecond
      timestamp — exactly what DuckDB/pandas do with ns timestamps.
    - parquet TIMESTAMP with isAdjustedToUTC=false surfaces as
      TIMESTAMP_NTZ, which Spark's instant functions (unix_micros,
      session_window, watermarks) reject. The session timezone is
      pinned to UTC (session.py), so casting NTZ→TIMESTAMP maps each
      wall-clock value to the same instant DuckDB's epoch_us sees.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    expected = FIXTURE_TABLES.get(name)
    if expected is not None:
        actual = {f.name: f.dataType for f in df.schema.fields}
        for field in expected.fields:
            if not isinstance(field.dataType, T.TimestampType):
                continue
            got = actual.get(field.name)
            if isinstance(got, T.LongType):
                # integer div: ns epochs overflow double's exact range
                df = df.withColumn(
                    field.name,
                    F.expr(f"timestamp_micros({field.name} div 1000)"),
                )
            elif isinstance(got, T.TimestampNTZType):
                df = df.withColumn(
                    field.name, F.col(field.name).cast("timestamp")
                )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in FIXTURE_TABLE_NAMES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Idempotent CREATE-TABLE-IF-NOT-EXISTS analogue (SURVEY.md §2.1 K6):
    register every fixture table as a temp view for spark.sql use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
