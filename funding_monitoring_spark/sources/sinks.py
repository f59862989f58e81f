"""Batch sinks (SURVEY.md §2.1 K3-K6).

The reference's write paths: TRUNCATE + tab-separated CSV bulk load
(K3/K5, active_futures_etl.py:90-104, kucoin_lending_dag.py:47),
drop-and-recreate replace (K4, funding_stats_etl.py:128), idempotent
DDL (K6, models.py:82). Spark equivalents: mode("overwrite") writes
(atomic per path), tab-sep headerless CSV, and temp-view registration
(sources.tables.register_temp_views).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def overwrite_parquet(df: DataFrame, path: str) -> None:
    """K3/K4: snapshot-replace — the TRUNCATE-reload / to_sql-replace
    analogue. Parquet overwrite is atomic per directory commit."""
    df.write.mode("overwrite").parquet(path)


def write_tsv(df: DataFrame, path: str) -> None:
    """K5: tab-separated, headerless CSV — the reference's bulk-load
    intermediate format (active_futures_etl.py:103)."""
    (
        df.write.mode("overwrite")
        .option("sep", "\t")
        .option("header", "false")
        .option("emptyValue", "")
        .csv(path)
    )


def read_tsv(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Read back a K5 tab-separated extract with an explicit schema
    (the bulk-load consumer side)."""
    return (
        spark.read.schema(schema)
        .option("sep", "\t")
        .option("header", "false")
        .csv(path)
    )


def compact_parquet_store(
    spark, path: str, target_files: int
) -> tuple[int, int]:
    """Small-file compaction: rewrite a parquet store as
    ``target_files`` files, atomically (readers racing the rewrite
    see old or new, never partial — streaming/sinks.atomic_overwrite).
    Returns (files_before, files_after).

    The small-files problem is the steady-state failure mode of every
    micro-batch/upsert sink at scale: a 5-minute trigger writing 8
    shuffle partitions is ~2300 files/day/table, and scan-planning
    cost grows with file count, not data size. Compaction is the
    maintenance half of the sink contract; production runs it on a
    schedule against size thresholds (this API takes an explicit
    target so tests are deterministic).
    """
    from funding_monitoring_spark.streaming.sinks import atomic_overwrite

    def n_files(p: str) -> int:
        real = os.path.realpath(p)
        return sum(
            1 for f in os.listdir(real) if f.endswith(".parquet")
        )

    before = n_files(path)
    df = spark.read.parquet(path)
    atomic_overwrite(df.repartition(target_files), path)
    return before, n_files(path)
