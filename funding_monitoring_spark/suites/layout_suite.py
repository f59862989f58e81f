"""Partition-pruned scan queries: the external correctness path
routed through a DATE-PARTITIONED materialization of the events
fixture (sources/layout.write_date_partitioned), so directory-level
pruning — the lever that deletes whole categories of work at 100 TB —
is exercised by the oracle-checked driver queries themselves, not
only by tests/test_layout.py.

The fixture ships as one flat parquet file (TESTDATA.md), so the
partitioned copy is materialized once per (fixture, session) into a
tempdir and shared by every query here — same data, different
physical layout, identical results; the oracles run on the flat file.
A plan gate (tests/test_plans.py) asserts the scans carry the
partition filter and read strictly fewer partitions than exist.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from funding_monitoring_spark.registry import query
from funding_monitoring_spark.sources.layout import (
    date_bounds_filter,
    write_date_partitioned,
)
from funding_monitoring_spark.sources.tables import load_table

#: pruned window: 7 of the fixture's 30 event days
PRUNE_LO = "2024-01-10"
PRUNE_HI = "2024-01-16"

_PARTITIONED_CACHE: dict[str, str] = {}


def partitioned_events_path(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once per fixture per session) the events table
    partitioned by event_date; return the path."""
    key = os.path.abspath(sf_dir)
    if key not in _PARTITIONED_CACHE:
        events = load_table(spark, sf_dir, "events")
        path = os.path.join(
            tempfile.mkdtemp(prefix="fm_part_events_"), "events"
        )
        write_date_partitioned(events, path, "ts")
        _PARTITIONED_CACHE[key] = path
    return _PARTITIONED_CACHE[key]


def pruned_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The partitioned store filtered to the pruned window: the
    partition-column predicate (date_bounds_filter) prunes
    directories before file listing; the timestamp predicate keeps
    row-level semantics identical to the flat-file oracle."""
    df = spark.read.parquet(partitioned_events_path(spark, sf_dir))
    return df.filter(
        date_bounds_filter(PRUNE_LO, PRUNE_HI)
        & (F.col("ts") >= F.lit(f"{PRUNE_LO} 00:00:00"))
        & (F.col("ts") < F.lit("2024-01-17 00:00:00"))
    )


@query(
    "pruned_time_range_stats",
    f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           ROUND(SUM(value), 4) AS sum_value
    FROM events
    WHERE ts >= TIMESTAMP '{PRUNE_LO} 00:00:00'
      AND ts < TIMESTAMP '2024-01-17 00:00:00'
    GROUP BY event_type
    """,
)
def q_pruned_time_range_stats(spark, sf_dir):
    """Time-range aggregate over the date-partitioned store: the scan
    lists only the 7 in-range partition directories out of 30 (gated
    in tests/test_plans.py), then aggregates per event type — the
    reference's lookback-scan shape with the 100 TB layout."""
    return pruned_events(spark, sf_dir).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


@query(
    "pruned_daily_rollup",
    f"""
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS event_date,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 4) AS sum_value
    FROM events
    WHERE ts >= TIMESTAMP '{PRUNE_LO} 00:00:00'
      AND ts < TIMESTAMP '2024-01-17 00:00:00'
    GROUP BY 1
    """,
)
def q_pruned_daily_rollup(spark, sf_dir):
    """Per-day rollup grouped directly on the PARTITION column of the
    pruned store — grouping key comes from the directory layout, no
    derived-column work, and the scan reads 7 of 30 directories."""
    return pruned_events(spark, sf_dir).groupBy(
        F.col("event_date").cast("string").alias("event_date")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )
