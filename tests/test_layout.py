"""Physical-layout tests: partition pruning and exchange-free bucketed
joins — the plan-level evidence for the 100 TB layout story."""

from __future__ import annotations

import os
import re

import pytest
from pyspark.sql import functions as F

from funding_monitoring_spark.sources.layout import (
    date_bounds_filter,
    write_bucketed_table,
    write_date_partitioned,
)
from funding_monitoring_spark.sources.tables import load_table
from tests.test_plans import plan_str


def test_date_partition_pruning(spark, sf_dir, tmp_path):
    """A date-range predicate on the partition column must prune
    partitions in the scan (PartitionFilters), and results must match
    the unpartitioned scan."""
    events = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_by_date")
    write_date_partitioned(events, path, "ts")

    part = spark.read.parquet(path)
    lo, hi = "2024-01-03", "2024-01-05"
    pruned = part.filter(date_bounds_filter(lo, hi)).filter(
        (F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit("2024-01-06"))
    )
    plan = plan_str(pruned)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_date" in m.group(1), plan

    expected = events.filter(
        (F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit("2024-01-06"))
    ).count()
    assert pruned.count() == expected > 0


def test_bucketed_join_no_exchange(spark, sf_dir, tmp_path):
    """Two tables bucketed identically on the join key must join with
    ZERO exchanges (co-located join — the recurring-join layout)."""
    warehouse_db = "layout_test_db"
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS {warehouse_db} "
        f"LOCATION '{tmp_path / 'warehouse'}'"
    )
    try:
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        lineitem = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_quantity"
        )
        write_bucketed_table(
            spark, orders, f"{warehouse_db}.orders_b", ["o_orderkey"], 8
        )
        write_bucketed_table(
            spark,
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
            f"{warehouse_db}.lineitem_b",
            ["o_orderkey"],
            8,
        )
        o = spark.table(f"{warehouse_db}.orders_b")
        li = spark.table(f"{warehouse_db}.lineitem_b")
        joined = o.join(li, "o_orderkey").groupBy("o_custkey").agg(
            F.sum("l_quantity").alias("qty")
        )
        # fixtures are broadcast-small; force the shuffle-join planner
        # path to show the bucket layout removes the join exchanges
        # (at 100 TB neither side broadcasts and this IS the plan)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = plan_str(joined)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        join_part = plan.split("SortMergeJoin")[-1]
        assert "Exchange" not in join_part, plan
        assert "SelectedBucketsCount: 8 out of 8" in plan, plan
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {warehouse_db} CASCADE")


def test_partitioned_layout_loadable_via_table_path(spark, sf_dir, tmp_path):
    """sources.tables.load_table accepts a partitioned directory layout
    (the `<name>/` fallback) transparently."""
    events = load_table(spark, sf_dir, "events")
    alt_sf = tmp_path / "alt_sf"
    os.makedirs(alt_sf)
    write_date_partitioned(events, str(alt_sf / "events"), "ts")
    back = load_table(spark, str(alt_sf), "events")
    assert back.count() == events.count()
