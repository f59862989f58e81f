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


def test_zorder_bounds_both_dimensions(spark, tmp_path):
    """The z-order claim, measured on real parquet footers: on a
    128×128 grid written as 16 files, the x-sorted layout leaves the
    y min/max stats useless (every file spans all of y → zero file
    skipping for y predicates), while the z-ordered layout bounds the
    span on BOTH dimensions — point predicates on either column prune
    most files."""
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    from funding_monitoring_spark.operators.zorder import write_zordered

    grid = spark.range(128 * 128).select(
        (F.col("id") % 128).cast("int").alias("x"),
        (F.col("id") / 128).cast("int").alias("y"),
    )

    def file_ranges(path, col):
        ranges = []
        for f in sorted(os.listdir(path)):
            if not f.endswith(".parquet"):
                continue
            meta = pq.ParquetFile(os.path.join(path, f)).metadata
            idx = meta.schema.names.index(col)
            lo = min(
                meta.row_group(g).column(idx).statistics.min
                for g in range(meta.num_row_groups)
            )
            hi = max(
                meta.row_group(g).column(idx).statistics.max
                for g in range(meta.num_row_groups)
            )
            ranges.append((lo, hi))
        assert len(ranges) >= 8, ranges
        return ranges

    def avg_candidate_files(path, col):
        """Mean number of files a point predicate on `col` cannot
        skip, over 16 probe points (what min/max pruning actually
        buys; robust to the odd file straddling a Morton boundary —
        range-sampled splits aren't bit-aligned)."""
        ranges = file_ranges(path, col)
        probes = range(4, 128, 8)
        return sum(
            sum(1 for lo, hi in ranges if lo <= p <= hi) for p in probes
        ) / len(list(probes))

    xsorted = str(tmp_path / "xsorted")
    (
        grid.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(xsorted)
    )
    zordered = str(tmp_path / "zordered")
    write_zordered(grid, zordered, F.col("x"), F.col("y"), n_files=16)

    # x-sorted: y statistics are useless — no file is ever skipped
    assert avg_candidate_files(xsorted, "y") >= 15.5
    # z-ordered: a point predicate on EITHER column prunes most of
    # the 16 files (ideal Morton quadrants → 4 candidates; allow
    # straddlers from the sampled range boundaries)
    assert avg_candidate_files(zordered, "x") <= 7
    assert avg_candidate_files(zordered, "y") <= 7


def test_bucketed_join_revenue_query_no_join_exchange(spark, sf_dir):
    """The REGISTERED bucketed_join_revenue query (not just the layout
    helper) must plan its join exchange-free over the bucketed
    tables: with broadcast disabled (the 100 TB regime), the only
    Exchange left is the post-join status aggregation."""
    from funding_monitoring_spark import registry

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_str(
            registry.queries()["bucketed_join_revenue"](spark, sf_dir)
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    join_part = plan.split("Join")[-1]
    assert "Exchange" not in join_part, plan
    assert "SelectedBucketsCount: 8 out of 8" in plan, plan
    # exactly one exchange total: the grouping on o_orderstatus
    import re as _re

    assert len(_re.findall(r"Exchange hash", plan)) == 1, plan
