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


_BUCKETED_DB: dict[str, str] = {}


def bucketed_order_tables(
    spark: SparkSession, sf_dir: str
) -> tuple[str, str]:
    """Materialize (once per fixture per session) orders and lineitem
    bucketed 8-ways on the order key into a tempdir-backed database;
    return the two table names. Recurring order-grain joins over
    these read matching buckets directly — exchange-free when the
    planner picks the shuffle join (gated with broadcast disabled in
    tests/test_layout.py); the Spark analogue of the co-located joins
    the reference gets from Postgres-side indexes."""
    from funding_monitoring_spark.sources.layout import (
        write_bucketed_table,
    )

    key = os.path.abspath(sf_dir)
    if key not in _BUCKETED_DB:
        import hashlib

        # stable name (Python hash() is process-salted)
        db = f"fm_bucketed_{hashlib.md5(key.encode()).hexdigest()[:8]}"
        loc = tempfile.mkdtemp(prefix="fm_bucketed_wh_")
        spark.sql(
            f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{loc}'"
        )
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus", "o_orderpriority"
        )
        lineitem = (
            load_table(spark, sf_dir, "lineitem")
            .select(
                F.col("l_orderkey").alias("o_orderkey"),
                "l_quantity",
                "l_extendedprice",
                "l_discount",
            )
        )
        write_bucketed_table(
            spark, orders, f"{db}.orders_b", ["o_orderkey"], 8
        )
        write_bucketed_table(
            spark, lineitem, f"{db}.lineitem_b", ["o_orderkey"], 8
        )
        _BUCKETED_DB[key] = db
    db = _BUCKETED_DB[key]
    return f"{db}.orders_b", f"{db}.lineitem_b"


@query(
    "bucketed_join_revenue",
    """
    SELECT o.o_orderstatus AS status,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(SUM(l.l_quantity), 6) AS sum_qty,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
)
def q_bucketed_join_revenue(spark, sf_dir):
    """The recurring order-grain join routed through the BUCKETED
    layout: both sides pre-bucketed 8-ways on the order key, so the
    join reads matching buckets instead of shuffling either table —
    the external correctness row for the co-located-join story
    (exchange-freeness itself is plan-gated with broadcast disabled
    in tests/test_layout.py). Money sums aggregate in DECIMAL(18,6)
    for order-independent exactness, same policy as TPC-H Q1."""
    o_name, l_name = bucketed_order_tables(spark, sf_dir)
    o = spark.table(o_name)
    li = spark.table(l_name)
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        o.join(li, "o_orderkey")
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.sum(disc.cast("decimal(18,6)"))
            .cast("double")
            .alias("revenue"),
        )
    )


@query(
    "store_compaction_report",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           ROUND(SUM(value), 4) AS sum_value,
           CAST(MIN(event_id) AS BIGINT) AS min_event,
           CAST(MAX(event_id) AS BIGINT) AS max_event
    FROM events
    """,
)
def q_store_compaction_report(spark, sf_dir):
    """Small-file compaction as an oracle-checked operation: fragment
    a copy of the events table into per-append small files (the shape
    a 5-minute append sink produces), run
    operators/maintenance.compact_store, and aggregate the COMPACTED
    store — the oracle computes the same aggregates from the raw
    table, so any row lost or duplicated by the rewrite breaks the
    hash. File-count and partition-layout guarantees are asserted in
    tests/test_maintenance.py; this row proves content preservation
    in the external path."""
    import tempfile as _tf

    from funding_monitoring_spark.operators.maintenance import (
        compact_store,
    )

    events = load_table(spark, sf_dir, "events")
    store = os.path.join(_tf.mkdtemp(prefix="fm_compact_"), "events")
    # 4 fragmented appends: split by event_id stripe, several files each
    for stripe in range(4):
        events.filter(
            F.pmod(F.col("event_id"), F.lit(4)) == stripe
        ).repartition(4).write.mode("append").parquet(store)
    compact_store(spark, store)
    return spark.read.parquet(store).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.min("event_id").alias("min_event"),
        F.max("event_id").alias("max_event"),
    )


@query(
    "schema_evolution_read",
    """
    WITH gen AS (
        SELECT event_id,
               CASE WHEN event_id % 2 = 0
                    THEN CAST(CAST(value AS FLOAT) AS DOUBLE)
                    ELSE value END AS value,
               CASE WHEN event_id % 2 = 0 THEN NULL
                    ELSE event_type END AS event_type
        FROM events
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_gen1,
           ROUND(SUM(value), 4) AS sum_value,
           CAST(MAX(event_id) AS BIGINT) AS max_event
    FROM gen
    """,
)
def q_schema_evolution_read(spark, sf_dir):
    """Multi-generation store read at one declared schema
    (sources/evolution.read_evolving_parquet): generation 1 is
    written narrow (int event_id, float value, no event_type column —
    the store's original shape), generation 2 wide; the explicit-
    schema read widens gen-1 physically in the vectorized reader and
    materializes its missing column as typed NULLs. The oracle
    replays the same float round-trip (CAST to FLOAT and back is the
    identical IEEE conversion on both engines) and NULL pattern from
    the raw table, so a mis-widened value or mis-defaulted column
    breaks the hash."""
    import tempfile as _tf

    from pyspark.sql import types as T

    from funding_monitoring_spark.sources.evolution import (
        read_evolving_parquet,
    )

    events = load_table(spark, sf_dir, "events")
    store = os.path.join(_tf.mkdtemp(prefix="fm_evolve_"), "events")
    gen1 = events.filter(F.col("event_id") % 2 == 0).select(
        F.col("event_id").cast("int").alias("event_id"),
        F.col("value").cast("float").alias("value"),
    )
    gen1.write.mode("append").parquet(store)
    gen2 = events.filter(F.col("event_id") % 2 == 1).select(
        "event_id", "value", "event_type"
    )
    gen2.write.mode("append").parquet(store)
    target = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    out = read_evolving_parquet(spark, store, target)
    return out.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col("event_type").isNull(), 1).otherwise(0)
        ).alias("n_gen1"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.max("event_id").alias("max_event"),
    )


@query(
    "snapshot_time_travel_read",
    """
    WITH striped AS (
        SELECT event_id, value, event_id % 3 AS stripe FROM events
    )
    SELECT CAST(v.version AS INT) AS version,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(SUM(s.value), 4) AS sum_value,
           CAST(MAX(s.event_id) AS BIGINT) AS max_event
    FROM (VALUES (1), (2), (3)) AS v(version)
    JOIN striped s ON s.stripe < v.version
    GROUP BY 1
    """,
)
def q_snapshot_time_travel_read(spark, sf_dir):
    """Versioned commits + time travel (sources/snapshots.py): three
    APPEND commits build the store stripe by stripe (immutable data
    files + one JSON manifest per version — the Iceberg/Delta
    skeleton), then every historical version is read back AS OF its
    manifest and aggregated. The oracle reconstructs each version's
    expected content from the raw table (version N sees stripes < N),
    so a commit that loses, duplicates, or leaks rows across
    snapshots breaks the hash. Reads plan from the manifest's file
    list — no directory listing, the metadata path that scales to an
    object store."""
    import tempfile as _tf

    from funding_monitoring_spark.sources.snapshots import (
        commit_snapshot,
        read_snapshot,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "value"
    )
    store = os.path.join(_tf.mkdtemp(prefix="fm_snap_tt_"), "events")
    for stripe in range(3):
        commit_snapshot(
            events.filter(F.col("event_id") % 3 == stripe), store
        )
    parts = []
    for v in (1, 2, 3):
        parts.append(
            read_snapshot(spark, store, version=v)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.round(F.sum("value"), 4).alias("sum_value"),
                F.max("event_id").alias("max_event"),
            )
            .withColumn("version", F.lit(v).cast("int"))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@query(
    "snapshot_rollback_expire",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(SUM(value), 4) AS sum_value,
           CAST(MAX(event_id) AS BIGINT) AS max_event,
           CAST(2 AS INT) AS manifests_removed,
           CAST(2 AS INT) AS files_removed
    FROM events WHERE event_id % 3 < 2
    """,
)
def q_snapshot_rollback_expire(spark, sf_dir):
    """Rollback-as-roll-forward + snapshot expiry: v1 = stripes 0-1,
    v2 OVERWRITES with stripe 2 (the bad write), v3 rolls back to v1
    by committing v1's file list anew; expire_snapshots(keep_last=1)
    then vacuums — it must reclaim exactly v2's two unreferenced
    files (the constants in the oracle) while v3, which references
    v1's files, stays byte-identical. The final aggregate over the
    post-expiry store hashes against the raw table's stripes 0-1: a
    GC that deletes a referenced file, or a rollback that restores
    the wrong file list, breaks the hash."""
    import tempfile as _tf

    from funding_monitoring_spark.sources.snapshots import (
        commit_snapshot,
        expire_snapshots,
        read_snapshot,
        rollback_snapshot,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "value"
    )
    store = os.path.join(_tf.mkdtemp(prefix="fm_snap_rb_"), "events")
    commit_snapshot(events.filter(F.col("event_id") % 3 < 2), store)
    commit_snapshot(
        events.filter(F.col("event_id") % 3 == 2),
        store,
        mode="overwrite",
        n_files=2,
    )
    rollback_snapshot(store, to_version=1)
    report = expire_snapshots(store, keep_last=1)
    return read_snapshot(spark, store).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.max("event_id").alias("max_event"),
        F.lit(report["manifests_removed"])
        .cast("int")
        .alias("manifests_removed"),
        F.lit(report["files_removed"]).cast("int").alias("files_removed"),
    )


@query(
    "snapshot_incremental_read",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(SUM(value), 4) AS sum_value,
           CAST(MIN(event_id) AS BIGINT) AS min_event
    FROM events WHERE event_id % 3 IN (1, 2)
    GROUP BY 1
    """,
)
def q_snapshot_incremental_read(spark, sf_dir):
    """Incremental consumption between snapshot versions: three
    append commits grow the store stripe by stripe, and the consumer
    reads ONLY the rows added after v1 (file-set diff of the v1/v3
    manifests — no reprocessing of v1's files, the lever that keeps a
    daily pipeline's scan proportional to the day, not the table).
    The oracle reconstructs the expected delta (stripes 1-2) from the
    raw table, so a diff that leaks old files in or drops a new one
    breaks the hash; non-append histories are rejected loudly
    (tests/test_snapshots.py)."""
    import tempfile as _tf

    from funding_monitoring_spark.sources.snapshots import (
        commit_snapshot,
        read_snapshot_changes,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    store = os.path.join(_tf.mkdtemp(prefix="fm_snap_inc_"), "events")
    for stripe in range(3):
        commit_snapshot(
            events.filter(F.col("event_id") % 3 == stripe), store
        )
    return (
        read_snapshot_changes(spark, store, from_version=1)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.min("event_id").alias("min_event"),
        )
    )


@query(
    "snapshot_pruned_read",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(SUM(value), 4) AS sum_value
    FROM events WHERE event_id BETWEEN 100 AND 299
    GROUP BY 1
    """,
)
def q_snapshot_pruned_read(spark, sf_dir):
    """Manifest-level FILE SKIPPING: the commit records per-file
    min/max of event_id (data written range-clustered on it), and the
    read's BETWEEN predicate prunes non-overlapping files from the
    manifest before Spark lists a single one — the pruning lever for
    NON-partition columns at 100 TB. Skipping returns a superset and
    the row predicate is re-applied, so the aggregate hashes exactly
    against the flat-table oracle regardless of where file boundaries
    fell; that a strict subset of files is actually read is asserted
    in tests/test_snapshots.py."""
    import tempfile as _tf

    from funding_monitoring_spark.sources.snapshots import (
        commit_snapshot,
        read_snapshot,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    store = os.path.join(_tf.mkdtemp(prefix="fm_snap_pr_"), "events")
    commit_snapshot(
        events.repartitionByRange(8, "event_id"),
        store,
        stats_cols=["event_id"],
    )
    return (
        read_snapshot(spark, store, between=("event_id", 100, 299))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


@query(
    "snapshot_metadata_count",
    """
    SELECT CAST(v.version AS INT) AS version,
           CAST(COUNT(*) AS BIGINT) AS n_rows_metadata,
           1 AS matches_scan
    FROM (VALUES (1), (2), (3)) AS v(version)
    JOIN events e ON e.event_id % 3 < v.version
    GROUP BY 1
    """,
)
def q_snapshot_metadata_count(spark, sf_dir):
    """COUNT(*) from METADATA: every commit records each file's
    parquet-footer row count in the manifest, so the row count of any
    historical version is the sum of a few JSON numbers — zero data
    files touched (sources/snapshots.snapshot_row_count). The query
    builds three append versions, answers each version's count from
    the manifest alone, and cross-checks it against an actual scan
    (matches_scan pins metadata == data); the oracle recomputes the
    per-version counts from the raw table. At 100 TB this is the
    difference between a KB of JSON and a table scan — the same
    footer-derived stats path real table formats use."""
    import tempfile as _tf

    from funding_monitoring_spark.sources.snapshots import (
        commit_snapshot,
        read_snapshot,
        snapshot_row_count,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "value"
    )
    store = os.path.join(_tf.mkdtemp(prefix="fm_meta_ct_"), "events")
    for stripe in range(3):
        commit_snapshot(
            events.filter(F.col("event_id") % 3 == stripe), store
        )
    rows = []
    for v in (1, 2, 3):
        meta = snapshot_row_count(store, v)
        scanned = read_snapshot(spark, store, version=v).count()
        rows.append((v, meta, int(meta == scanned)))
    return spark.createDataFrame(
        rows, "version int, n_rows_metadata long, matches_scan int"
    )


@query(
    "merge_on_read_snapshot",
    """
    WITH log AS (
        SELECT event_id, ROUND(value, 6) AS value, 'U' AS op, 0 AS seq
        FROM events WHERE event_id % 3 < 2
        UNION ALL
        SELECT event_id, ROUND(value * 3, 6), 'U', 1
        FROM events WHERE event_id % 6 = 1
        UNION ALL
        SELECT event_id, NULL, 'D', 2
        FROM events WHERE event_id % 6 = 4
        UNION ALL
        SELECT event_id, ROUND(value, 6), 'U', 2
        FROM events WHERE event_id % 3 = 2
    ),
    ranked AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY event_id
                                  ORDER BY seq DESC) AS rn,
               COUNT(*) OVER (PARTITION BY event_id) AS n_changes
        FROM log
    )
    SELECT event_id, value, CAST(n_changes AS BIGINT) AS n_changes
    FROM ranked WHERE rn = 1 AND op != 'D'
    """,
)
def q_merge_on_read_snapshot(spark, sf_dir):
    """MERGE-ON-READ over the snapshot store — the LSM-style
    complement to copy-on-write compaction: the base version and
    every delta commit are plain APPENDS carrying (op, seq), no byte
    of the base is ever rewritten, and the READER reconstructs
    current state with one per-key last-write-wins aggregation
    (operators/upsert.cdc_materialize: max_by with map-side partial
    aggregation — one shuffle, one candidate row per key per map
    partition). Updates, deletes, and inserts across two delta
    commits are all exercised; n_changes audits how many log rows
    each surviving key folded. At 100 TB this is the write-cheap /
    read-costly end of the upsert spectrum — OPTIMIZE (store
    compaction) moves tables back toward the read-cheap end, and
    both live on the same manifest machinery."""
    import tempfile as _tf

    from funding_monitoring_spark.operators.upsert import (
        cdc_materialize,
    )
    from funding_monitoring_spark.sources.snapshots import (
        commit_snapshot,
        read_snapshot,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "value"
    )
    store = os.path.join(_tf.mkdtemp(prefix="fm_mor_"), "events")
    base = events.filter(F.col("event_id") % 3 < 2).select(
        "event_id",
        F.round("value", 6).alias("value"),
        F.lit("U").alias("op"),
        F.lit(0).alias("seq"),
    )
    upd = events.filter(F.col("event_id") % 6 == 1).select(
        "event_id",
        F.round(F.col("value") * 3, 6).alias("value"),
        F.lit("U").alias("op"),
        F.lit(1).alias("seq"),
    )
    dele = events.filter(F.col("event_id") % 6 == 4).select(
        "event_id",
        F.lit(None).cast("double").alias("value"),
        F.lit("D").alias("op"),
        F.lit(2).alias("seq"),
    )
    ins = events.filter(F.col("event_id") % 3 == 2).select(
        "event_id",
        F.round("value", 6).alias("value"),
        F.lit("U").alias("op"),
        F.lit(2).alias("seq"),
    )
    commit_snapshot(base, store)
    commit_snapshot(upd, store)  # delta commits: pure appends
    commit_snapshot(dele.unionByName(ins), store)
    merged = cdc_materialize(
        read_snapshot(spark, store),
        key_cols=["event_id"],
        order_cols=["seq"],
        delete_pred=F.col("op") == "D",
    )
    return merged.select("event_id", "value", "n_changes")


@query(
    "snapshot_version_cdc",
    """
    WITH v1 AS (
        SELECT event_id, value FROM events WHERE event_id % 3 < 2
    ),
    v2 AS (
        SELECT event_id,
               value * CASE WHEN event_id % 2 = 0 THEN 2 ELSE 1 END
                   AS value
        FROM events WHERE event_id % 3 > 0
    ),
    d AS (
        SELECT COALESCE(v1.event_id, v2.event_id) AS event_id,
               v1.value AS old_value, v2.value AS new_value,
               CASE WHEN v1.event_id IS NULL THEN 'added'
                    WHEN v2.event_id IS NULL THEN 'removed'
                    WHEN v1.value = v2.value THEN 'unchanged'
                    ELSE 'changed' END AS diff_status
        FROM v1 FULL OUTER JOIN v2 ON v1.event_id = v2.event_id
    )
    SELECT diff_status, CAST(COUNT(*) AS BIGINT) AS n_keys,
           ROUND(SUM(COALESCE(old_value, 0)), 4) AS sum_old,
           ROUND(SUM(COALESCE(new_value, 0)), 4) AS sum_new
    FROM d GROUP BY 1
    """,
)
def q_snapshot_version_cdc(spark, sf_dir):
    """Row-level CHANGE DATA FEED between two snapshot VERSIONS —
    what the table format's file-set diff cannot give for overwrite
    commits: v1 and v2 are both time-travel reads from the manifest,
    and the row delta (added / removed / changed / unchanged, with
    old/new values) comes from one full-outer key join
    (operators/diffs.py snapshot_diff). The fixture's v2 overwrite
    drops the %3==0 stripe, adds the %3==2 stripe, and doubles
    even-id values, so all four classes are populated and the oracle
    recomputes every class straight from the raw table. At 100 TB
    both versions are written bucketed on the key and the CDC join
    runs exchange-free — the consumer-side complement to
    read_snapshot_changes' append-only fast path."""
    import tempfile as _tf

    from funding_monitoring_spark.operators.diffs import snapshot_diff
    from funding_monitoring_spark.sources.snapshots import (
        commit_snapshot,
        read_snapshot,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "value"
    )
    store = os.path.join(_tf.mkdtemp(prefix="fm_snap_cdc_"), "events")
    v1 = commit_snapshot(
        events.filter(F.col("event_id") % 3 < 2), store
    )
    v2 = commit_snapshot(
        events.filter(F.col("event_id") % 3 > 0).withColumn(
            "value",
            F.col("value")
            * F.when(F.col("event_id") % 2 == 0, 2).otherwise(1),
        ),
        store,
        mode="overwrite",
    )
    cdc = snapshot_diff(
        read_snapshot(spark, store, version=v1),
        read_snapshot(spark, store, version=v2),
        key_cols=["event_id"],
        compare_cols=["value"],
    )
    return cdc.groupBy("diff_status").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.round(
            F.sum(F.coalesce(F.col("old_value"), F.lit(0.0))), 4
        ).alias("sum_old"),
        F.round(
            F.sum(F.coalesce(F.col("new_value"), F.lit(0.0))), 4
        ).alias("sum_new"),
    )


@query(
    "snapshot_bloom_pruned_read",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(SUM(value), 4) AS sum_value,
           CAST(MAX(event_id) AS BIGINT) AS max_event
    FROM events WHERE user_id = 7
    GROUP BY 1
    """,
)
def q_snapshot_bloom_pruned_read(spark, sf_dir):
    """BLOOM-filter file skipping — the EQUALITY-predicate companion
    to min/max pruning: the commit hash-clusters on user_id and
    records a per-file bloom (1024 bits, 4 LCG hashes) in the
    manifest, and the point lookup prunes every file whose bloom
    provably excludes the key BEFORE Spark lists one. min/max stats
    are useless here (each file's user_id range spans the domain —
    exactly the hash-clustered case a lakehouse point lookup hits at
    100 TB); the bloom skips ~7/8 of the files at this fixture's
    ~19 users/file. Skipping is a superset and the row predicate is
    re-applied, so the aggregate hashes exactly against the
    flat-table oracle; that a strict subset of files is read is
    asserted in tests/test_snapshots.py."""
    import tempfile as _tf

    from funding_monitoring_spark.sources.snapshots import (
        commit_snapshot,
        read_snapshot,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    store = os.path.join(_tf.mkdtemp(prefix="fm_snap_bl_"), "events")
    commit_snapshot(
        events.repartition(8, "user_id"),
        store,
        bloom_cols=["user_id"],
    )
    return (
        read_snapshot(spark, store, equals=("user_id", 7))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.max("event_id").alias("max_event"),
        )
    )


@query(
    "snapshot_bloom_pruned_read_str",
    """
    SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
           CAST(n_chars AS BIGINT) AS n_chars
    FROM documents
    WHERE md5(text) = (SELECT md5(text) FROM documents WHERE doc_id = 7)
    """,
)
def q_snapshot_bloom_pruned_read_str(spark, sf_dir):
    """STRING-key bloom file skipping — the dedup-fingerprint lookup
    shape: a fingerprint store keyed by md5(text) is probed for one
    fingerprint, and per-file blooms (build side hashes
    xxhash64(fp) through the same LCG; the driver probe mirrors it
    with a pure-Python XXH64, bit-for-bit — tests/test_snapshots.py)
    skip every file whose bloom excludes the key before Spark lists
    one. This is the steady-state ingest membership check at 100 TB:
    without string blooms every new batch's anti-join scans the full
    fingerprint store. Skipping is a superset + re-applied row
    predicate, so the result hashes exactly against the flat oracle."""
    import tempfile as _tf

    from funding_monitoring_spark.sources.snapshots import (
        commit_snapshot,
        read_snapshot,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars", F.md5("text").alias("fp")
    )
    store = os.path.join(_tf.mkdtemp(prefix="fm_snap_bls_"), "fps")
    commit_snapshot(
        docs.repartition(8, "fp"), store, bloom_cols=["fp"]
    )
    probe = (
        docs.filter(F.col("doc_id") == 7).select("fp").first()["fp"]
    )  # bounded: one fingerprint to the driver
    return read_snapshot(spark, store, equals=("fp", probe)).select(
        "doc_id", "lang", "n_chars"
    )


@query(
    "snapshot_optimize_read",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(SUM(value), 4) AS sum_value,
           CAST(MAX(event_id) AS BIGINT) AS max_event,
           CAST(2 AS INT) AS n_versions
    FROM events WHERE user_id BETWEEN 3 AND 7
    GROUP BY 1
    """,
)
def q_snapshot_optimize_read(spark, sf_dir):
    """Transactional OPTIMIZE ZORDER over the snapshot store: the
    initial commit lands stats-free (skipping conservatively reads
    everything), optimize_snapshot rewrites the latest version
    z-order-clustered on (user_id, event_id) as a NEW overwrite
    version carrying per-file min/max on both columns, and the read
    routes through manifest skipping on the user_id predicate. The
    oracle recomputes the aggregate from the raw table, so a rewrite
    that loses or duplicates a row breaks the hash; n_versions pins
    that the optimize was a versioned commit (old layout still
    time-travelable). That a strict subset of files is read, on
    either dimension, is asserted in tests/test_snapshots.py."""
    import tempfile as _tf

    from funding_monitoring_spark.sources.snapshots import (
        commit_snapshot,
        list_versions,
        optimize_snapshot,
        read_snapshot,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    store = os.path.join(_tf.mkdtemp(prefix="fm_snap_opt_"), "events")
    commit_snapshot(events, store, n_files=4)
    optimize_snapshot(spark, store, "user_id", "event_id")
    out = (
        read_snapshot(spark, store, between=("user_id", 3, 7))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.max("event_id").alias("max_event"),
        )
    )
    return out.withColumn(
        "n_versions",
        F.lit(len(list_versions(store))).cast("int"),
    )


@query(
    "file_provenance_report",
    """
    SELECT CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR)
               AS event_date,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(1 AS INT) AS rows_match_file_partition
    FROM events GROUP BY 1
    """,
)
def q_file_provenance_report(spark, sf_dir):
    """Row -> source-file lineage, the provenance a curation pipeline
    needs to trace a bad training document back to the file that
    produced it: every row is tagged with its physical source file
    (input_file_name, evaluated in the scan — zero shuffle), the
    partition value is parsed back OUT of the path, and the report
    verifies the wiring — `rows_match_file_partition` pins that every
    row's event time truncates to exactly its file's partition date
    (a mis-parsed path, a row written into the wrong partition, or a
    scan that loses file attribution all flip it). Per-date row
    counts hash against the flat-file oracle, so the partitioned
    store's content is simultaneously proven identical."""
    path = partitioned_events_path(spark, sf_dir)
    df = spark.read.parquet(path).withColumn(
        "__file", F.input_file_name()
    )
    parsed = df.withColumn(
        "file_date",
        F.to_date(
            F.regexp_extract("__file", r"event_date=([0-9\-]+)", 1)
        ),
    )
    return (
        parsed.groupBy("file_date")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                (
                    F.date_trunc("day", "ts").cast("date")
                    != F.col("file_date")
                ).cast("int")
            ).alias("n_mismatched"),
        )
        .select(
            F.col("file_date").cast("string").alias("event_date"),
            "n_rows",
            (F.col("n_mismatched") == 0)
            .cast("int")
            .alias("rows_match_file_partition"),
        )
    )


# -- incremental aggregate maintenance -----------------------------------


@query(
    "incremental_rollup_maintenance",
    """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(SUM(value), 4) AS sum_value,
           CAST(MIN(event_id) AS BIGINT) AS min_event
    FROM events
    GROUP BY 1, 2
    """,
)
def q_incremental_rollup_maintenance(spark, sf_dir):
    """Incremental view maintenance over the snapshot store: the
    daily rollup is initialized from v1 and then maintained by
    aggregating ONLY each version's file-set delta
    (read_snapshot_changes) and sum/min-merging it into the stored
    rollup (operators/maintenance.merge_additive_rollup), with the
    rollup store atomically overwritten per step like a real
    checkpointed pipeline. The oracle is the FULL aggregation over
    the whole table — the maintained store must equal a recompute
    exactly, which is the whole claim of delta processing: at 100 TB
    the per-day cost is the day's aggregation, not a table rescan.
    Only decomposable aggregates live in the store (count/sum/min);
    distinct-style stats ride mergeable sketches instead (HLL / KMV /
    Count-Min, same merge shape)."""
    from funding_monitoring_spark.operators.maintenance import (
        merge_additive_rollup,
    )
    from funding_monitoring_spark.sources.snapshots import (
        commit_snapshot,
        read_snapshot,
        read_snapshot_changes,
    )
    from funding_monitoring_spark.streaming.sinks import (
        atomic_overwrite,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts", "value"
    )
    store = os.path.join(
        tempfile.mkdtemp(prefix="fm_snap_ivm_"), "events"
    )
    versions = [
        commit_snapshot(
            events.filter(F.col("event_id") % 3 == stripe), store
        )
        for stripe in range(3)
    ]

    def day_rollup(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.date_trunc("day", "ts").alias("day"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("value").alias("sum_value"),
            F.min("event_id").alias("min_event"),
        )

    rollup_path = os.path.join(
        os.path.dirname(store), "rollup_store"
    )
    atomic_overwrite(
        day_rollup(read_snapshot(spark, store, version=versions[0])),
        rollup_path,
    )
    for prev, cur in zip(versions, versions[1:]):
        delta = read_snapshot_changes(
            spark, store, from_version=prev, to_version=cur
        )
        merged = merge_additive_rollup(
            spark.read.parquet(rollup_path),
            day_rollup(delta),
            keys=["day", "event_type"],
            merges={
                "n_rows": "sum",
                "sum_value": "sum",
                "min_event": "min",
            },
        )
        atomic_overwrite(merged, rollup_path)

    return spark.read.parquet(rollup_path).select(
        "day",
        "event_type",
        "n_rows",
        F.round("sum_value", 4).alias("sum_value"),
        "min_event",
    )
