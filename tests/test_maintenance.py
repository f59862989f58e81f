"""Small-file compaction: content-identical, atomic, layout-preserving."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from funding_monitoring_spark.operators.maintenance import (
    compact_store,
    store_file_stats,
)


def _rows(spark, path):
    return sorted(
        tuple(r) for r in spark.read.parquet(path).collect()
    )


def test_compact_flat_store(spark, tmp_path):
    """20 per-tick appends -> one compaction pass -> a single
    size-targeted file with byte-identical content."""
    store = str(tmp_path / "store")
    for i in range(20):
        spark.createDataFrame(
            [(i * 10 + j, float(j)) for j in range(5)], "k long, v double"
        ).coalesce(1).write.mode("append").parquet(store)
    before = _rows(spark, store)
    n_before, total = store_file_stats(store)
    assert n_before == 20
    report = compact_store(spark, store)
    assert report["files_before"] == 20
    assert report["n_files_target"] == 1  # tiny store, default 128MB
    assert report["files_after"] == 1
    assert report["bytes"] == total
    assert _rows(spark, store) == before
    # idempotent: compacting a compact store is a no-op shape-wise
    again = compact_store(spark, store)
    assert again["files_after"] == 1


def test_compact_partitioned_store_preserves_pruning(spark, tmp_path):
    """Compacting a date-partitioned store keeps the directory layout
    (partition pruning still works) while collapsing the per-append
    fragments inside each partition."""
    store = str(tmp_path / "part_store")
    for tick in range(4):
        spark.createDataFrame(
            [
                (tick * 100 + i, f"2024-01-0{d}", float(i))
                for d in (1, 2, 3)
                for i in range(5)
            ],
            "k long, event_date string, v double",
        ).repartition(3).write.mode("append").partitionBy(
            "event_date"
        ).parquet(store)
    before = _rows(spark, store)
    n_before, _ = store_file_stats(store)
    assert n_before > 3  # fragmented: several files per partition dir
    report = compact_store(
        spark, store, partition_cols=["event_date"]
    )
    assert report["files_after"] < n_before
    # layout preserved: still one directory per date ...
    parts = sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(store, "event_date=*"))
    )
    assert parts == [
        "event_date=2024-01-01",
        "event_date=2024-01-02",
        "event_date=2024-01-03",
    ]
    # ... with exactly one file per partition after compaction
    for p in parts:
        files = glob.glob(os.path.join(store, p, "*.parquet"))
        assert len(files) == 1, (p, files)
    # content identical (partition column round-trips as string here)
    assert _rows(spark, store) == before
    # and a partition-filtered read still prunes
    pruned = spark.read.parquet(store).filter(
        F.col("event_date") == "2024-01-02"
    )
    assert pruned.count() == 20
