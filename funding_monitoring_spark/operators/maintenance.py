"""Store maintenance: small-file compaction.

Streaming sinks that APPEND per micro-batch (the lending store's
``batch_id=N`` directories, streaming/pipelines.py) fragment over
ticks: at a 5-minute cadence a table collects ~288 small files/day,
and at 100 TB the scan cost of a fragmented store is dominated by
file-open/footer overhead, not bytes. ``compact_store`` rewrites a
parquet store into size-targeted files — content-identical, atomic
(temp dir + swap, same policy as streaming/sinks.atomic_overwrite),
partition-layout-preserving — and returns a before/after report.

Scale notes: sizing uses the store's actual on-disk bytes (driver-side
``os.walk`` over the directory listing — metadata only, no data moves
through the driver); the rewrite itself is one distributed
repartition+write. Running it concurrently with a writer is the
caller's coordination problem, exactly as with any overwrite sink.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession

from funding_monitoring_spark.streaming.sinks import atomic_overwrite


def store_file_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a parquet store directory."""
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact_store(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    partition_cols: list[str] | None = None,
) -> dict:
    """Rewrite the parquet store at ``path`` into
    ceil(total_bytes / target_bytes) files (per partition directory
    when ``partition_cols`` is given — pass the store's existing
    partition columns to preserve its pruning layout; directory-style
    partition columns are re-materialized into the rewrite so no
    column is lost). Atomic: readers see the old store until the
    swap. Returns {files_before, files_after, bytes, n_files_target}.
    """
    files_before, total = store_file_stats(path)
    n_target = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(path)
    if partition_cols:
        out = df.repartition(n_target, *partition_cols)
        atomic_overwrite(out, path, partition_by=partition_cols)
    else:
        atomic_overwrite(df.repartition(n_target), path)
    files_after, _ = store_file_stats(path)
    return {
        "files_before": files_before,
        "files_after": files_after,
        "bytes": total,
        "n_files_target": n_target,
    }
