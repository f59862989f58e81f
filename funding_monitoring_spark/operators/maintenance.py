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


def partition_dir_bytes(path: str, partition_col: str) -> dict[str, int]:
    """{partition value -> data bytes} for a directory-partitioned
    store (``<path>/<col>=<value>/...``). Metadata-only walk."""
    out: dict[str, int] = {}
    prefix = f"{partition_col}="
    for entry in os.listdir(os.path.realpath(path)):
        if not entry.startswith(prefix):
            continue
        value = entry[len(prefix):]
        _, b = store_file_stats(os.path.join(path, entry))
        out[value] = b
    return out


def compact_store(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    partition_cols: list[str] | None = None,
) -> dict:
    """Rewrite the parquet store at ``path`` into size-targeted
    files. Flat store: ceil(total_bytes / target_bytes) files. With
    ``partition_cols`` (one directory-partition column — pass the
    store's existing column to preserve its pruning layout), each
    partition directory is rewritten into ceil(its_bytes /
    target_bytes) files: the per-directory byte sizes (a metadata
    walk) drive a per-row deterministic salt, so a hot partition
    splits across ceil(bytes/target) tasks instead of funneling
    through one — compaction can never turn a 10 GB date into a
    single 10 GB file/task. Atomic: readers see the old store until
    the swap. Returns {files_before, files_after, bytes,
    n_files_target}.
    """
    from pyspark.sql import functions as F

    files_before, total = store_file_stats(path)
    df = spark.read.parquet(path)
    if partition_cols:
        if len(partition_cols) != 1:
            raise ValueError(
                "compact_store supports exactly one directory-"
                f"partition column, got {partition_cols!r}"
            )
        pcol = partition_cols[0]
        sizes = partition_dir_bytes(path, pcol)
        k_by_value = {
            v: max(1, math.ceil(b / target_bytes))
            for v, b in sizes.items()
        }
        n_target = sum(k_by_value.values()) or 1
        kmap = spark.createDataFrame(
            [(v, k) for v, k in sorted(k_by_value.items())],
            "__pval string, __k int",
        )
        data_cols = [c for c in df.columns if c != pcol]
        salted = (
            df.join(
                F.broadcast(kmap),
                df[pcol].cast("string") == F.col("__pval"),
                "left",
            )
            .withColumn(
                "__salt",
                F.pmod(
                    F.xxhash64(*[F.col(c) for c in data_cols]),
                    F.coalesce(F.col("__k"), F.lit(1)),
                ),
            )
            .drop("__pval", "__k")
        )
        out = salted.repartition(n_target, pcol, "__salt").drop(
            "__salt"
        )
        atomic_overwrite(out, path, partition_by=[pcol])
    else:
        n_target = max(1, math.ceil(total / target_bytes))
        atomic_overwrite(df.repartition(n_target), path)
    files_after, _ = store_file_stats(path)
    return {
        "files_before": files_before,
        "files_after": files_after,
        "bytes": total,
        "n_files_target": n_target,
    }
