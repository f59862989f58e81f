"""Replay a static table as a micro-batch file stream.

The reference's source is a REST poll every 5 minutes (one JSON batch
per tick, dags/kucoin_main_dag.py:28); the streaming analogue is a file
source where each arriving file is one tick's batch. This module writes
a static DataFrame as N single-file parquet chunks in event-time order
(so watermarks advance monotonically, as they would against a live
feed) and opens a `readStream` over them with one file per trigger.

Harness-only: the chunk writer does a global sort and a driver-side
loop over chunks — fine for replaying fixtures, not a production path
(production ingestion reads whatever the upstream feed appends).
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def write_time_ordered_chunks(
    df: DataFrame,
    out_dir: str,
    n_chunks: int,
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> T.StructType:
    """Write df as n_chunks single-file parquet chunks, rows assigned to
    chunks in (ts, tiebreak) order; chunk file mtimes increase with the
    chunk index so the file source processes them in order. Returns the
    schema (readStream requires an explicit one)."""
    os.makedirs(out_dir, exist_ok=True)
    w = Window.orderBy(F.col(ts_col), F.col(tiebreak_col))
    ranked = df.withColumn("__rn", F.row_number().over(w)).persist()
    total = ranked.count()
    per_chunk = max(1, -(-total // n_chunks))  # ceil div

    base_mtime = 1_000_000_000  # fixed epoch base: deterministic ordering
    for i in range(n_chunks):
        lo, hi = i * per_chunk, (i + 1) * per_chunk
        part = ranked.filter(
            (F.col("__rn") > lo) & (F.col("__rn") <= hi)
        ).drop("__rn")
        stage = tempfile.mkdtemp(prefix="fm_chunk_stage_")
        part.coalesce(1).write.mode("overwrite").parquet(stage)
        [part_file] = glob.glob(os.path.join(stage, "part-*.parquet"))
        dest = os.path.join(out_dir, f"chunk-{i:04d}.parquet")
        shutil.move(part_file, dest)
        shutil.rmtree(stage, ignore_errors=True)
        os.utime(dest, (base_mtime + i * 60, base_mtime + i * 60))
    schema = ranked.drop("__rn").schema
    ranked.unpersist()
    return schema


def stream_from_chunks(
    spark: SparkSession,
    chunks_dir: str,
    schema: T.StructType,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source stream over a chunk directory: one chunk per
    micro-batch = one reference tick per trigger."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(chunks_dir)
    )
