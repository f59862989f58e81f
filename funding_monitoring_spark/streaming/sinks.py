"""foreachBatch sinks: last-write-wins parquet upsert and atomic
snapshot overwrite.

The reference's sinks are Postgres `INSERT ... ON CONFLICT DO UPDATE`
(K1/K2, funding_rates_etl.py:100-111) and TRUNCATE-reload / to_sql
replace (K3/K4, active_futures_etl.py:90-104, funding_stats_etl.py:128).
Spark Structured Streaming's contract for custom sinks is foreachBatch:
at-least-once batch delivery + an idempotent writer = effectively-once
(the analogue of the reference's retries + PK-upsert, SURVEY.md §2.9).

Both writers here are idempotent: replaying a batch recomputes the same
merge (last-write-wins is deterministic) and the overwrite is atomic
(write to a temp dir, swap). On a lakehouse the upsert is Delta/Iceberg
`MERGE INTO`; this parquet implementation keeps the engine
storage-agnostic.
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame

from funding_monitoring_spark.operators.upsert import dedupe_batch, upsert


def atomic_overwrite(df: DataFrame, path: str) -> None:
    """Materialize df into `path`, atomically: write a sibling temp dir,
    then swap. The input may itself read from `path` (the merge case) —
    it is fully written out before the old dir is touched.

    Local-filesystem rename semantics; on an object store the swap is a
    manifest/metadata commit (Delta/Iceberg), same idempotence contract.
    """
    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)
    tmp = f"{path}.__tmp_{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(tmp)
    old = f"{path}.__old_{uuid.uuid4().hex[:8]}"
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)


def upsert_writer(
    store_path: str,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    transform: Callable[[DataFrame], DataFrame] | None = None,
    on_batch_complete: Callable[[DataFrame], None] | None = None,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch writer: dedupe the batch on key_cols (max order_cols
    wins), then last-write-wins merge into the parquet store.

    transform: optional shaping applied to the raw micro-batch first.
    on_batch_complete: hook called with the post-merge store DataFrame
    (used by the funding pipeline to recompute its per-tick snapshot).
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = transform(batch_df) if transform is not None else batch_df
        batch = dedupe_batch(batch, key_cols, order_cols)
        if os.path.exists(store_path):
            existing = spark.read.parquet(store_path)
            merged = upsert(existing, batch, key_cols)
        else:
            merged = batch
        atomic_overwrite(merged, store_path)
        if on_batch_complete is not None:
            on_batch_complete(spark.read.parquet(store_path))

    return write


def snapshot_writer(
    store_path: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch writer with snapshot-replace semantics (K3/K4): each
    tick fully rewrites the store from the batch."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        batch = transform(batch_df) if transform is not None else batch_df
        atomic_overwrite(batch, store_path)

    return write
