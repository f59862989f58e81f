"""Snapshot-over-snapshot diff: classify every key across two ticks.

The reference's pipelines overwrite whole snapshot tables each tick
(full-replace semantics, reference active_futures_etl.py:95-118), which
destroys the most monitoring-relevant signal: WHAT CHANGED since the
last tick. This operator reconstructs that signal from any two
snapshots sharing a primary key:

    added     — key present only in the new tick
    removed   — key present only in the old tick
    changed   — key in both, compared columns differ
    unchanged — key in both, compared columns equal

Plan shape: a single full-outer hash join on the key (one shuffle per
side, co-partitioned by Catalyst), then pure row-local CASE logic —
no window, no state, no second pass. At 100 TB the two snapshots are
written bucketed by the key (sources/layout.py), and the same diff
runs exchange-free. NULL-safe comparison uses ``eqNullSafe`` so a
NULL→value transition classifies as changed, not unchanged.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Full-outer diff of two snapshots on ``key_cols``.

    Returns one row per key in either snapshot: the key columns, each
    compared column as ``old_<c>`` / ``new_<c>``, and ``diff_status``
    in {added, removed, changed, unchanged}.
    """
    reserved = {"__in_old", "__in_new"}
    clash = reserved & (set(old.columns) | set(new.columns))
    if clash:
        raise ValueError(
            f"snapshot_diff reserves column names {sorted(clash)}"
        )
    o = old.select(
        *key_cols, *[F.col(c).alias(f"old_{c}") for c in compare_cols]
    ).withColumn("__in_old", F.lit(1))
    n = new.select(
        *key_cols, *[F.col(c).alias(f"new_{c}") for c in compare_cols]
    ).withColumn("__in_new", F.lit(1))
    joined = o.join(n, on=list(key_cols), how="full_outer")

    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.withColumn("diff_status", status).drop(
        "__in_old", "__in_new"
    )
