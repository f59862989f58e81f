"""Top-k per group (SURVEY.md §2.6).

The reference's top-k surface is top-1 per group (head(1) at
funding_rates_etl.py:68; group-min at lending_data_etl.py:43-45).
General form: rank within each group, keep rank <= k. Spark plans the
window with a per-partition sort after one shuffle on the group key;
with a time/score filter upstream the sorted runs stay small.

For GLOBAL top-k (no grouping) prefer ``df.orderBy(...).limit(k)`` —
Spark's TakeOrderedAndProject computes a per-partition heap and merges
on the driver, no full sort (SURVEY.md §7 "What's hard" #6).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rank",
    keep_rank: bool = True,
) -> DataFrame:
    """Keep the k best rows per group under a total order.

    order_by must be a TOTAL order (include a unique tiebreak column)
    for deterministic results.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )
    return out if keep_rank else out.drop(rank_col)


def heavy_hitters(
    df: DataFrame,
    group_cols: Sequence[str],
    item_cols: Sequence[str],
    k: int,
    count_col: str = "n",
) -> DataFrame:
    """Exact per-group heavy hitters: the k most frequent item values
    within each group, ties broken by item value ascending.

    Two-stage exact plan — the 100 TB shape:
      1. ``groupBy(group ∪ item).count()`` — Spark's hash aggregate
         runs a map-side partial combine, so the shuffle carries one
         row per DISTINCT (group, item) pair per task, not one per
         input row. For frequency counting this is the whole game:
         a skewed hot item costs one partial counter per task, never
         a hot shuffle partition of raw rows.
      2. rank within group over the (far smaller) count table.
    The sketch alternatives (count-min / Misra-Gries) only win when
    the distinct-pair cardinality itself is too big to shuffle; counts
    here are exact and engine-portable.
    """
    counts = df.groupBy(*group_cols, *item_cols).agg(
        F.count(F.lit(1)).alias(count_col)
    )
    order = [F.col(count_col).desc()] + [F.col(c).asc() for c in item_cols]
    return top_k_per_group(counts, group_cols, order, k)
