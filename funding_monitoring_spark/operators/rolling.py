"""Grouped last-N window statistics (SURVEY.md §2.4 A3/A4/A5 + §2.2 F5).

The reference computes, per symbol, the mean of the N most recent
funding rates for several N — but only when at least N rows of history
exist, else NULL (funding_stats_etl.py:82-97: sort time-desc,
``rolling(n).mean()``, take the first complete window, NaN otherwise).
It does this with a per-symbol Python loop; here it is ONE
groupBy with conditional aggregates over a single row_number ranking —
one shuffle on the group key, fully JVM-side, no loop.

Scale notes (100 TB): the shuffle is on the group key only; history per
key is bounded by the upstream time filter, so per-group state is small
and the aggregation is map-side combinable. Skewed keys are handled by
AQE skew-join/partition splitting; if one key dominates, pre-filter to
the lookback window FIRST (pushed to the scan) so the shuffle carries
only surviving rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _rank_recent(
    df: DataFrame,
    group_cols: Sequence[str],
    time_col: str,
    tiebreak_cols: Sequence[str],
) -> DataFrame:
    """row_number over (group, time DESC, tiebreaks DESC): rank 1 = newest.

    The reference relies on PK uniqueness of (symbol, funding_time) for a
    stable order (models.py:61-63); with arbitrary data we make the order
    total via explicit tiebreak columns (SURVEY.md §7 "What's hard" #2).
    """
    order = [F.col(time_col).desc()] + [F.col(c).desc() for c in tiebreak_cols]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return df.withColumn("__rn", F.row_number().over(w))


def guarded_recent_means(
    df: DataFrame,
    group_cols: Sequence[str],
    time_col: str,
    value_col: str,
    windows: dict[str, int],
    tiebreak_cols: Sequence[str] = (),
    scale: float = 1.0,
    latest_col: str | None = None,
    round_digits: int | None = None,
    extra_aggs: Sequence[Column] = (),
) -> DataFrame:
    """Per group: mean of the N newest values for each named window,
    NULL when the group has fewer than N rows (the F5 guard), plus
    optionally the single newest value.

    windows: {output_col_name: N}. scale multiplies every output (the
    reference's ×3×365 annualization, C12). round_digits optionally
    rounds outputs (used by oracle-compared queries so Spark and DuckDB
    summation-order differences cannot flip the value hash).

    extra_aggs: additional aggregate expressions evaluated in the SAME
    groupBy (one shuffle for everything); they may reference the
    internal recency rank column ``__rn`` (1 = newest).
    """
    ranked = _rank_recent(df, group_cols, time_col, tiebreak_cols)
    v = F.col(value_col)

    def finish(c: Column) -> Column:
        c = c * scale
        return F.round(c, round_digits) if round_digits is not None else c

    aggs: list[Column] = []
    if latest_col is not None:
        aggs.append(
            finish(F.max(F.when(F.col("__rn") == 1, v))).alias(latest_col)
        )
    for out_name, n in windows.items():
        # Guard on the NON-NULL count within the N-row window, not the
        # group's total row count: pandas rolling(n).mean() (the
        # reference, min_periods=n) yields NaN when any of the N newest
        # values is NaN, and a group with >= n rows but a NULL inside
        # the window must therefore emit NULL, not a mean over fewer
        # than n values.
        in_window = F.when(F.col("__rn") <= n, v)
        guarded = F.when(F.count(in_window) >= n, F.avg(in_window))
        aggs.append(finish(guarded).alias(out_name))
    return ranked.groupBy(*group_cols).agg(*aggs, *extra_aggs)


def latest_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    time_col: str,
    value_cols: Sequence[str],
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Newest row's values per group (A4 — funding_stats_etl.py:77-80).

    Implemented as max_by on a totally-ordered struct key: one regular
    aggregation (map-side combinable), cheaper than window + filter
    rn=1 because no per-partition sort of the full history is needed.
    """
    order_key = F.struct(
        F.col(time_col), *[F.col(c) for c in tiebreak_cols]
    )
    aggs = [F.max_by(F.col(c), order_key).alias(c) for c in value_cols]
    return df.groupBy(*group_cols).agg(*aggs)
