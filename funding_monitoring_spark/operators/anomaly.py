"""Rolling-window anomaly scoring for rate streams.

The reference monitors funding rates but has no alerting surface —
its consumers eyeball the stats table (reference
funding_rates_etl.py:60-75 computes trailing means and stops there).
The natural next step for a monitoring engine is scoring each new
observation against its own recent history: a rolling z-score

    z_t = (x_t - mean(x_{t-n..t-1})) / stddev_samp(x_{t-n..t-1})

over the n observations STRICTLY BEFORE t (the trailing frame excludes
the current row, so a spike cannot mask itself by inflating the
baseline it is judged against).

Plan shape (the 100 TB story): one hash shuffle on the partition key,
one sort within partitions, and every per-row statistic comes from the
same window frame — Spark evaluates all four aggregates (count, avg,
stddev, z) in a single Window physical operator, so the whole scoring
pass is shuffle-once regardless of data volume. No self-join, no
per-key loop, no state beyond the n-row frame.

Guard semantics mirror operators/rolling.py: fewer than ``min_obs``
prior observations → NULL score (a symbol's first ticks are not
anomalies, they are an empty baseline); a zero-variance baseline →
NULL score (division would be ±inf, and "every value identical so far"
makes any deviation infinitely surprising — a policy decision pushed
to the caller, not a number).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def rolling_zscore(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_by: Sequence[Column],
    value_col: str,
    n: int = 20,
    min_obs: int = 10,
    score_col: str = "zscore",
    round_to: int | None = 4,
) -> DataFrame:
    """Score ``value_col`` against the trailing ``n``-row baseline.

    Adds three columns: ``baseline_n`` (rows in the frame),
    ``baseline_avg`` and ``score_col``. ``order_by`` must be a total
    order (include a unique tiebreak) for deterministic frames.
    ``round_to`` rounds the emitted doubles so differential oracles
    compare stable reprs across engines (window aggregation order
    differs between engines at the ~1e-12 level); pass None for raw
    doubles in production.
    """
    frame = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_by)
        .rowsBetween(-n, -1)
    )
    cnt = F.count(value_col).over(frame)
    avg = F.avg(value_col).over(frame)
    std = F.stddev_samp(value_col).over(frame)
    z = F.when(
        (cnt >= min_obs) & (std > 0),
        (F.col(value_col) - avg) / std,
    )
    if round_to is not None:
        # The baseline mean is rounded two digits finer than the score:
        # input grids with few decimal digits (prices, rates) divided by
        # small frame counts land EXACTLY on coarse half-boundaries
        # (e.g. avg 29.63125 → round-4 half-boundary), where engines'
        # rounding implementations legitimately disagree; the z-score is
        # irrational (sqrt in the denominator) so its boundary risk is
        # random and vanishing at any precision.
        avg = F.round(avg, round_to + 2)
        # + 0.0 canonicalizes IEEE -0.0 (a tiny negative score rounds
        # to -0.0, whose string repr differs between engines)
        z = F.round(z, round_to) + F.lit(0.0)
    return (
        df.withColumn("baseline_n", cnt)
        .withColumn("baseline_avg", avg)
        .withColumn(score_col, z)
    )


def flag_anomalies(
    df: DataFrame, score_col: str = "zscore", threshold: float = 2.0
) -> DataFrame:
    """Materialize the alert decision from an (already rounded) score:
    NULL score → 0 (no baseline is not an alert). The flag is computed
    from the same rounded score the oracle sees, so the decision
    boundary is engine-stable."""
    return df.withColumn(
        "is_anomaly",
        (F.abs(F.col(score_col)) > F.lit(threshold))
        .cast("int")
        .alias("is_anomaly"),
    ).fillna({"is_anomaly": 0})
