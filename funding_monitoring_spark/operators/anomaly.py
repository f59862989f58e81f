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

from funding_monitoring_spark.functions.scalars import let


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


def _array_median(arr: Column) -> Column:
    """Interpolated median of a double array (NULL for empty) — pure
    HOF algebra (array_sort + element_at), bit-identical in any
    engine. The sorted array is let-bound so it is EVALUATED once per
    call — Catalyst inlines every column reference, and an unbound
    sort referenced three times would otherwise sort three times (and
    explode the expression tree when the caller maps this function
    over array elements). Indices clamp to ≥1 because Spark evaluates
    both CASE branches' index expressions even for the empty-array
    rows the guard excludes (index 0 is a hard error)."""

    def body(srt: Column) -> Column:
        n = F.size(srt)
        one = F.lit(1)
        odd = F.try_element_at(
            srt, F.greatest(((n + 1) / 2).cast("int"), one)
        )
        even = (
            F.try_element_at(srt, F.greatest((n / 2).cast("int"), one))
            + F.try_element_at(
                srt, F.greatest((n / 2 + 1).cast("int"), one)
            )
        ) / 2
        return (
            F.when(n == 0, F.lit(None).cast("double"))
            .when(n % 2 == 1, odd)
            .otherwise(even)
        )

    return let(F.array_sort(arr), body)


def rolling_mad_score(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_by: Sequence[Column],
    value_col: str,
    n: int = 20,
    min_obs: int = 10,
    score_col: str = "mad_score",
) -> DataFrame:
    """Robust twin of rolling_zscore: score against the trailing
    frame's MEDIAN and MAD (median absolute deviation) instead of
    mean/stddev — a prior spike in the baseline inflates a stddev and
    masks the next one, but barely moves a median.

        score = 0.6745 · (x − median) / MAD

    (0.6745 ≈ Φ⁻¹(3/4) makes the score comparable to a z-score under
    normality — the standard consistency constant.)

    Plan shape: the trailing frame materializes ONCE per row as a
    bounded (≤ n) array via collect_list over the window frame, and
    median/MAD are pure array HOFs on it — still one hash exchange +
    one sort, no Python, no self-join; the per-row cost is O(n log n)
    on a 20-element array. Guards mirror rolling_zscore: short
    baseline → NULL, zero MAD (≥ half the frame identical) → NULL.

    The WHOLE statistic (n, median, score) is computed inside ONE
    let-bound expression emitted as a single struct column, with the
    field extraction in a separate select: projection collapsing
    inlines an aliased column into every reference, so emitting
    baseline_median and the score as separate withColumns re-ran the
    full sort pipeline per output (and per stats field) — 3.1x the
    wall at sf1 (17.3 s -> 5.5 s for the statistic, measured) before
    this single-struct shape.

    The score is emitted UNROUNDED: every input (frame values, their
    sorted order, the median/MAD halves) is bit-identical across
    engines, so the one multiply and divide produce the same double
    everywhere — while ROUNDing it would sit on half-boundaries
    whenever the data grid makes the score a terminating rational
    (observed at sf0.1)."""
    frame = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_by)
        .rowsBetween(-n, -1)
    )
    arr = F.collect_list(value_col).over(frame)

    def body(a: Column) -> Column:
        # nested lets: the median is BOUND before the deviation
        # transform references it — an unbound median would inline
        # (and re-sort) once per array ELEMENT, a ~20× expression
        # blowup that knocks the projection out of codegen — and the
        # MAD is bound before the score divides by it twice
        def with_med(m: Column) -> Column:
            devs = F.transform(a, lambda x: F.abs(x - m))

            def with_mad(mad: Column) -> Column:
                score = F.when(
                    (F.size(a) >= min_obs) & (mad > 0),
                    F.lit(0.6745) * (F.col(value_col) - m) / mad,
                )
                return F.struct(
                    F.size(a).cast("long").alias("n"),
                    m.alias("med"),
                    score.alias("score"),
                )

            return let(_array_median(devs), with_mad)

        return let(_array_median(a), with_med)

    stats = let(arr, body)
    # replace-in-place, the withColumn convention this operator has
    # always had: a pre-existing baseline_n / baseline_median /
    # score_col column is REPLACED (silently, like withColumn itself)
    # AND keeps its original position; genuinely new output columns
    # append at the end in (baseline_n, baseline_median, score)
    # order. Chain a rename first if an upstream operator's baseline
    # columns must survive. Inputs that would make the replacement
    # self-contradictory are rejected: the value column or a
    # partition key sharing an output name would be overwritten by
    # the very statistic computed from it. (order_by takes Column
    # expressions whose names are not introspectable — order on a
    # column that shares an output name via F.col BEFORE calling
    # this, or rename it; the expression is resolved against the
    # input, so ordering itself stays correct.)
    out_names = ("baseline_n", "baseline_median", score_col)
    if value_col in out_names:
        raise ValueError(
            "value_col collides with an output column of "
            "rolling_mad_score"
        )
    clashing = [c for c in partition_cols if c in out_names]
    if clashing:
        raise ValueError(
            "partition_cols collide with output columns of "
            f"rolling_mad_score: {clashing}"
        )
    keep = [c for c in df.columns if c not in out_names]
    out = df.select(*keep).withColumn("__mad_stats", stats)
    fields = {
        "baseline_n": F.col("__mad_stats")["n"].alias("baseline_n"),
        "baseline_median": F.col("__mad_stats")["med"].alias(
            "baseline_median"
        ),
        score_col: F.col("__mad_stats")["score"].alias(score_col),
    }
    proj = [
        fields.pop(c) if c in fields else F.col(c) for c in df.columns
    ]
    proj += [fields[c] for c in out_names if c in fields]
    return out.select(*proj)


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
