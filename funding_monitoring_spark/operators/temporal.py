"""Temporal operators Spark has no built-in for — backward as-of
join, gap-based sessionization, and a bucketed interval (range) join.

The reference's time-series tables (`kucoin_funding_rates`,
reference scripts/models.py:58-64) make these the natural next
operators beyond its surface: align a trade to the funding rate in
force (as-of), group ticks into activity bursts (sessionize), and
attribute events within a horizon (interval join). None is ported
code — the reference has no such operator; each is a composition of
DataFrame primitives chosen for the 100 TB plan shape:

* ``asof_join_backward`` — the union-marker trick: one hash shuffle
  on the key, one sort within partitions, ``last(ignorenulls)`` over
  an unbounded-preceding row frame. No range explosion, no per-key
  loop; cost is sort-merge-like regardless of table sizes.
* ``sessionize`` — ``lag`` + running ``sum`` over the same single
  (key, time)-sorted shuffle; session ids are stable integers.
* ``interval_join`` — candidate generation by time bucket of width
  equal to the window: the build side duplicates into its bucket and
  the predecessor bucket, then an *equi*-join on (key, bucket) plus
  an exact residual filter. Each qualifying pair matches in exactly
  one bucket, so no dedup pass is needed. At 100 TB this is the
  difference between a shuffled equi-join and an O(n·m) theta join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

US = 1_000_000  # microseconds per second; all time math is integer µs


def asof_join_backward(
    probe: DataFrame,
    ref: DataFrame,
    keys: list[str],
    ts_col: str,
    payload: dict[str, str],
    ref_tiebreak: str,
) -> DataFrame:
    """For every probe row, attach the payload of the latest ref row
    with ``ref.ts <= probe.ts`` on the same keys (backward-inclusive
    as-of; NULLs when no ref row precedes the probe).

    ``payload`` maps ref column -> output alias; the matched ref
    timestamp is exposed as ``asof_ts``. ``ref_tiebreak`` breaks ties
    between ref rows sharing one (keys, ts) — the max wins, mirroring
    last-write-wins upsert semantics (reference
    scripts/funding_rates_etl.py:105-108).

    Plan shape: union both sides with a side marker, shuffle ONCE on
    ``keys``, sort by (ts, side, tiebreak) so a same-instant ref row
    sorts before the probe (inclusive bound) and the max-tiebreak ref
    row sorts last among same-(keys, ts) ties — ``last(ignorenulls)``
    over rows unboundedPreceding..currentRow therefore resolves ties
    without a separate dedup shuffle — then keep probe rows.
    """
    fill_cols = {alias: F.col(src) for src, alias in payload.items()}
    fill_cols["asof_ts"] = F.col(ts_col)
    ref_side = ref.select(
        *keys,
        F.col(ts_col).alias("_t"),
        F.lit(0).alias("_side"),
        F.col(ref_tiebreak).alias("_tb"),
        *[c.alias(f"_f_{a}") for a, c in fill_cols.items()],
    )
    probe_cols = [c for c in probe.columns]
    probe_side = probe.select(
        *probe_cols,
        F.col(ts_col).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(t).alias(f"_f_{a}")
          for a, t in zip(fill_cols, _types(ref_side, fill_cols))],
    )

    merged = ref_side.unionByName(probe_side, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy("_t", "_side", F.asc_nulls_first("_tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.select(
        "*",
        *[
            F.last(f"_f_{a}", ignorenulls=True).over(w).alias(a)
            for a in fill_cols
        ],
    )
    return filled.filter(F.col("_side") == 1).select(
        *probe_cols, *fill_cols.keys()
    )


def _types(ref_side: DataFrame, fill_cols: dict) -> list:
    by_name = {f.name: f.dataType for f in ref_side.schema.fields}
    return [by_name[f"_f_{a}"] for a in fill_cols]


def asof_join_forward(
    probe: DataFrame,
    ref: DataFrame,
    keys: list[str],
    ts_col: str,
    payload: dict[str, str],
    ref_tiebreak: str,
) -> DataFrame:
    """Forward-inclusive as-of: for every probe row, the EARLIEST ref
    row with ``ref.ts >= probe.ts`` on the same keys (NULLs when none
    follows) — the "next quote / next tick" lookup, mirror of
    `asof_join_backward` with the same single-shuffle union-marker
    plan, just the reversed frame: probes sort BEFORE same-instant
    refs (inclusive bound), ref ties on one (keys, ts) resolve to the
    max tiebreak (the last revision is the one in force, matching the
    backward join's LWW rule), and ``first(ignorenulls)`` looks over
    currentRow..unboundedFollowing."""
    fill_cols = {alias: F.col(src) for src, alias in payload.items()}
    fill_cols["asof_ts"] = F.col(ts_col)
    ref_side = ref.select(
        *keys,
        F.col(ts_col).alias("_t"),
        F.lit(1).alias("_side"),
        F.col(ref_tiebreak).alias("_tb"),
        *[c.alias(f"_f_{a}") for a, c in fill_cols.items()],
    )
    probe_cols = [c for c in probe.columns]
    probe_side = probe.select(
        *probe_cols,
        F.col(ts_col).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(t).alias(f"_f_{a}")
          for a, t in zip(fill_cols, _types(ref_side, fill_cols))],
    )

    merged = ref_side.unionByName(probe_side, allowMissingColumns=True)
    # same-(keys, ts) ref ties: max tiebreak must win, and with a
    # FORWARD frame the winner is whichever sorts FIRST — hence desc
    w = (
        Window.partitionBy(*keys)
        .orderBy("_t", "_side", F.desc_nulls_last("_tb"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    filled = merged.select(
        "*",
        *[
            F.first(f"_f_{a}", ignorenulls=True).over(w).alias(a)
            for a in fill_cols
        ],
    )
    return filled.filter(F.col("_side") == 0).select(
        *probe_cols, *fill_cols.keys()
    )


def sessionize(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    gap_seconds: int,
    tiebreak: str,
) -> DataFrame:
    """Append a per-key ``session_id`` (1-based, in time order): a new
    session starts when the gap to the previous row strictly exceeds
    ``gap_seconds``. Integer-µs comparison on both engines, so the
    boundary is exact. One shuffle on ``keys``; ``tiebreak`` orders
    same-timestamp rows deterministically."""
    w = Window.partitionBy(*keys).orderBy(ts_col, tiebreak)
    us = F.unix_micros(F.col(ts_col))
    prev = F.lag(us).over(w)
    is_new = (
        prev.isNull() | ((us - prev) > gap_seconds * US)
    ).cast("long")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(
        "session_id", F.sum(is_new).over(run)
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    window_seconds: int,
) -> DataFrame:
    """Equi-join plan for the range predicate
    ``left.ts <= right.ts < left.ts + window`` on shared ``keys``.

    Bucket width equals the window, so a right row in bucket b can
    only match left rows in buckets {b-1, b}: the right side explodes
    into those two bucket keys, both sides equi-join on
    (keys, bucket), and the exact predicate filters residuals. Every
    qualifying (left, right) pair meets in exactly one bucket —
    ``left``'s bucket — so the output needs no dedup. Column names
    must be disjoint apart from ``keys``."""
    w_us = window_seconds * US
    lb = left.withColumn(
        "_bucket", F.floor(F.unix_micros(F.col(left_ts)) / w_us)
    )
    rbucket = F.floor(F.unix_micros(F.col(right_ts)) / w_us)
    rb = right.withColumn(
        "_bucket", F.explode(F.array(rbucket, rbucket - 1))
    )
    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))
    return (
        lb.join(rb, on=[*keys, "_bucket"])
        .filter((r_us >= l_us) & (r_us < l_us + w_us))
        .drop("_bucket")
    )


def scd2_history(
    df: DataFrame,
    key_cols: list[str],
    attr_col: str,
    order_by: list[str],
    ts_col: str,
) -> DataFrame:
    """Slowly-changing-dimension type-2 history from a change feed:
    collapse consecutive duplicate attribute values per key, then
    stamp each surviving version with its validity interval
    [valid_from, valid_to) — valid_to NULL marks the current row.

    Both passes ride the SAME (key, order) window partitioning —
    Catalyst plans one hash exchange + one sort for the lag-based
    change detection AND the lead-based interval stamping, so the
    whole dimension build is shuffle-once. NULL-safe comparison: a
    NULL→value attribute transition is a real version change."""
    w = Window.partitionBy(*key_cols).orderBy(*order_by)
    changed = df.withColumn(
        "_prev", F.lag(attr_col).over(w)
    ).withColumn(
        "_first", F.row_number().over(w) == 1
    ).filter(
        F.col("_first") | ~F.col(attr_col).eqNullSafe(F.col("_prev"))
    )
    w2 = Window.partitionBy(*key_cols).orderBy(*order_by)
    return (
        changed.withColumn("version", F.row_number().over(w2))
        .withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w2))
        .withColumn("is_current", F.col("valid_to").isNull().cast("int"))
        .drop("_prev", "_first")
    )


def gap_fill_forward(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    interval_seconds: int,
) -> DataFrame:
    """Regularize a sparse series to a fixed grid with forward fill:
    per key, generate the full bucket spine between the key's first
    and last observation, left-join the observed buckets, and carry
    the last observed value forward into the gaps.

    Plan: one groupBy for the per-key [min, max] span, a
    sequence+explode spine (bounded fan-out: span/interval rows per
    key — no cross join against a global calendar), one equi-join
    back on (key, bucket), one window pass for the fill. The spine
    explode is the scale decision: a global calendar × keys cross
    join materializes (all keys × all buckets) regardless of span;
    the per-key sequence only generates each key's own range."""
    bucket = F.timestamp_seconds(
        F.floor(F.unix_micros(F.col(ts_col)) / (interval_seconds * US))
        * interval_seconds
    )
    # bucket mean over 6-decimal-quantized inputs, computed EXACTLY:
    # decimal sum (associative, order-independent) cast to double,
    # then one IEEE division — bit-identical in any engine, no
    # rounding step to sit on a half-boundary (a plain ROUND(AVG)
    # flipped its last digit between engines at sf0.1)
    observed = (
        df.select(F.col(key_col), bucket.alias("bucket"), F.col(value_col))
        .groupBy(key_col, "bucket")
        .agg(
            (
                F.sum(F.col(value_col).cast("decimal(18,6)"))
                .cast("double")
                / F.count(value_col)
            ).alias("_obs")
        )
        # observed feeds both the span computation and the final join;
        # checkpointing it makes the whole fill a SINGLE scan of the
        # raw series (measured: 2 FileScans → 1). Its size is the
        # output grid, already the operator's working set.
        .localCheckpoint(eager=True)
    )
    # spans derive from the bucketed aggregate, not a second raw scan
    spans = observed.groupBy(key_col).agg(
        F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi")
    )
    step = F.expr(f"INTERVAL {interval_seconds} SECONDS")
    spine = spans.select(
        key_col,
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), step)
        ).alias("bucket"),
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(observed, on=[key_col, "bucket"], how="left")
        .withColumn(
            "value_filled", F.last("_obs", ignorenulls=True).over(w)
        )
        .withColumn("is_gap", F.col("_obs").isNull().cast("int"))
        .drop("_obs")
    )
