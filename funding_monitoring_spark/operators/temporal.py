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
