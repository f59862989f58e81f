"""General window-function surface: navigation (lag/lead), ranking
(rank, dense_rank, row_number, ntile), and running aggregates.

The reference's only window computation is the guarded rolling mean +
first_value (SURVEY.md §2.5, reference scripts/funding_stats_etl.py:
77-95); a general analytics engine needs the full ranking/navigation
family, so it is exposed and oracle-checked here over the ``events``
time series.

Scale shape: every expression below shares ONE window partitioning
(``user_id``), so the whole query is a single hash shuffle on the
partition key followed by one per-partition sort — Spark plans all
frames over the same (partition, order) in one Window physical node.
Rank ties are impossible because the ordering key ``(ts, event_id)``
is unique per partition (event_id is globally unique).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from funding_monitoring_spark.registry import query
from funding_monitoring_spark.sources.tables import load_table


@query(
    "window_functions_suite",
    """
    SELECT event_id, user_id,
           ROUND(value, 6) AS value_r,
           ROUND(LAG(value) OVER w, 6) AS prev_value,
           ROUND(LEAD(value) OVER w, 6) AS next_value,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER (PARTITION BY user_id
                        ORDER BY ROUND(value, 6) DESC, event_id) AS value_rank,
           DENSE_RANK() OVER (PARTITION BY user_id
                              ORDER BY event_type) AS type_rank,
           NTILE(4) OVER w AS quartile,
           ROUND(SUM(value) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW), 6) AS running_sum,
           ROUND(AVG(value) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING
                                       AND CURRENT ROW), 6) AS ma3
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_window_functions(spark, sf_dir):
    """One shuffle on user_id; all ten window expressions evaluate in
    a single per-partition sort pass (shared frame ordering)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_rank = Window.partitionBy("user_id").orderBy(
        F.round("value", 6).desc(), F.col("event_id")
    )
    w_type = Window.partitionBy("user_id").orderBy("event_type")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_ma3 = w.rowsBetween(-2, Window.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        F.round("value", 6).alias("value_r"),
        F.round(F.lag("value").over(w), 6).alias("prev_value"),
        F.round(F.lead("value").over(w), 6).alias("next_value"),
        F.row_number().over(w).alias("rn"),
        F.rank().over(w_rank).alias("value_rank"),
        F.dense_rank().over(w_type).alias("type_rank"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.sum("value").over(w_run), 6).alias("running_sum"),
        F.round(F.avg("value").over(w_ma3), 6).alias("ma3"),
    )


#: shared with the streaming twin (stream_hopping_rollup): the
#: converged streaming store must equal this batch aggregation
HOPPING_ORACLE_SQL = """
    WITH hops AS (
        SELECT event_type, value,
               -- integer µs arithmetic: epoch()::BIGINT would ROUND
               -- fractional seconds and misplace boundary events
               unnest([
                   make_timestamp(
                       (epoch_us(ts) // 300000000) * 300000000),
                   make_timestamp(
                       (epoch_us(ts) // 300000000) * 300000000
                       - 300000000)
               ]) AS window_start
        FROM events
    )
    SELECT window_start,
           window_start + INTERVAL 10 MINUTE AS window_end,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 6) AS sum_value
    FROM hops
    GROUP BY 1, 2, 3
    """


@query("hopping_window_rollup", HOPPING_ORACLE_SQL)
def q_hopping_window_rollup(spark, sf_dir):
    """Hopping (sliding) window aggregation in BATCH: 10-minute
    windows advancing every 5 minutes, so each event lands in exactly
    two windows — `F.window(ts, "10 minutes", "5 minutes")` is Spark's
    native overlapping-window explode-then-aggregate; the oracle
    materializes the same two covering window starts per event.

    Scale: the explode doubles rows BEFORE one hash aggregation on
    (window, type) — map-side partial aggregation collapses the blowup
    per task, so the exchange carries one row per (window, type) per
    partition, same as a tumbling rollup."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "trailing_time_features",
    """
    SELECT event_id, user_id,
           COUNT(*) OVER w AS n_last_30m,
           ROUND(AVG(value) OVER w, 6) AS avg_value_30m
    FROM events
    WINDOW w AS (
        PARTITION BY user_id ORDER BY epoch_us(ts)
        RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW)
    """,
)
def q_trailing_time_features(spark, sf_dir):
    """Time-based (RANGE) window frame: per-user trailing-30-minute
    event count and mean value — the feature-engineering shape rows-
    based frames can't express (a user's events are irregularly
    spaced). Ordering is integer epoch-µs on BOTH engines so frame
    membership is exact, not float-fuzzy.

    Scale: one hash shuffle on user_id + per-partition sort, identical
    to the rows-based window family; frame width bounds state, not
    partition size."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-1800 * 1_000_000, Window.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_last_30m"),
        F.round(F.avg("value").over(w), 6).alias("avg_value_30m"),
    )


@query(
    "window_distribution_suite",
    """
    SELECT event_id, user_id,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume,
           ROUND(FIRST_VALUE(value) OVER wf, 6) AS first_val,
           ROUND(LAST_VALUE(value) OVER wf, 6) AS last_val,
           ROUND(NTH_VALUE(value, 2) OVER wf, 6) AS second_val
    FROM events
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY ROUND(value, 6), event_id),
           wf AS (PARTITION BY user_id
                  ORDER BY ROUND(value, 6), event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING
                       AND UNBOUNDED FOLLOWING)
    """,
)
def q_window_distribution(spark, sf_dir):
    """The distribution half of the window family: percent_rank /
    cume_dist (rank ratios — exact rationals, identical across
    engines) and first/last/nth over the full frame. Ordering is on
    the ROUNDED value with event_id tiebreak, so cross-engine float
    ulps cannot reorder the frame (the r1 rule); one shuffle on
    user_id, every expression shares the same sort."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.round("value", 6), "event_id"
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.round(F.first("value").over(wf), 6).alias("first_val"),
        F.round(F.last("value").over(wf), 6).alias("last_val"),
        F.round(F.nth_value("value", 2).over(wf), 6).alias("second_val"),
    )
