"""Temporal operator queries — as-of join, sessionization (lag-based
and native session_window), bucketed interval join — over the
`events` fixture (stand-in for kucoin_funding_rates per FIXTURES.md).

Each oracle is written as an independent SQL formulation (correlated
subquery for as-of; window SQL for sessions; a plain theta join for
the interval join) so the check is two different algorithms agreeing,
not one algorithm transcribed twice. All raw `ts` values are CAST to
microsecond TIMESTAMP in the oracle because DuckDB reads the events
parquet at nanosecond precision while the Spark loader truncates to
microseconds (sources/tables.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from funding_monitoring_spark.operators import temporal as T
from funding_monitoring_spark.registry import query
from funding_monitoring_spark.sources.tables import load_table
from funding_monitoring_spark.streaming.pipelines import (
    SESSION_GAP_SECONDS as GAP_SECONDS,
)


def session_window_oracle_sql(gap_seconds: int = GAP_SECONDS) -> str:
    """Lag-based SQL formulation of merging gap sessions — shared by
    the batch session_window query and its streaming twin so the two
    can never drift apart on gap or boundary rule (new session iff
    gap >= threshold; end = last event + gap)."""
    return f"""
    WITH flagged AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(CAST(ts AS TIMESTAMP))
                            - epoch_us(CAST(lag(ts) OVER w AS TIMESTAMP))
                            >= {gap_seconds * 1_000_000} THEN 1
                    ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts, value,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL {gap_seconds} SECOND AS session_end,
           COUNT(*) AS n_events, ROUND(SUM(value), 6) AS sum_value
    FROM sess GROUP BY user_id, sid
    """
ATTRIBUTION_SECONDS = 24 * 3600


@query(
    "asof_join_backward",
    """
    WITH trades AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        FROM events WHERE event_type = 'purchase'
    ),
    quotes AS (
        SELECT user_id, ts, value FROM (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                      ORDER BY event_id DESC) AS rn
            FROM events WHERE event_type = 'view'
        ) WHERE rn = 1
    )
    SELECT t.event_id, t.user_id, t.ts,
           (SELECT q.value FROM quotes q
            WHERE q.user_id = t.user_id AND q.ts <= t.ts
            ORDER BY q.ts DESC LIMIT 1) AS asof_value,
           (SELECT q.ts FROM quotes q
            WHERE q.user_id = t.user_id AND q.ts <= t.ts
            ORDER BY q.ts DESC LIMIT 1) AS asof_ts
    FROM trades t
    """,
)
def q_asof_join(spark, sf_dir):
    """Backward-inclusive as-of join: each purchase gets the value of
    the latest same-user view at-or-before it (the funding-rate-in-
    force lookup for the reference's rate series). Spark side is the
    union-marker plan (one shuffle); oracle is a correlated top-1
    subquery — two different algorithms, same rows."""
    ev = load_table(spark, sf_dir, "events")
    trades = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    quotes = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "value", "event_id"
    )
    return T.asof_join_backward(
        trades,
        quotes,
        keys=["user_id"],
        ts_col="ts",
        payload={"value": "asof_value"},
        ref_tiebreak="event_id",
    )


@query(
    "sessionize_events",
    f"""
    WITH flagged AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(CAST(ts AS TIMESTAMP))
                            - epoch_us(CAST(lag(ts) OVER w AS TIMESTAMP))
                            > {GAP_SECONDS * 1_000_000} THEN 1
                    ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts, value,
               CAST(SUM(is_new) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events, ROUND(SUM(value), 6) AS sum_value
    FROM sess GROUP BY user_id, session_id
    """,
)
def q_sessionize(spark, sf_dir):
    """Gap-based sessionization (8h inactivity gap) + per-session
    rollup. Session boundaries compare integer microseconds on both
    engines, so the gap test is exact."""
    ev = load_table(spark, sf_dir, "events")
    with_ids = T.sessionize(
        ev, keys=["user_id"], ts_col="ts",
        gap_seconds=GAP_SECONDS, tiebreak="event_id",
    )
    return with_ids.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


@query("session_window_agg", session_window_oracle_sql())
def q_session_window(spark, sf_dir):
    """Spark's native session_window aggregation (merging gap
    windows; window end = last event + gap) checked against the
    independent lag-based SQL formulation — pins that the built-in's
    merge semantics equal the classic definition (new session iff
    gap >= threshold; boundary equality is measure-zero on µs data
    but the oracle encodes the built-in's half-open rule exactly)."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy(
        "user_id", F.session_window("ts", f"{GAP_SECONDS} seconds")
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )
    return agg.select(
        "user_id",
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        "n_events",
        "sum_value",
    )


@query(
    "interval_join_attribution",
    """
    SELECT c.event_id AS click_id, p.event_id AS purchase_id,
           c.user_id,
           epoch_us(CAST(p.ts AS TIMESTAMP))
           - epoch_us(CAST(c.ts AS TIMESTAMP)) AS delay_us
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON p.user_id = c.user_id
     AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
     AND CAST(p.ts AS TIMESTAMP)
         < CAST(c.ts AS TIMESTAMP) + INTERVAL 24 HOUR
    """,
)
def q_interval_join(spark, sf_dir):
    """Attribution range join: purchases within 24h at-or-after a
    same-user click. Spark side is the bucketed equi-join (no theta
    join, no dedup pass); oracle is the plain inequality join."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    joined = T.interval_join(
        clicks,
        purchases,
        keys=["user_id"],
        left_ts="click_ts",
        right_ts="purchase_ts",
        window_seconds=ATTRIBUTION_SECONDS,
    )
    return joined.select(
        "click_id",
        "purchase_id",
        "user_id",
        (
            F.unix_micros("purchase_ts") - F.unix_micros("click_ts")
        ).alias("delay_us"),
    )


@query(
    "asof_join_forward",
    """
    WITH trades AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        FROM events WHERE event_type = 'purchase'
    ),
    quotes AS (
        SELECT user_id, ts, value FROM (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                      ORDER BY event_id DESC) AS rn
            FROM events WHERE event_type = 'view'
        ) WHERE rn = 1
    )
    SELECT t.event_id, t.user_id, t.ts,
           (SELECT q.value FROM quotes q
            WHERE q.user_id = t.user_id AND q.ts >= t.ts
            ORDER BY q.ts ASC LIMIT 1) AS next_value,
           (SELECT q.ts FROM quotes q
            WHERE q.user_id = t.user_id AND q.ts >= t.ts
            ORDER BY q.ts ASC LIMIT 1) AS asof_ts
    FROM trades t
    """,
)
def q_asof_join_forward(spark, sf_dir):
    """Forward-inclusive as-of join: each purchase gets the value of
    the EARLIEST same-user view at-or-after it (the next-tick lookup —
    completes the as-of pair with asof_join_backward; same
    single-shuffle union-marker plan, reversed frame). Oracle is the
    correlated first-after subquery — different algorithm, same rows."""
    ev = load_table(spark, sf_dir, "events")
    trades = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    quotes = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "value", "event_id"
    )
    return T.asof_join_forward(
        trades,
        quotes,
        keys=["user_id"],
        ts_col="ts",
        payload={"value": "next_value"},
        ref_tiebreak="event_id",
    )


SCD2_ORACLE = """
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               LAG(event_type) OVER w AS prev,
               ROW_NUMBER() OVER w AS rn
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    changed AS (
        SELECT * FROM ordered
        WHERE rn = 1 OR event_type IS DISTINCT FROM prev
    )
    SELECT user_id, event_type,
           ROW_NUMBER() OVER w2 AS version,
           ts AS valid_from,
           LEAD(ts) OVER w2 AS valid_to,
           CAST(LEAD(ts) OVER w2 IS NULL AS INT) AS is_current
    FROM changed
    WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@query("scd2_history", SCD2_ORACLE)
def q_scd2_history(spark, sf_dir):
    """Type-2 slowly-changing-dimension build from the event feed
    (operators/temporal.py scd2_history): per user, consecutive
    duplicate states collapse and each surviving version carries its
    [valid_from, valid_to) interval, valid_to NULL = current. Both
    passes (lag change-detection, lead interval-stamping) share one
    (user, time) window partitioning — the whole dimension build is
    one shuffle."""
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    out = T.scd2_history(
        events,
        key_cols=["user_id"],
        attr_col="event_type",
        order_by=[F.col("ts"), F.col("event_id")],
        ts_col="ts",
    )
    return out.select(
        "user_id", "event_type", "version", "valid_from", "valid_to",
        "is_current",
    )


_GAP_INTERVAL = 3600

GAP_FILL_ORACLE = f"""
    WITH obs AS (
        SELECT event_type,
               make_timestamp((epoch_us(ts) // {_GAP_INTERVAL * 1_000_000})
                              * {_GAP_INTERVAL * 1_000_000}) AS bucket,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(value) AS _obs
        FROM events GROUP BY 1, 2
    ),
    spans AS (
        SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi
        FROM obs GROUP BY event_type
    ),
    spine AS (
        SELECT event_type,
               unnest(generate_series(lo, hi,
                                      INTERVAL {_GAP_INTERVAL} SECOND))
                   AS bucket
        FROM spans
    )
    SELECT s.event_type, s.bucket,
           last_value(o._obs IGNORE NULLS) OVER (
               PARTITION BY s.event_type ORDER BY s.bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS value_filled,
           CAST(o._obs IS NULL AS INT) AS is_gap
    FROM spine s
    LEFT JOIN obs o ON o.event_type = s.event_type
                    AND o.bucket = s.bucket
"""


@query("gap_fill_hourly", GAP_FILL_ORACLE)
def q_gap_fill_hourly(spark, sf_dir):
    """Regularize each symbol's sparse series to the hourly grid with
    forward fill (operators/temporal.py gap_fill_forward): the spine
    is a PER-KEY sequence+explode between that key's first and last
    observation — bounded fan-out, no global-calendar cross join —
    then one left join back and one window pass carries the last
    observation into the gaps."""
    events = load_table(spark, sf_dir, "events")
    return T.gap_fill_forward(
        events,
        key_col="event_type",
        ts_col="ts",
        value_col="value",
        interval_seconds=_GAP_INTERVAL,
    )
