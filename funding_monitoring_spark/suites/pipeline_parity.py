"""Reference pipeline parity queries (SURVEY.md §3): the three ETL
transform chains besides the flagship, each re-expressed as one
declarative plan over the fixture tables.

Fixture mapping (FIXTURES.md): the REST JSON payload frames are played
by fixture tables; string-typed numerics and camelCase names are
reconstructed in-query so the normalization steps (casts, renames)
exercise the same semantics the reference applies to raw API data.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from funding_monitoring_spark.functions.scalars import (
    ceil_to_interval,
    snake_case_columns,
    time_of_day,
    trunc_seconds,
)
from funding_monitoring_spark.registry import query
from funding_monitoring_spark.sources.tables import load_table


#: oracle SQL for the three fan-out chains, shared with the composed
#: main-DAG parity oracle (suites/main_dag_suite.py)
FUTURES_SNAPSHOT_SQL = """
    WITH raw AS (  -- camelCase + string numerics, like the REST payload
        SELECT CAST(user_id AS VARCHAR) || '-' || event_type || '-TM'
                   AS symbol,
               CAST(value AS VARCHAR) AS "tickSize",
               event_type AS "baseCurrency",
               ts AS "openDate",
               event_id
        FROM events
    )
    SELECT symbol,
           CAST("tickSize" AS DOUBLE) AS tick_size,
           replace("baseCurrency", 'error', 'fault') AS base_currency,
           date_trunc('second', "openDate") AS first_open_date,
           strftime("openDate", '%H:%M:%S') AS time_to_next_funding_rate
    FROM raw
    WHERE symbol LIKE '%TM' AND event_id % 2 = 0
    """


@query("futures_snapshot", FUTURES_SNAPSHOT_SQL)
def q_futures_snapshot(spark, sf_dir):
    """Active-futures snapshot chain (active_futures_etl.py:15-104):
    keep-list projection (P1) → suffix filter F1 (endswith 'TM') →
    camelCase→snake_case rename (P7) → literal replace C3 (XBT→BTC) →
    timestamp truncation C8 + time-of-day C7 → typed columns.
    The event_id%2 predicate stands in for payload-level row filtering.
    """
    events = load_table(spark, sf_dir, "events")
    raw = events.select(
        F.concat_ws(
            "-", F.col("user_id"), F.col("event_type"), F.lit("TM")
        ).alias("symbol"),
        F.col("value").cast("string").alias("tickSize"),
        F.col("event_type").alias("baseCurrency"),
        F.col("ts").alias("openDate"),
        F.col("event_id"),
    )
    raw = raw.filter(F.col("symbol").endswith("TM")).filter(
        F.col("event_id") % 2 == 0
    )
    snake = snake_case_columns(raw)
    return snake.select(
        "symbol",
        F.col("tick_size").cast("double").alias("tick_size"),
        F.regexp_replace("base_currency", "error", "fault").alias(
            "base_currency"
        ),
        trunc_seconds("open_date").alias("first_open_date"),
        time_of_day("open_date").alias("time_to_next_funding_rate"),
    )


@query("truncate_bulk_load", FUTURES_SNAPSHOT_SQL)
def q_truncate_bulk_load(spark, sf_dir):
    """K3 — TRUNCATE-and-bulk-INSERT sink parity (reference
    active_futures_etl.py:90-104: TRUNCATE + tab-sep COPY each tick).
    Tick 1 loads a stale subset into the store; tick 2 truncate-reloads
    the full snapshot. The returned store contents equal the snapshot
    oracle ONLY if the first tick's rows were fully truncated — a
    leaked stale row breaks the row-count/hash compare."""
    import tempfile

    from funding_monitoring_spark.sources.sinks import overwrite_parquet

    snap = q_futures_snapshot(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="fm_k3_store_") + "/active_futures"
    # tick 1: a stale partial snapshot (simulates yesterday's universe)
    overwrite_parquet(snap.filter(F.col("tick_size") > 100.0), path)
    # tick 2: truncate + full bulk reload
    overwrite_parquet(snap, path)
    return spark.read.parquet(path)


SPOT_PAIRS_SNAPSHOT_SQL = """
    WITH raw AS (
        SELECT CAST(user_id AS VARCHAR) || '-' || event_type AS symbol,
               CAST(value AS VARCHAR) AS vol
        FROM events
    )
    SELECT symbol,
           CAST(vol AS DOUBLE) AS spot_unit_volume24h,
           split_part(symbol, '-', 1) AS base_currency,
           split_part(symbol, '-', 2) AS quote_currency
    FROM raw
    WHERE split_part(symbol, '-', 2) = 'purchase'
    """


@query("spot_pairs_snapshot", SPOT_PAIRS_SNAPSHOT_SQL)
def q_spot_pairs_snapshot(spark, sf_dir):
    """Spot-pairs snapshot chain (active_spot_pairs_etl.py:15-75):
    derive base/quote via split-and-index C2, str→double cast C14,
    equality filter F2 on the quote currency (== 'USDT')."""
    events = load_table(spark, sf_dir, "events")
    symbol = F.concat_ws("-", F.col("user_id"), F.col("event_type"))
    raw = events.select(
        symbol.alias("symbol"), F.col("value").cast("string").alias("vol")
    )
    out = raw.select(
        "symbol",
        F.col("vol").cast("double").alias("spot_unit_volume24h"),
        F.split(F.col("symbol"), "-")[0].alias("base_currency"),
        F.split(F.col("symbol"), "-")[1].alias("quote_currency"),
    )
    return out.filter(F.col("quote_currency") == "purchase")


LENDING_PIPELINE_SQL = """
    WITH anchored AS (
        SELECT *, (SELECT MAX(ts) FROM events) AS anchor FROM events
    ),
    grouped AS (  -- group-min per term (user_id % 4 plays the term)
        SELECT CAST(user_id % 4 AS INT) AS loan_duration_days,
               MIN(CAST(CAST(value AS VARCHAR) AS DOUBLE))
                   AS daily_interest_rate,
               MAX(anchor) AS anchor
        FROM anchored GROUP BY user_id % 4
    )
    SELECT make_timestamp((CAST(FLOOR(epoch(anchor) / 300) AS BIGINT) + 1)
                          * 300 * 1000000) AS created_at,
           daily_interest_rate,
           loan_duration_days,
           ROUND(daily_interest_rate * 365, 6) AS annualized_interest_rate
    FROM grouped
    """


@query("lending_pipeline", LENDING_PIPELINE_SQL)
def q_lending_pipeline(spark, sf_dir):
    """Lending chain (lending_data_etl.py:20-91): str→double cast C14 →
    group-min per term A1 → annualize ×365 C13 → ceil-to-next-5-min
    ingestion bucket C10 → fixed column order P4. 'now' is anchored at
    max(ts) for determinism (reference uses utcnow,
    lending_data_etl.py:53)."""
    events = load_table(spark, sf_dir, "events")
    anchor = events.agg(F.max("ts").alias("anchor"))
    anchored = events.crossJoin(F.broadcast(anchor))
    grouped = (
        anchored.groupBy(
            (F.col("user_id") % 4).cast("int").alias("loan_duration_days")
        ).agg(
            F.min(F.col("value").cast("string").cast("double")).alias(
                "daily_interest_rate"
            ),
            F.max("anchor").alias("anchor"),
        )
    )
    return grouped.select(
        ceil_to_interval("anchor", 300).alias("created_at"),
        "daily_interest_rate",
        "loan_duration_days",
        F.round(F.col("daily_interest_rate") * 365, 6).alias(
            "annualized_interest_rate"
        ),
    )


@query(
    "paged_backfill",
    """
    SELECT event_id, ts, event_type, value FROM events
    """,
)
def q_paged_backfill(spark, sf_dir):
    """Historical backfill via the reference's paging protocol
    (funding_rates_etl.py:43-66): newest-first pages keyed by an
    inclusive oldest-row-timestamp cursor, accumulated until hasMore
    is false, boundary duplicates collapsed. A correct implementation
    reproduces the plain full scan exactly — no row lost at a page
    edge, none double-counted — which is precisely what the oracle
    checks. ~8 pages over the 30-day fixture span at a 4-day window.
    """
    import datetime as dt

    from funding_monitoring_spark.sources.paged import (
        read_paged,
        time_window_page_fetcher,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    fetch = time_window_page_fetcher(
        events, ts_col="ts", window=dt.timedelta(days=4)
    )
    return read_paged(fetch, key_cols=["event_id"], order_cols=["ts"])
