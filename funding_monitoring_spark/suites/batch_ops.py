"""Batch operator surface (SURVEY.md §2.2-§2.8), one oracle-checked
query per operator family. Fixture stand-ins per FIXTURES.md §A.

Naming: every computed column is aliased identically in the Spark plan
and the oracle SQL (the driver hashes values after sorting columns by
name)."""

from __future__ import annotations

from pyspark.sql import functions as F

from funding_monitoring_spark.functions.scalars import (
    ceil_to_interval,
    snake_case_columns,
    time_of_day,
    trunc_seconds,
)
from funding_monitoring_spark.operators.rolling import latest_per_group
from funding_monitoring_spark.operators.topk import top_k_per_group
from funding_monitoring_spark.operators.upsert import dedupe_batch, upsert
from funding_monitoring_spark.registry import query
from funding_monitoring_spark.sources.tables import load_table

# ---------------------------------------------------------------- projections


@query(
    "keep_list_projection",
    "SELECT p_partkey, p_name, p_brand, p_retailprice FROM part",
)
def q_keep_list(spark, sf_dir):
    """P1-P3: keep-list projection (active_futures_etl.py:33-54)."""
    return load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand", "p_retailprice"
    )


@query(
    "snake_case_rename",
    "SELECT p_partkey AS part_key, p_name AS part_name, "
    "p_retailprice AS retail_price FROM part",
)
def q_snake_case(spark, sf_dir):
    """P6/P7/C4: camelCase→snake_case schema normalization
    (active_futures_etl.py:59-61)."""
    camel = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("partKey"),
        F.col("p_name").alias("partName"),
        F.col("p_retailprice").alias("retailPrice"),
    )
    return snake_case_columns(camel)


@query(
    "drop_column",
    "SELECT r_regionkey FROM region",
)
def q_drop_column(spark, sf_dir):
    """P5: drop column (funding_stats_etl.py:34)."""
    return load_table(spark, sf_dir, "region").drop("r_name")


# ------------------------------------------------------------------- filters


@query(
    "filter_suffix",
    "SELECT o_orderkey, o_orderpriority FROM orders "
    "WHERE o_orderpriority LIKE '%URGENT'",
)
def q_filter_suffix(spark, sf_dir):
    """F1/C1: suffix predicate (endswith 'TM' at active_futures_etl.py:30)."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").endswith("URGENT"))
        .select("o_orderkey", "o_orderpriority")
    )


@query(
    "filter_equality",
    "SELECT c_custkey, c_name, c_acctbal FROM customer "
    "WHERE c_mktsegment = 'BUILDING'",
)
def q_filter_equality(spark, sf_dir):
    """F2: equality predicate (quote_currency == 'USDT',
    active_spot_pairs_etl.py:57)."""
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_name", "c_acctbal")
    )


@query(
    "filter_time_range",
    """
    SELECT event_id, ts, user_id, value FROM events
    WHERE ts >= (SELECT MAX(ts) FROM events) - INTERVAL 7 DAY
    """,
)
def q_filter_time_range(spark, sf_dir):
    """F4/C11: lookback-window predicate (funding_time >= now-120d,
    funding_stats_etl.py:25-27), anchored at max(ts) for determinism."""
    events = load_table(spark, sf_dir, "events")
    anchor = events.agg(F.max("ts").alias("anchor"))
    return (
        events.crossJoin(F.broadcast(anchor))
        .filter(F.col("ts") >= F.col("anchor") - F.expr("INTERVAL 7 DAYS"))
        .select("event_id", "ts", "user_id", "value")
    )


# -------------------------------------------------------------- aggregations


@query(
    "group_min",
    "SELECT o_orderpriority, MIN(o_totalprice) AS min_price FROM orders "
    "GROUP BY o_orderpriority",
)
def q_group_min(spark, sf_dir):
    """A1: group-by min (lowest lending rate per term,
    lending_data_etl.py:42-45)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.min("o_totalprice").alias("min_price"))
    )


@query(
    "salted_group_agg",
    """
    SELECT l_returnflag,
           ROUND(SUM(l_quantity), 6) AS sum_qty,
           COUNT(*) AS n_rows,
           ROUND(MIN(l_extendedprice), 6) AS min_price,
           ROUND(MAX(l_extendedprice), 6) AS max_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_salted_group_agg(spark, sf_dir):
    """Skew mitigation (SURVEY.md §7 scale notes): two-phase salted
    aggregation over a low-cardinality (= maximally skewed) key; the
    result is exactly the plain groupBy — the oracle asserts the
    equivalence. operators/skew.py."""
    from funding_monitoring_spark.operators.skew import salted_agg

    li = load_table(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        ["l_returnflag"],
        {
            "sum_qty": ("sum", "l_quantity"),
            "n_rows": ("count", "l_quantity"),
            "min_price": ("min", "l_extendedprice"),
            "max_price": ("max", "l_extendedprice"),
        },
        num_salts=16,
        tiebreak_cols=["l_orderkey", "l_linenumber"],
    )
    return out.select(
        "l_returnflag",
        F.round("sum_qty", 6).alias("sum_qty"),
        "n_rows",
        F.round("min_price", 6).alias("min_price"),
        F.round("max_price", 6).alias("max_price"),
    )


@query(
    "salted_join_agg",
    """
    SELECT p_brand,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def q_salted_join_agg(spark, sf_dir):
    """Skew mitigation, join flavor: the fact side's join key is
    salted with a DETERMINISTIC per-row hash (pmod(xxhash64(pk), n) —
    stable under speculative retry, unlike rand()) and the dim side is
    replicated once per salt, so a hot part key spreads over num_salts
    shuffle partitions instead of one executor. The oracle is the
    plain join — salting must be invisible in the result
    (operators/skew.salted_join)."""
    from funding_monitoring_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        "l_discount",
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = salted_join(
        li,
        part,
        key_col="l_partkey",
        num_salts=8,
        tiebreak_cols=["l_orderkey", "l_linenumber"],
        dim_key_col="p_partkey",
    )
    # decimal sum (the q1 rule): at sf0.1 the brand revenues reach 1e9
    # where a 6-dp double rounding sits past the significand and
    # summation order flips the last digit
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,6)"
            )
        )
        .cast("double")
        .alias("revenue"),
    )


@query(
    "value_percentiles",
    """
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 6) AS p50,
           ROUND(quantile_cont(value, 0.95), 6) AS p95,
           ROUND(quantile_cont(value, 0.99), 6) AS p99
    FROM events GROUP BY event_type
    """,
)
def q_value_percentiles(spark, sf_dir):
    """Exact linear-interpolated percentiles per group (F.percentile ==
    DuckDB quantile_cont). At 100 TB swap for percentile_approx — the
    sketch variant is registered as approx_distinct-style rows-only
    (approximation has no exact oracle by construction)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.95)), 6).alias("p95"),
        F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99"),
    )


@query(
    "approx_distinct_users",
    """
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(1 AS INT) AS within_bound
    FROM events GROUP BY event_type
    """,
)
def q_approx_distinct(spark, sf_dir):
    """HyperLogLog++ distinct-user sketch per event type — the
    constant-memory scale path for COUNT(DISTINCT). Emitted in
    deterministic within-bound form so the differential driver can
    hash-check it: the sketch estimate itself is engine-specific, but
    HLL register-max merges are order-independent, so the |approx −
    exact| ≤ 3·rsd·exact flag (same 3-sigma bound as
    tests/test_extensions.py::test_approx_distinct_within_rsd_bound)
    is stable, and the oracle's exact side pins the hash."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.05).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= F.greatest(F.lit(1.0), 0.15 * F.col("exact_users"))
            )
            .cast("int")
            .alias("within_bound"),
        )
    )


@query(
    "hll_sketch_merge_rollup",
    """
    SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
           CAST(COUNT(DISTINCT date_trunc('day', ts)) AS BIGINT)
               AS n_days,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(1 AS INT) AS merge_close,
           CAST(1 AS INT) AS within_bound
    FROM events GROUP BY 1
    """,
)
def q_hll_sketch_merge_rollup(spark, sf_dir):
    """MERGEABLE distinct sketches — the property that makes
    COUNT(DISTINCT) tractable at 100 TB: each day builds its own HLL
    sketch (constant memory, map-side combinable), and coarser grains
    come from UNIONING the stored sketches (register-wise max), never
    re-scanning the raw data. The query materializes per-day sketches
    (hll_sketch_agg), merges them to weeks (hll_union_agg), and
    cross-checks against a direct weekly sketch over the raw rows:
    `merge_close` pins union-of-partials against sketch-of-whole
    within 2% — register content is equivalent, but the union gadget
    materializes at a different HLL target precision (HLL_8) than the
    direct sketch, so estimates differ by a fraction of a percent
    (measured 1488 vs 1494 on 1500 exact at sf0.1), not bit-exactly —
    and `within_bound` pins the estimate against the exact count at
    5%. Sketch estimates are engine-specific, so the flags
    + exact counts are the hashable surface (the approx_distinct_users
    pattern); at scale the daily sketch table IS the stored rollup
    artifact and weekly/monthly reads are tiny sketch merges."""
    ev = load_table(spark, sf_dir, "events")
    lgk = F.lit(12)
    daily = ev.groupBy(
        F.date_trunc("week", "ts").alias("week"),
        F.date_trunc("day", "ts").alias("day"),
    ).agg(F.hll_sketch_agg("user_id", lgk).alias("sk"))
    merged = daily.groupBy("week").agg(
        F.hll_union_agg("sk").alias("sk_merged"),
        F.count(F.lit(1)).alias("n_days"),
    )
    direct = ev.groupBy(F.date_trunc("week", "ts").alias("week")).agg(
        F.hll_sketch_agg("user_id", lgk).alias("sk_direct"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    return (
        merged.join(direct, "week")
        .select(
            "week",
            "n_days",
            "exact_users",
            (
                F.abs(
                    F.hll_sketch_estimate("sk_merged")
                    - F.hll_sketch_estimate("sk_direct")
                )
                <= F.greatest(F.lit(1.0), 0.02 * F.col("exact_users"))
            )
            .cast("int")
            .alias("merge_close"),
            (
                F.abs(
                    F.hll_sketch_estimate("sk_direct")
                    - F.col("exact_users")
                )
                <= F.greatest(F.lit(1.0), 0.05 * F.col("exact_users"))
            )
            .cast("int")
            .alias("within_bound"),
        )
    )


@query(
    "rollup_totals",
    """
    SELECT event_type,
           CAST(user_id % 4 AS INT) AS cohort,
           COUNT(*) AS n,
           ROUND(SUM(value), 6) AS total
    FROM events
    GROUP BY ROLLUP (event_type, CAST(user_id % 4 AS INT))
    """,
)
def q_rollup_totals(spark, sf_dir):
    """Hierarchical ROLLUP aggregation (subtotals + grand total) — the
    grouping-sets surface a reporting engine needs; partial aggregation
    applies per grouping set, one shuffle."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            (F.col("user_id") % 4).cast("int").alias("cohort"),
            "value",
        )
        .rollup("event_type", "cohort")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("total"),
        )
    )


@query("distinct_values", "SELECT DISTINCT event_type FROM events")
def q_distinct(spark, sf_dir):
    """S6/A2: single-column DISTINCT (symbol universe,
    funding_rates_etl.py:18-23)."""
    return load_table(spark, sf_dir, "events").select("event_type").distinct()


@query("existence_probe", "SELECT 1 AS present FROM events LIMIT 1")
def q_existence(spark, sf_dir):
    """S7/O3: emptiness probe (.first() is None,
    funding_rates_etl.py:26-29)."""
    return (
        load_table(spark, sf_dir, "events")
        .select(F.lit(1).alias("present"))
        .limit(1)
    )


@query(
    "group_count_guard",
    """
    SELECT event_type,
           CASE WHEN COUNT(*) >= 50
                THEN ROUND(AVG(value), 6) END AS avg_value,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
)
def q_count_guard(spark, sf_dir):
    """F5/A5: aggregate guarded by group size (emit NULL when history
    < N, funding_stats_etl.py:86-97)."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.when(
                F.count(F.lit(1)) >= 50, F.round(F.avg("value"), 6)
            ).alias("avg_value"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "latest_per_group",
    """
    WITH ranked AS (
        SELECT user_id, value, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    SELECT user_id, ts AS latest_ts, value AS latest_value
    FROM ranked WHERE rn = 1
    """,
)
def q_latest_per_group(spark, sf_dir):
    """A4: newest row per group via max_by — a regular (map-side
    combinable) aggregation, not a window sort
    (funding_stats_etl.py:77-80)."""
    events = load_table(spark, sf_dir, "events")
    out = latest_per_group(
        events.select(
            "user_id",
            F.col("ts").alias("latest_ts"),
            F.col("value").alias("latest_value"),
            "event_id",
        ),
        group_cols=["user_id"],
        time_col="latest_ts",
        value_cols=["latest_ts", "latest_value"],
        tiebreak_cols=["event_id"],
    )
    return out.select("user_id", "latest_ts", "latest_value")


# -------------------------------------------------------------------- joins


@query(
    "broadcast_join_dim",
    """
    SELECT c.c_mktsegment, COUNT(*) AS n_orders,
           ROUND(SUM(o.o_totalprice), 6) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q_broadcast_join(spark, sf_dir):
    """J1: inner equi-join fact⋈dim with explicit broadcast of the small
    side (funding_stats_etl.py:101)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.join(
            F.broadcast(customer),
            orders.o_custkey == customer.c_custkey,
            "inner",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 6).alias("revenue"),
        )
    )


@query(
    "semi_join_universe",
    """
    SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size < 15)
    """,
)
def q_semi_join(spark, sf_dir):
    """J2: restrict a fact stream to a key universe via left-semi join
    (funding ingestion iterates only active symbols,
    funding_rates_etl.py:18-23,116-124)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    universe = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") < 15)
        .select("p_partkey")
    )
    return (
        lineitem.join(
            F.broadcast(universe),
            lineitem.l_partkey == universe.p_partkey,
            "left_semi",
        ).select("l_orderkey", "l_partkey", "l_quantity")
    )


# ------------------------------------------------------- sort / limit / topk


@query(
    "sort_limit",
    """
    SELECT event_id, user_id, ts, value FROM events
    ORDER BY user_id ASC, ts DESC, event_id DESC LIMIT 100
    """,
)
def q_sort_limit(spark, sf_dir):
    """O1+O2: multi-key sort + limit. Spark plans TakeOrderedAndProject
    (per-partition heap, no full sort) — the scale-path for top-k."""
    return (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts", "value")
        .orderBy(F.asc("user_id"), F.desc("ts"), F.desc("event_id"))
        .limit(100)
    )


@query(
    "topk_per_group",
    """
    WITH ranked AS (
        SELECT event_type, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY value DESC, event_id DESC) AS rank
        FROM events
    )
    SELECT event_type, event_id, value, rank FROM ranked WHERE rank <= 3
    """,
)
def q_topk_per_group(spark, sf_dir):
    """General top-k per group (generalizes O2's top-1,
    funding_rates_etl.py:68)."""
    return top_k_per_group(
        load_table(spark, sf_dir, "events").select(
            "event_type", "event_id", "value"
        ),
        group_cols=["event_type"],
        order_by=[F.desc("value"), F.desc("event_id")],
        k=3,
    )


# ----------------------------------------------------- set ops / dedup / union


@query(
    "union_append",
    """
    SELECT event_id, event_type, value FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT event_id, event_type, value FROM events WHERE event_type = 'error'
    """,
)
def q_union(spark, sf_dir):
    """U1: append-accumulate → unionByName (funding_rates_etl.py:115-126)."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    clicks = events.filter(F.col("event_type") == "click")
    errors = events.filter(F.col("event_type") == "error")
    return clicks.unionByName(errors)


@query(
    "dedup_keys",
    """
    WITH ranked AS (
        SELECT user_id, event_type, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    SELECT user_id, event_type, ts, value FROM ranked WHERE rn = 1
    """,
)
def q_dedup(spark, sf_dir):
    """U2: key dedup with a deterministic winner. The reference's
    drop_duplicates keep-first relies on API order
    (funding_rates_etl.py:93-95); dedupe_batch makes the winner explicit
    (newest by (ts, event_id))."""
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "value", "event_id"
    )
    out = dedupe_batch(
        events, key_cols=["user_id", "event_type"], order_cols=["ts", "event_id"]
    )
    return out.select("user_id", "event_type", "ts", "value")


@query(
    "upsert_merge",
    """
    WITH existing AS (
        SELECT event_id, user_id, value FROM events WHERE event_id < 800
    ),
    new AS (
        SELECT event_id, user_id, value * 2 AS value FROM events
        WHERE event_id >= 600
    )
    SELECT * FROM existing WHERE event_id NOT IN (SELECT event_id FROM new)
    UNION ALL
    SELECT * FROM new
    """,
)
def q_upsert(spark, sf_dir):
    """K1/K2: last-write-wins merge (INSERT..ON CONFLICT DO UPDATE,
    funding_rates_etl.py:100-111) as a join-based upsert: overlapping
    keys [600,800) take the NEW value."""
    events = load_table(spark, sf_dir, "events")
    existing = events.filter(F.col("event_id") < 800).select(
        "event_id", "user_id", "value"
    )
    new = events.filter(F.col("event_id") >= 600).select(
        "event_id", "user_id", (F.col("value") * 2).alias("value")
    )
    return upsert(existing, new, key_cols=["event_id"])


# ----------------------------------------------------------- scalar functions


@query(
    "scalar_datetime_suite",
    """
    SELECT event_id,
           strftime(ts, '%H:%M:%S') AS tod,
           date_trunc('second', ts) AS ts_sec,
           make_timestamp((CAST(FLOOR(epoch(ts) / 300) AS BIGINT) + 1)
                          * 300 * 1000000) AS ts_ceil5m,
           epoch_ms(date_trunc('millisecond', ts)) AS ts_ms
    FROM events
    """,
)
def q_scalar_datetime(spark, sf_dir):
    """C6-C11: time-of-day string, sub-second truncation, unconditional
    ceil-to-5-min bucketing, epoch-ms extraction."""
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        time_of_day("ts").alias("tod"),
        trunc_seconds("ts").alias("ts_sec"),
        ceil_to_interval("ts", 300).alias("ts_ceil5m"),
        F.unix_millis(F.col("ts")).alias("ts_ms"),
    )


@query(
    "scalar_string_suite",
    """
    SELECT event_id,
           CAST(user_id AS VARCHAR) || '-' || event_type AS symbol,
           split_part(CAST(user_id AS VARCHAR) || '-' || event_type,
                      '-', 1) AS base,
           split_part(CAST(user_id AS VARCHAR) || '-' || event_type,
                      '-', 2) AS quote,
           replace(event_type, 'click', 'tap') AS renamed
    FROM events
    """,
)
def q_scalar_string(spark, sf_dir):
    """C2/C3/C5: concat (f-string URL building), split-and-index
    (symbol.split('-')[i], active_spot_pairs_etl.py:48-54), literal
    replace (XBT→BTC, active_futures_etl.py:63-65)."""
    symbol = F.concat_ws("-", F.col("user_id"), F.col("event_type"))
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        symbol.alias("symbol"),
        F.split(symbol, "-")[0].alias("base"),
        F.split(symbol, "-")[1].alias("quote"),
        F.regexp_replace("event_type", "click", "tap").alias("renamed"),
    )


@query(
    "scalar_cast_annualize",
    """
    SELECT event_id,
           CAST(CAST(value AS VARCHAR) AS DOUBLE) AS value_roundtrip,
           ROUND(value * 3 * 365, 6) AS apr_funding,
           ROUND(value * 365, 6) AS apr_daily
    FROM events
    """,
)
def q_scalar_cast(spark, sf_dir):
    """C12-C14: str→double cast (API numbers arrive as strings,
    lending_data_etl.py:49) + both annualizations."""
    v = F.col("value")
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        v.cast("string").cast("double").alias("value_roundtrip"),
        F.round(v * 3 * 365, 6).alias("apr_funding"),
        F.round(v * 365, 6).alias("apr_daily"),
    )


@query(
    "json_extract",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k
    FROM events
    """,
)
def q_json_extract(spark, sf_dir):
    """C17: JSON path extraction from a raw payload column
    (payload['data']..., active_futures_etl.py:18-19)."""
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


@query(
    "nested_json_explode",
    "SELECT user_id, event_id, value FROM events",
)
def q_nested_json_explode(spark, sf_dir):
    """S2: nested-payload source — a REST-style JSON document per key
    with the rows under data.dataList (the reference's
    request_data['data']['ticker'] / ['data']['dataList'] shape,
    active_spot_pairs_etl.py:19, funding_rates_etl.py:36): parse with
    from_json + explode the nested array. The payload is synthesized
    from `events` (sort_array for determinism), so the oracle is simply
    the flat rows the round-trip must reproduce."""
    events = load_table(spark, sf_dir, "events")
    payloads = events.groupBy("user_id").agg(
        F.to_json(
            F.struct(
                F.struct(
                    F.sort_array(
                        F.collect_list(F.struct("event_id", "value"))
                    ).alias("dataList")
                ).alias("data")
            )
        ).alias("payload")
    )
    schema = "struct<data:struct<dataList:array<struct<event_id:bigint,value:double>>>>"
    parsed = payloads.select(
        "user_id", F.from_json("payload", schema).alias("j")
    )
    return parsed.select(
        "user_id", F.explode(F.col("j.data.dataList")).alias("row")
    ).select("user_id", F.col("row.event_id"), F.col("row.value"))


@query(
    "full_outer_reconciliation",
    """
    SELECT COALESCE(b.c_nationkey, a.c_nationkey) AS nationkey,
           a.n_auto, b.n_building
    FROM (SELECT c_nationkey, COUNT(*) AS n_auto FROM customer
          WHERE c_mktsegment = 'AUTOMOBILE' AND c_acctbal > 9000.0
          GROUP BY c_nationkey) a
    FULL OUTER JOIN
         (SELECT c_nationkey, COUNT(*) AS n_building FROM customer
          WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 9000.0
          GROUP BY c_nationkey) b
      ON a.c_nationkey = b.c_nationkey
    """,
)
def q_full_outer(spark, sf_dir):
    """FULL OUTER join reconciliation of two aggregate snapshots —
    unmatched sides surface as NULL counts instead of vanishing (the
    audit shape: which nations appear in one segment census but not
    the other)."""
    c = load_table(spark, sf_dir, "customer")
    hi = c.filter(F.col("c_acctbal") > 9000.0)
    a = (
        hi.filter(F.col("c_mktsegment") == "AUTOMOBILE")
        .groupBy(F.col("c_nationkey").alias("a_key"))
        .agg(F.count(F.lit(1)).alias("n_auto"))
    )
    b = (
        hi.filter(F.col("c_mktsegment") == "BUILDING")
        .groupBy(F.col("c_nationkey").alias("b_key"))
        .agg(F.count(F.lit(1)).alias("n_building"))
    )
    return a.join(b, a.a_key == b.b_key, "full_outer").select(
        F.coalesce(F.col("b_key"), F.col("a_key")).alias("nationkey"),
        "n_auto",
        "n_building",
    )


CORRUPT_MOD = 97  # deterministic corruption sieve for the quarantine demo


@query(
    "jsonl_quarantine",
    f"""
    WITH derived AS (
        SELECT event_id,
               CASE WHEN event_id % {CORRUPT_MOD} = 0
                    THEN substring(props, 1, length(props) - 2)
                    ELSE props END AS raw
        FROM events
    )
    SELECT event_id,
           CAST(NOT json_valid(raw) AS INT) AS is_corrupt,
           CASE WHEN json_valid(raw)
                THEN CAST(json_extract(raw, '$.k') AS INT) END AS k
    FROM derived
    """,
)
def q_jsonl_quarantine(spark, sf_dir):
    """Semi-structured ingestion with corrupt-record quarantine: a
    deterministic sieve truncates ~1/{mod} of the JSON payloads, and
    the parse splits rows into parsed-vs-quarantined — the PERMISSIVE
    ingestion gate every raw-JSON feed needs. Scan-stage only: from_
    json is a codegen'd expression, no shuffle; at 100 TB the corrupt
    slice writes to a quarantine table for replay instead of failing
    the job. The corruption signal is STRUCTURAL on both engines —
    Spark's columnNameOfCorruptRecord captures exactly the records
    from_json could not parse, mirroring the oracle's json_valid — so
    a hypothetical valid payload with a missing/null `k` would read as
    parsed (k NULL) on both sides rather than diverging; the remaining
    fixture invariants (props valid JSON, integer non-null k,
    length ≥ 2 so the oracle's substring stays non-negative) are
    pinned by tests/test_curation_ops.py::test_jsonl_fixture_invariants."""
    events = load_table(spark, sf_dir, "events")
    raw = F.when(
        F.col("event_id") % CORRUPT_MOD == 0,
        F.expr("substring(props, 1, length(props) - 2)"),
    ).otherwise(F.col("props"))
    parsed = F.from_json(
        raw,
        "k INT, _corrupt STRING",
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
    )
    return events.select(
        "event_id",
        parsed["_corrupt"].isNotNull().cast("int").alias("is_corrupt"),
        parsed["k"].alias("k"),
    )


_FILE_SOURCE_ORACLE = """
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(user_id) AS BIGINT) AS sum_users,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events GROUP BY event_type
"""


@query("jsonl_file_source", _FILE_SOURCE_ORACLE)
def q_jsonl_file_source(spark, sf_dir):
    """File-based JSON-lines SOURCE (not the from_json column path):
    the events table round-trips through an actual .json directory —
    distributed write, schema-first distributed read (PERMISSIVE, the
    production ingestion mode), then an aggregate the parquet oracle
    must reproduce. Exercises spark.read.json's scan path: splittable
    line files, explicit schema (no sampling-based inference job), and
    column pruning into the parsed projection."""
    import tempfile

    from pyspark.sql import types as T

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "value"
    )
    path = tempfile.mkdtemp(prefix="fm_jsonl_src_") + "/events"
    events.write.mode("overwrite").json(path)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    back = spark.read.schema(schema).json(path)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("user_id").alias("sum_users"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("sum_value"),
    )


@query("csv_file_source", _FILE_SOURCE_ORACLE)
def q_csv_file_source(spark, sf_dir):
    """Headered, quoted CSV round trip — the interchange format the
    reference's operators export to spreadsheets. Distributed write
    with header + minimal quoting, schema-first distributed read
    (header consumed, not inferred — inference would cost an extra
    scan job at 100 TB). Doubles survive because Spark writes
    round-trip-exact shortest reprs."""
    import tempfile

    from pyspark.sql import types as T

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "value"
    )
    path = tempfile.mkdtemp(prefix="fm_csv_src_") + "/events"
    events.write.mode("overwrite").option("header", True).csv(path)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    back = spark.read.schema(schema).option("header", True).csv(path)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("user_id").alias("sum_users"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("sum_value"),
    )


@query("orc_file_source", _FILE_SOURCE_ORACLE)
def q_orc_file_source(spark, sf_dir):
    """ORC round trip — the second columnar container Spark ships a
    vectorized reader for. Same scan properties as parquet (column
    pruning, predicate pushdown, splittable stripes), so a lakehouse
    standardizing on ORC loses nothing from this engine; the oracle
    over the parquet twin proves the two containers carry identical
    values."""
    import tempfile

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "value"
    )
    path = tempfile.mkdtemp(prefix="fm_orc_src_") + "/events"
    events.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("user_id").alias("sum_users"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("sum_value"),
    )


@query(
    "parquet_footer_scan",
    """
    SELECT 8 AS n_files,
           CAST(COUNT(*) AS BIGINT) AS total_rows,
           5 AS n_columns,
           'SNAPPY' AS codec,
           1 AS rows_match_rowgroups,
           1 AS has_created_by
    FROM events
    """,
)
def q_parquet_footer_scan(spark, sf_dir):
    """Data-lake metadata audit WITHOUT a parquet reader library:
    Spark writes the events table as an 8-file snappy parquet
    directory (distributed write), the part paths parallelize back
    out, and each file's FOOTER parses with the pure Thrift
    compact-protocol reader (operators/parquetmeta.py — ULEB128
    varints, zigzag ints, nibble field headers; generic
    {field_id: value} structs, no IDL transcription). The audit
    cross-checks footer num_rows against the row-group sums and sums
    rows across files — the oracle proves the hand-parsed metadata
    equals the table Spark wrote (COUNT(*), column count, codec). At
    100 TB this is the estate-profiling shape: ~64 KiB tail read per
    file, never the data pages; pyarrow cross-validates the parser in
    tests."""
    import os
    import tempfile
    from typing import Iterator

    import pandas as pd
    import pyspark.sql.types as T

    from funding_monitoring_spark.operators.multimodal import (
        register_module_by_value,
    )

    register_module_by_value(__name__)

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "user_id", "value"
    )
    path = tempfile.mkdtemp(prefix="fm_pqmeta_") + "/events"
    events.repartition(8).write.mode("overwrite").parquet(path)
    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    paths = spark.createDataFrame(
        [(p,) for p in files], "path string"
    ).repartition(len(files))

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from funding_monitoring_spark.operators.parquetmeta import (
            parse_parquet_footer,
        )

        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                with open(p, "rb") as fh:
                    info = parse_parquet_footer(fh.read())
                rg_rows = sum(
                    rg["num_rows"] for rg in info["row_groups"]
                )
                codecs = {
                    c["codec"]
                    for rg in info["row_groups"]
                    for c in rg["columns"]
                }
                rows.append(
                    {
                        "num_rows": info["num_rows"],
                        "n_columns": len(info["columns"]),
                        "codec": codecs.pop() if len(codecs) == 1
                        else "MIXED",
                        "rows_match": int(rg_rows == info["num_rows"]),
                        "has_created_by": int(
                            bool(info["created_by"])
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    per_file = paths.mapInPandas(
        scan,
        schema=T.StructType(
            [
                T.StructField("num_rows", T.LongType()),
                T.StructField("n_columns", T.IntegerType()),
                T.StructField("codec", T.StringType()),
                T.StructField("rows_match", T.IntegerType()),
                T.StructField("has_created_by", T.IntegerType()),
            ]
        ),
    )
    return per_file.agg(
        F.count(F.lit(1)).cast("int").alias("n_files"),
        F.sum("num_rows").alias("total_rows"),
        F.max("n_columns").alias("n_columns"),
        F.max("codec").alias("codec"),
        F.min("rows_match").alias("rows_match_rowgroups"),
        F.min("has_created_by").alias("has_created_by"),
    )


@query(
    "orc_footer_scan",
    """
    SELECT 8 AS n_files,
           CAST(COUNT(*) AS BIGINT) AS total_rows,
           4 AS n_columns,
           'SNAPPY' AS compression,
           1 AS rows_match_stripes
    FROM events
    """,
)
def q_orc_footer_scan(spark, sf_dir):
    """ORC estate audit WITHOUT an ORC reader library — the columnar
    twin of parquet_footer_scan: Spark writes the events table as an
    8-file snappy ORC directory, and each file's tail parses with the
    pure protobuf walker (operators/orcmeta.py — generic
    {field_no: [values]} messages, packed repeated fields, the ORC
    postscript/footer layout, 3-byte compression-chunk framing, and a
    PURE-PYTHON SNAPPY DECOMPRESSOR for the footer blocks). The audit
    cross-checks footer row counts against per-stripe sums and sums
    rows across files; the oracle proves the hand-parsed metadata
    equals the table Spark wrote. Spark's own ORC reader
    cross-validates the parser in tests across all three supported
    compression kinds."""
    import os
    import tempfile
    from typing import Iterator

    import pandas as pd
    import pyspark.sql.types as T

    from funding_monitoring_spark.operators.multimodal import (
        register_module_by_value,
    )

    register_module_by_value(__name__)

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "value"
    )
    path = tempfile.mkdtemp(prefix="fm_orcmeta_") + "/events"
    events.repartition(8).write.mode("overwrite").option(
        "compression", "snappy"
    ).orc(path)
    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".orc")
    )
    paths = spark.createDataFrame(
        [(p,) for p in files], "path string"
    ).repartition(len(files))

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from funding_monitoring_spark.operators.orcmeta import (
            parse_orc_footer,
        )

        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                with open(p, "rb") as fh:
                    info = parse_orc_footer(fh.read())
                stripe_rows = sum(
                    s["num_rows"] for s in info["stripes"]
                )
                rows.append(
                    {
                        "num_rows": info["num_rows"],
                        "n_columns": len(info["columns"]),
                        "compression": info["compression"],
                        "rows_match": int(
                            stripe_rows == info["num_rows"]
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    per_file = paths.mapInPandas(
        scan,
        schema=T.StructType(
            [
                T.StructField("num_rows", T.LongType()),
                T.StructField("n_columns", T.IntegerType()),
                T.StructField("compression", T.StringType()),
                T.StructField("rows_match", T.IntegerType()),
            ]
        ),
    )
    return per_file.agg(
        F.count(F.lit(1)).cast("int").alias("n_files"),
        F.sum("num_rows").alias("total_rows"),
        F.max("n_columns").alias("n_columns"),
        F.max("compression").alias("compression"),
        F.min("rows_match").alias("rows_match_stripes"),
    )


@query("xml_file_source", _FILE_SOURCE_ORACLE)
def q_xml_file_source(spark, sf_dir):
    """XML round trip through Spark 4's NATIVE xml data source (the
    donated spark-xml reader, now built in): distributed write with a
    row tag, schema-first distributed read — the enterprise-feed
    interchange format (vendor exports, sitemap-style corpora) that a
    crawl-ingest pipeline hits constantly. The same three-aggregate
    oracle as every other file source proves the markup serialization
    (escaping, empty elements, float formatting) loses nothing."""
    import tempfile

    from pyspark.sql import types as T

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "value"
    )
    path = tempfile.mkdtemp(prefix="fm_xml_src_") + "/events"
    events.write.mode("overwrite").format("xml").option(
        "rowTag", "event"
    ).save(path)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    back = (
        spark.read.schema(schema)
        .format("xml")
        .option("rowTag", "event")
        .load(path)
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("user_id").alias("sum_users"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("sum_value"),
    )


@query("tsv_file_source", _FILE_SOURCE_ORACLE)
def q_tsv_file_source(spark, sf_dir):
    """K5 as a driver-visible round trip: the headerless
    tab-separated bulk-load format (the reference's COPY intermediate,
    active_futures_etl.py:103) written and read back distributed with
    an explicit schema, then aggregated against the parquet oracle —
    proving the text serialization (tabs, empty values, float
    formatting) loses nothing the pipeline needs."""
    import tempfile

    from pyspark.sql import types as T

    from funding_monitoring_spark.sources.sinks import read_tsv, write_tsv

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "value"
    )
    path = tempfile.mkdtemp(prefix="fm_tsv_src_") + "/events"
    write_tsv(events, path)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    back = read_tsv(spark, path, schema)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("user_id").alias("sum_users"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("sum_value"),
    )


@query(
    "data_contract_report",
    """
    WITH checks AS (
        SELECT 'not_null(l_orderkey)' AS rule,
               CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_violations
        FROM lineitem
        UNION ALL
        SELECT 'range(l_discount,[0.0,0.08])',
               CAST(SUM(CASE WHEN l_discount IS NULL
                              OR l_discount < 0.0
                              OR l_discount > 0.08
                             THEN 1 ELSE 0 END) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'accepted_values(l_returnflag)',
               CAST(SUM(CASE WHEN l_returnflag IS NULL
                              OR l_returnflag NOT IN ('A', 'N')
                             THEN 1 ELSE 0 END) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'unique(l_orderkey,l_linenumber)',
               CAST(COUNT(*) -
                    COUNT(DISTINCT (l_orderkey, l_linenumber))
                    AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'foreign_key(l_orderkey)',
               CAST((SELECT COUNT(*)
                     FROM lineitem l
                     LEFT JOIN orders o
                       ON l.l_orderkey = o.o_orderkey
                     WHERE o.o_orderkey IS NULL) AS BIGINT)
        UNION ALL
        SELECT 'quantity_le_30',
               CAST(SUM(CASE WHEN l_quantity > 30 THEN 1 ELSE 0 END)
                    AS BIGINT)
        FROM lineitem
    )
    SELECT rule, n_violations,
           CAST(n_violations = 0 AS INT) AS passed
    FROM checks
    """,
)
def q_data_contract_report(spark, sf_dir):
    """Declarative data contracts over the ingest (operators/
    quality.check_constraints): six rules — null, range,
    accepted-values, composite-key uniqueness, referential integrity
    against orders, and a custom predicate — validated in one report.
    The four row-predicate rules fuse into a SINGLE scan (conditional
    sums in one agg); uniqueness adds one hash-aggregate and the
    foreign key one anti-join. The rule set is chosen so some rules
    PASS and some FAIL on the fixture (discounts above 0.08 and
    quantities above 30 exist; returnflag 'R' is deliberately
    excluded), proving violations are counted, not just asserted
    absent — every count hashes against the oracle's independent
    CASE-sum recomputation."""
    from funding_monitoring_spark.operators.quality import (
        accepted_values,
        check_constraints,
        foreign_key,
        in_range,
        not_null,
        predicate,
        unique,
    )

    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    rules = [
        not_null("l_orderkey"),
        in_range("l_discount", 0.0, 0.08),
        accepted_values("l_returnflag", ["A", "N"]),
        unique(["l_orderkey", "l_linenumber"]),
        foreign_key(["l_orderkey"], orders, ["o_orderkey"]),
        predicate("quantity_le_30", F.col("l_quantity") > 30),
    ]
    return check_constraints(lineitem, rules)


@query("avro_file_source", _FILE_SOURCE_ORACLE)
def q_avro_file_source(spark, sf_dir):
    """Avro Object Container File round trip WITHOUT the external
    spark-avro package (operators/avrocodec.py — pure zigzag-varint /
    IEEE / sync-marker framing; null/deflate/snappy codecs cycling by
    part file): each input partition writes one OCF part file
    (distributed write), the part paths parallelize back out, and each
    file decodes to rows in Arrow-batched mapInPandas (distributed
    read — OCF sync markers make real readers block-splittable;
    per-file parallelism is the honest local equivalent). The wire
    schema exercises the r12 widened profile: event_type travels as an
    Avro ENUM and (user_id, value) as a NESTED RECORD, flattened back
    on read — so the same three-aggregate oracle as every file source
    proves the nested container carries identical values to the
    parquet twin."""
    import os
    import tempfile
    from typing import Iterator

    import pandas as pd
    import pyspark.sql.types as T

    from funding_monitoring_spark.operators.multimodal import (
        register_module_by_value,
    )

    register_module_by_value(__name__)

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "value"
    )
    out_dir = tempfile.mkdtemp(prefix="fm_avro_src_")
    # real lake schemas nest: event_type rides as an Avro ENUM (the
    # fixture's closed symbol set) and (user_id, value) as a NESTED
    # RECORD — the wire shape r11's flat profile refused; the reader
    # flattens back, so the oracle is untouched
    schema_json = {
        "type": "record",
        "name": "event",
        "fields": [
            {"name": "event_id", "type": "long"},
            {
                "name": "event_type",
                "type": {
                    "type": "enum",
                    "name": "event_type_t",
                    "symbols": [
                        "click", "error", "purchase", "signup", "view"
                    ],
                },
            },
            {
                "name": "who",
                "type": {
                    "type": "record",
                    "name": "who_t",
                    "fields": [
                        {"name": "user_id", "type": "long"},
                        {"name": "value", "type": "double"},
                    ],
                },
            },
        ],
    }

    def write_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        from funding_monitoring_spark.operators.avrocodec import (
            encode_avro,
        )

        pid = TaskContext.get().partitionId()
        recs = []
        for pdf in batches:
            for r in pdf.to_dict("records"):
                recs.append(
                    {
                        "event_id": r["event_id"],
                        "event_type": r["event_type"],
                        "who": {
                            "user_id": r["user_id"],
                            "value": r["value"],
                        },
                    }
                )
        path = os.path.join(out_dir, f"part-{pid:05d}.avro")
        with open(path, "wb") as fh:
            fh.write(
                encode_avro(
                    schema_json, recs,
                    codec=("null", "deflate", "snappy")[pid % 3],
                )
            )
        yield pd.DataFrame({"path": [path], "n": [len(recs)]})

    manifest = events.mapInPandas(
        write_part, schema="path string, n long"
    ).collect()  # bounded: one row per partition (a file manifest)

    paths = spark.createDataFrame(
        [(r["path"],) for r in manifest], "path string"
    ).repartition(len(manifest) or 1)

    read_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )

    def read_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from funding_monitoring_spark.operators.avrocodec import (
            decode_avro,
        )

        for pdf in batches:
            for path in pdf["path"]:
                with open(path, "rb") as fh:
                    _, recs = decode_avro(fh.read())
                if recs:
                    yield pd.DataFrame(
                        {
                            "event_id": [r["event_id"] for r in recs],
                            "event_type": [
                                r["event_type"] for r in recs
                            ],
                            "user_id": [
                                r["who"]["user_id"] for r in recs
                            ],
                            "value": [r["who"]["value"] for r in recs],
                        }
                    )

    back = paths.mapInPandas(read_part, schema=read_schema)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("user_id").alias("sum_users"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("sum_value"),
    )


@query("arrow_ipc_file_source", _FILE_SOURCE_ORACLE)
def q_arrow_ipc_file_source(spark, sf_dir):
    """Arrow IPC (Feather v2) file SOURCE — the interchange format of
    the Arrow-native lake tool ecosystem (polars/pandas/duckdb dumps),
    which Spark cannot read natively: each input partition writes one
    .arrow file via pyarrow (dictionary-encoded event_type, the
    buffer-compression codec cycling uncompressed/zstd/lz4 by part),
    the file manifest parallelizes back out, and each file decodes in
    Arrow-batched mapInPandas — per-file parallelism, the honest
    local equivalent of a block-splittable read, same contract as
    avro_file_source. The reader decodes dictionaries back to plain
    strings; the shared three-aggregate oracle proves the container
    carries identical values to the parquet twin. Unlike the
    hand-rolled Avro/ORC paths this rides pyarrow on BOTH sides —
    the point is the distributed plumbing (partition-parallel write,
    manifest fan-out, Arrow-batch read), not a reimplementation of a
    library already guaranteed in this stack."""
    import os
    import tempfile
    from typing import Iterator

    import pandas as pd
    import pyspark.sql.types as T

    from funding_monitoring_spark.operators.multimodal import (
        register_module_by_value,
    )

    register_module_by_value(__name__)

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "value"
    )
    out_dir = tempfile.mkdtemp(prefix="fm_arrow_src_")

    def write_part(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        import pyarrow as pa
        import pyarrow.ipc as ipc

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        pdfs = [pdf for pdf in batches if len(pdf)]
        if pdfs:
            tbl = pa.Table.from_pandas(
                pd.concat(pdfs, ignore_index=True),
                preserve_index=False,
            )
            # dictionary-encode the categorical column — the wire
            # feature a naive column copy would miss
            idx = tbl.schema.get_field_index("event_type")
            tbl = tbl.set_column(
                idx,
                "event_type",
                tbl.column("event_type")
                .combine_chunks()
                .dictionary_encode(),
            )
            comp = (None, "zstd", "lz4")[pid % 3]
            path = os.path.join(out_dir, f"part-{pid:05d}.arrow")
            with ipc.new_file(
                path,
                tbl.schema,
                options=ipc.IpcWriteOptions(compression=comp),
            ) as w:
                w.write_table(tbl)
            yield pd.DataFrame(
                {"path": [path], "n": [tbl.num_rows]}
            )

    manifest = events.mapInPandas(
        write_part, schema="path string, n long"
    ).collect()  # bounded: one row per partition (a file manifest)

    paths = spark.createDataFrame(
        [(r["path"],) for r in manifest], "path string"
    ).repartition(len(manifest) or 1)

    read_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )

    def read_part(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        import pyarrow.ipc as ipc

        for pdf in batches:
            for path in pdf["path"]:
                tbl = ipc.open_file(path).read_all()
                out = tbl.to_pandas()
                # dictionary arrays come back as pandas Categorical;
                # the engine contract is plain strings
                out["event_type"] = out["event_type"].astype(str)
                yield out[
                    ["event_id", "event_type", "user_id", "value"]
                ]

    back = paths.mapInPandas(read_part, schema=read_schema)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("user_id").alias("sum_users"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("sum_value"),
    )
