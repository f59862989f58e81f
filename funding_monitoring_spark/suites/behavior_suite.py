"""Event-feed queries (round-2 extensions): CDC log compaction,
behavioral transition matrix, and robust (winsorized) statistics.
The events fixture doubles as a change feed: user_id is the key,
(ts, event_id) the change order, and event_type 'error' a tombstone.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from funding_monitoring_spark.operators.upsert import cdc_materialize
from funding_monitoring_spark.registry import query
from funding_monitoring_spark.sources.tables import load_table


#: shared by the batch query and its streaming twin
#: (suites/streaming_suite.py stream_cdc_materialize) — the streaming
#: store must converge to exactly this batch compaction
CDC_ORACLE_SQL = """
    WITH ranked AS (
        SELECT user_id, value, ts, event_type,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS n_changes
        FROM events
    )
    SELECT user_id, value AS current_value, ts AS updated_at, n_changes
    FROM ranked WHERE rn = 1 AND event_type <> 'error'
    """


@query("cdc_materialize", CDC_ORACLE_SQL)
def q_cdc_materialize(spark, sf_dir):
    """Compact the event change feed to current state: last change per
    user_id wins (ordered by ts, event_id); a trailing 'error' event is
    a tombstone that deletes the key. Spark side is ONE max_by
    aggregation (map-side combinable — no window, no sort of the full
    log); the oracle states the same semantics as window SQL."""
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "value", "ts", "event_type", "event_id"
    )
    latest = cdc_materialize(
        events,
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
        delete_pred=F.col("event_type") == "error",
    )
    return latest.select(
        "user_id",
        F.col("value").alias("current_value"),
        F.col("ts").alias("updated_at"),
        "n_changes",
    )


@query(
    "event_transition_matrix",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events
    ),
    pairs AS (
        SELECT prev_type AS from_type, event_type AS to_type,
               COUNT(*) AS n
        FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT from_type, to_type, n,
           ROUND(n / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE),
                 6) AS p
    FROM pairs
    """,
)
def q_event_transition_matrix(spark, sf_dir):
    """First-order behavioral Markov matrix: consecutive event-type
    pairs per user (lag over the per-user timeline), counted corpus-
    wide with within-source-state probabilities. The lag window
    partitions by user_id — shuffle keyed by user, no global sort; the
    probability window runs over the tiny aggregated matrix."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            "user_id",
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count("*").alias("n"))
    )
    wf = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wf), 6).alias("p"),
    )


@query(
    "winsorized_stats",
    """
    WITH q AS (
        SELECT event_type,
               COUNT(*) AS n_events,
               quantile_cont(value, 0.05) AS lo,
               quantile_cont(value, 0.95) AS hi
        FROM events GROUP BY 1
    )
    SELECT e.event_type,
           ANY_VALUE(n_events) AS n_events,
           ROUND(ANY_VALUE(lo), 6) AS p05,
           ROUND(ANY_VALUE(hi), 6) AS p95,
           ROUND(AVG(GREATEST(lo, LEAST(hi, e.value))), 6)
               AS winsorized_mean
    FROM events e JOIN q USING (event_type)
    GROUP BY 1
    """,
)
def q_winsorized_stats(spark, sf_dir):
    """Outlier-robust per-type statistics: exact continuous p05/p95
    (Spark `percentile` and DuckDB `quantile_cont` share the linear-
    interpolation definition), then the winsorized mean with values
    clamped into [p05, p95]. Two passes; the quantile frame (one row
    per event_type) broadcasts back onto the fact scan. At 100 TB the
    exact percentile becomes approx_percentile — same plan shape,
    bounded state."""
    events = load_table(spark, sf_dir, "events")
    q = events.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.percentile("value", F.lit(0.05)).alias("lo"),
        F.percentile("value", F.lit(0.95)).alias("hi"),
    )
    joined = events.join(F.broadcast(q), on="event_type")
    clamped = F.greatest(
        F.col("lo"), F.least(F.col("hi"), F.col("value"))
    )
    return joined.groupBy("event_type").agg(
        F.any_value("n_events").alias("n_events"),
        F.round(F.any_value("lo"), 6).alias("p05"),
        F.round(F.any_value("hi"), 6).alias("p95"),
        F.round(F.avg(clamped), 6).alias("winsorized_mean"),
    )


@query(
    "expectation_audit",
    """
    WITH o AS (
        SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) AS pk_dup,
               COUNT(*) FILTER (WHERE o_custkey IS NULL) AS null_cust,
               COUNT(*) FILTER (WHERE o_totalprice <= 0) AS nonpos_price
        FROM orders
    ),
    l AS (
        SELECT COUNT(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50)
                   AS qty_range,
               COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber))
                   AS line_pk_dup
        FROM lineitem
    ),
    fk AS (
        SELECT COUNT(*) AS orphan_orders
        FROM orders LEFT JOIN customer ON c_custkey = o_custkey
        WHERE c_custkey IS NULL
    )
    SELECT chk AS check_name, CAST(v AS BIGINT) AS n_violations,
           CAST(v = 0 AS INT) AS passed
    FROM (
        SELECT 'orders_pk_unique' AS chk, pk_dup AS v FROM o
        UNION ALL SELECT 'orders_custkey_not_null', null_cust FROM o
        UNION ALL SELECT 'orders_totalprice_positive', nonpos_price FROM o
        UNION ALL SELECT 'lineitem_quantity_in_range', qty_range FROM l
        UNION ALL SELECT 'lineitem_pk_unique', line_pk_dup FROM l
        UNION ALL SELECT 'orders_custkey_fk', orphan_orders FROM fk
    )
    """,
)
def q_expectation_audit(spark, sf_dir):
    """Deequ-style data-quality audit: PK uniqueness, null checks,
    range constraints, and referential integrity in ONE report frame.
    Each base table is scanned once (conditional aggregates share the
    pass); the FK check is a broadcast anti join on the dimension.
    At 100 TB this is the pre-ingest gate run per partition-batch —
    every check is a map-side-combinable aggregate, no row-level
    output, so the report costs one scan per table regardless of
    violation count."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")

    # the FK orphan check shares the orders scan (guide §2.4): the
    # old shape ran a second broadcast anti-join pass over orders; a
    # broadcast LEFT join against the (unique-keyed) dimension is
    # row-preserving, so the orphan count is one more conditional
    # aggregate in the same pass
    o = orders.join(
        F.broadcast(
            customer.select(F.col("c_custkey").alias("__ck"))
        ),
        orders["o_custkey"] == F.col("__ck"),
        "left",
    ).agg(
        (F.count("*") - F.countDistinct("o_orderkey")).alias("pk_dup"),
        F.sum(F.col("o_custkey").isNull().cast("long")).alias("null_cust"),
        F.sum((F.col("o_totalprice") <= 0).cast("long")).alias(
            "nonpos_price"
        ),
        F.sum(F.col("__ck").isNull().cast("long")).alias(
            "orphan_orders"
        ),
    )
    li = lineitem.agg(
        F.sum(
            ((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).cast(
                "long"
            )
        ).alias("qty_range"),
        (
            F.count("*")
            - F.countDistinct("l_orderkey", "l_linenumber")
        ).alias("line_pk_dup"),
    )
    def report(frame, pairs):
        exprs = ", ".join(
            f"'{name}', CAST({col} AS BIGINT)" for name, col in pairs
        )
        n = len(pairs)
        return frame.selectExpr(
            f"stack({n}, {exprs}) AS (check_name, n_violations)"
        )

    # all four orders checks stack out of the ONE aggregate row (a
    # second report(o, ...) branch would re-evaluate the scan); the
    # report is row-order-insensitive (the driver sorts), so the fk
    # row moving into the orders block changes nothing
    out = report(
        o,
        [
            ("orders_pk_unique", "pk_dup"),
            ("orders_custkey_not_null", "null_cust"),
            ("orders_totalprice_positive", "nonpos_price"),
            ("orders_custkey_fk", "orphan_orders"),
        ],
    ).unionByName(
        report(
            li,
            [
                ("lineitem_quantity_in_range", "qty_range"),
                ("lineitem_pk_unique", "line_pk_dup"),
            ],
        )
    )
    return out.withColumn(
        "passed", (F.col("n_violations") == 0).cast("int")
    )
