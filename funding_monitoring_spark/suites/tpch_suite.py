"""TPC-H-shaped analytical queries over the star-schema fixtures —
general OLAP capability beyond the reference's surface (scan-heavy
aggregation, selective multi-way joins with broadcast dims, grouped
top-k). ALL 22 query shapes of the family are covered: 16 literal,
6 adapted to the fixture schema (q2/q9/q11/q16/q20 re-anchor on
lineitem since there is no partsupp; q21 uses l_returnflag as the
failure signal — see the block comment at their definitions). All
revenue/price aggregates are rounded to 6 digits on both sides BEFORE
any ranking, so summation-order differences between Spark and DuckDB
can neither flip hashes nor reorder top-k.

Scale shape: q1 is a pure scan+partial-agg (one shuffle on a 6-value
key); q3 filters before joining and broadcasts the filtered customer
side; q5 is a star join where every dimension broadcasts and only the
fact tables shuffle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from funding_monitoring_spark.registry import query
from funding_monitoring_spark.operators.cachescope import (
    scoped_persist,
)
from funding_monitoring_spark.sources.tables import load_table

Q1_CUTOFF = "1999-01-01"
Q3_SEGMENT = "BUILDING"
Q3_DATE = "1998-01-01"
Q5_REGION = "ASIA"


@query(
    "tpch_q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 6) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
               AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                         AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
           ROUND(AVG(l_quantity), 6) AS avg_qty,
           ROUND(AVG(l_discount), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF} 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1(spark, sf_dir):
    """Q1 shape: predicate pushed to the scan, one shuffle on a
    6-value grouping key, everything else map-side partial agg.

    The money sums aggregate in DECIMAL(18,6): at large SF these sums
    reach 10^10 where a 6-decimal double rounding sits past double's
    significand, so summation order flips the last digit — decimal
    addition is exact and order-independent at any scale; the final
    cast to double is then derived from the same exact value in both
    engines (bit-identical)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit(f"{Q1_CUTOFF} 00:00:00").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))

    def dec_sum(c):
        return F.sum(c.cast("decimal(18,6)")).cast("double")

    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
        dec_sum(F.col("l_extendedprice")).alias("sum_base_price"),
        dec_sum(disc_price).alias("sum_disc_price"),
        dec_sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "tpch_q3_shipping_priority",
    f"""
    WITH rev AS (
        SELECT l.l_orderkey, o.o_orderdate,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 6)
                   AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = '{Q3_SEGMENT}'
          AND o.o_orderdate < TIMESTAMP '{Q3_DATE} 00:00:00'
          AND l.l_shipdate > TIMESTAMP '{Q3_DATE} 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate
    )
    SELECT l_orderkey, o_orderdate, revenue
    FROM rev
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def q_tpch_q3(spark, sf_dir):
    """Q3 shape: filter each side BEFORE the join; the filtered
    customer keys broadcast; global top-10 is TakeOrderedAndProject
    (per-partition heap + driver merge, no full sort)."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == Q3_SEGMENT
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(f"{Q3_DATE} 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(f"{Q3_DATE} 00:00:00").cast("timestamp")
    )
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c.select("c_custkey")), o.o_custkey == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue")
        )
    )
    return rev.orderBy(F.desc("revenue"), F.asc("l_orderkey")).limit(10)


@query(
    "tpch_q5_local_supplier_volume",
    f"""
    SELECT n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = '{Q5_REGION}'
    GROUP BY n.n_name
    """,
)
def q_tpch_q5(spark, sf_dir):
    """Q5 shape: star join — region/nation/customer/supplier broadcast
    (each far under the threshold), only orders⋈lineitem shuffles;
    local-supplier condition joins on two keys."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == Q5_REGION)
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dims = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "c_nationkey", "n_name")
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(dims), o.o_custkey == dims.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey)
            & (s.s_nationkey == F.col("c_nationkey")),
        )
    )
    return joined.groupBy("n_name").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
        ).alias("revenue")
    )


Q6_YEAR = "1997-01-01"
Q6_YEAR_END = "1998-01-01"
Q10_DATE = "1997-01-01"
Q10_DATE_END = "1997-04-01"
Q10_TOPK = 20


@query(
    "tpch_q6_forecast_revenue",
    f"""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 6) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{Q6_YEAR} 00:00:00'
      AND l_shipdate < TIMESTAMP '{Q6_YEAR_END} 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6(spark, sf_dir):
    """Q6 shape: scan-only global aggregate — every predicate (range,
    between, less-than) pushes to the parquet scan; no shuffle at all
    beyond the final single-row reduce."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit(f"{Q6_YEAR} 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(f"{Q6_YEAR_END} 00:00:00").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 6)
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "tpch_q10_returned_items",
    f"""
    SELECT c_custkey, c_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 6) AS revenue,
           ROUND(c_acctbal, 6) AS acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '{Q10_DATE} 00:00:00'
      AND o_orderdate < TIMESTAMP '{Q10_DATE_END} 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, acctbal, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT {Q10_TOPK}
    """,
)
def q_tpch_q10(spark, sf_dir):
    """Q10 shape: selective fact filters BEFORE the join, broadcast
    customer⋈nation dim, one shuffle on the grouping key, then a
    global top-k (TakeOrderedAndProject — per-partition heaps, no full
    sort). Revenue is rounded before ranking and c_custkey breaks
    ties, so the cross-engine top-20 is deterministic."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(f"{Q10_DATE} 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(f"{Q10_DATE_END} 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    dims = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_custkey", "c_name", F.round("c_acctbal", 6).alias("acctbal"),
        "n_name",
    )
    joined = li.join(o, li.l_orderkey == o.o_orderkey).join(
        F.broadcast(dims), o.o_custkey == dims.c_custkey
    )
    return (
        joined.groupBy("c_custkey", "c_name", "acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(Q10_TOPK)
    )


# ---------------------------------------------------------------------------
# Second wave: subquery / conditional-aggregation / complex-predicate shapes.
# The fixture lineitem has no commitdate/receiptdate/shipmode columns
# (FIXTURES.md §A), so q4/q12 are adapted to the available columns while
# keeping their canonical PLAN shapes (exists-semi-join; conditional CASE
# aggregation over a fact join).

Q4_DATE = "1997-01-01"
Q4_DATE_END = "1997-04-01"
Q12_DATE = "1997-01-01"
Q12_DATE_END = "1998-01-01"
Q14_DATE = "1997-09-01"
Q14_DATE_END = "1997-10-01"
Q18_QTY_THRESHOLD = 150
Q18_TOPK = 100


@query(
    "tpch_q4_order_priority",
    f"""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '{Q4_DATE} 00:00:00'
      AND o_orderdate < TIMESTAMP '{Q4_DATE_END} 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    """,
)
def q_tpch_q4(spark, sf_dir):
    """Q4 shape: EXISTS correlated subquery → LEFT SEMI join on the
    equi-key with the correlated inequality folded into the join
    condition — never a nested-loop probe. The date filter prunes
    orders before the semi join, so only the surviving quarter's keys
    shuffle."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(f"{Q4_DATE} 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(f"{Q4_DATE_END} 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "tpch_q12_priority_classes",
    f"""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '{Q12_DATE} 00:00:00'
      AND l_shipdate < TIMESTAMP '{Q12_DATE_END} 00:00:00'
    GROUP BY l_linestatus
    """,
)
def q_tpch_q12(spark, sf_dir):
    """Q12 shape: fact⋈fact equi-join with the selective predicate on
    the bigger side pushed to its scan, then conditional CASE counts —
    a single shuffle agg on a tiny key after the join."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(f"{Q12_DATE} 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(f"{Q12_DATE_END} 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "tpch_q14_promo_effect",
    f"""
    SELECT ROUND(
             100.00 * SUM(CASE WHEN p_type = 'PROMO'
                               THEN l_extendedprice * (1 - l_discount)
                               ELSE 0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '{Q14_DATE} 00:00:00'
      AND l_shipdate < TIMESTAMP '{Q14_DATE_END} 00:00:00'
    """,
)
def q_tpch_q14(spark, sf_dir):
    """Q14 shape: month-filtered fact broadcast-joined to the part dim
    (dim ≪ broadcast threshold — zero shuffle), conditional ratio in
    one global aggregate."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(f"{Q14_DATE} 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(f"{Q14_DATE_END} 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "tpch_q18_large_volume_customers",
    f"""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           ROUND(o_totalprice, 6) AS totalprice,
           ROUND(SUM(l_quantity), 6) AS sum_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > {Q18_QTY_THRESHOLD}
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, totalprice
    ORDER BY totalprice DESC, o_orderkey ASC
    LIMIT {Q18_TOPK}
    """,
)
def q_tpch_q18(spark, sf_dir):
    """Q18 shape: the IN-subquery becomes an aggregate producing the
    qualifying keyset, LEFT SEMI-joined back to the fact; the heavy
    groupBy(l_orderkey) agg reuses the same key as the semi join so AQE
    can coalesce; customers broadcast; final top-k is
    TakeOrderedAndProject."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > Q18_QTY_THRESHOLD)
        .select("l_orderkey")
    )
    li_big = li.join(big_orders, "l_orderkey", "left_semi")
    return (
        li_big.join(o, li_big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 6).alias("totalprice"),
        )
        .agg(F.round(F.sum("l_quantity"), 6).alias("sum_qty"))
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .limit(Q18_TOPK)
    )


@query(
    "tpch_q19_discounted_revenue",
    """
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 6) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q_tpch_q19(spark, sf_dir):
    """Q19 shape: OR-of-ANDs spanning both join sides. The
    single-table residues are pushed below the join (part keeps only
    the three brands, lineitem only the quantity union-range); the
    full tri-clause evaluates after the broadcast join. Catalyst
    derives those residues from the disjunction — asserted in
    tests/test_plans.py."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    clause = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(clause)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "tpch_q22_dormant_customers",
    """
    WITH avg_bal AS (
        SELECT AVG(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_mktsegment,
           COUNT(*) AS numcust,
           ROUND(SUM(c_acctbal), 6) AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > a
      AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    GROUP BY c_mktsegment
    """,
)
def q_tpch_q22(spark, sf_dir):
    """Q22 shape: scalar-subquery threshold (1-row aggregate, cross-
    broadcast into the filter) + NOT EXISTS → LEFT ANTI join against
    the recent-buyer keyset ("dormant" = no order in the final year of
    data, so the result is non-empty at every fixture SF). The anti
    join's build side is the date-filtered o_custkey column — both the
    predicate and the one-column projection reach the scan."""
    c = load_table(spark, sf_dir, "customer")
    o_keys = (
        load_table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate")
            >= F.lit("2000-01-01 00:00:00").cast("timestamp")
        )
        .select("o_custkey")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("a")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(o_keys, c.c_custkey == o_keys.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 6).alias("totacctbal"),
        )
    )


Q7_NATION_A = "NATION_9"
Q7_NATION_B = "NATION_11"


@query(
    "tpch_q7_nation_volume",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           ROUND(SUM(volume), 6) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = '{Q7_NATION_A}' AND n2.n_name = '{Q7_NATION_B}')
           OR (n1.n_name = '{Q7_NATION_B}' AND n2.n_name = '{Q7_NATION_A}')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q_tpch_q7(spark, sf_dir):
    """Q7 shape: bidirectional nation-pair volume — supplier and
    customer dimension chains both broadcast; the OR-of-nation-pairs
    predicate evaluates after both joins; per-year grouping via a
    codegen'd EXTRACT, one shuffle on the 3-part grouping key."""
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n_pair = n.filter(F.col("n_name").isin(Q7_NATION_A, Q7_NATION_B))
    supp = s.join(
        F.broadcast(n_pair.select(
            F.col("n_nationkey").alias("s_nk"),
            F.col("n_name").alias("supp_nation"),
        )),
        F.col("s_nationkey") == F.col("s_nk"),
    ).select("s_suppkey", "supp_nation")
    cust = c.join(
        F.broadcast(n_pair.select(
            F.col("n_nationkey").alias("c_nk"),
            F.col("n_name").alias("cust_nation"),
        )),
        F.col("c_nationkey") == F.col("c_nk"),
    ).select("c_custkey", "cust_nation")
    joined = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust), o.o_custkey == cust.c_custkey)
        .filter(
            ((F.col("supp_nation") == Q7_NATION_A)
             & (F.col("cust_nation") == Q7_NATION_B))
            | ((F.col("supp_nation") == Q7_NATION_B)
               & (F.col("cust_nation") == Q7_NATION_A))
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "volume"
            ),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 6).alias("revenue"))
    )


@query(
    "tpch_q13_customer_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT OUTER JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q_tpch_q13(spark, sf_dir):
    """Q13 shape: LEFT OUTER join with a join-side residual predicate
    (customers with no qualifying orders must still count as zero —
    an inner join would silently drop them), then a double grouping:
    per-customer counts, then the distribution of those counts."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


Q15_DATE = "1997-01-01"
Q15_DATE_END = "1997-04-01"


@query(
    "tpch_q15_top_supplier",
    f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 6)
                   AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '{Q15_DATE} 00:00:00'
          AND l_shipdate < TIMESTAMP '{Q15_DATE_END} 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q_tpch_q15(spark, sf_dir):
    """Q15 shape: a derived revenue view joined against its own MAX —
    the scalar subquery broadcasts a 1-row aggregate back over the
    view (revenue is computed once into a cached frame, not twice);
    pre-round to 6 digits so the max-equality comparison is
    deterministic across engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(f"{Q15_DATE} 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(f"{Q15_DATE_END} 00:00:00").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("total_revenue")
        )
        .transform(scoped_persist)
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    return (
        revenue.join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("m"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "tpch_q17_small_quantity_revenue",
    """
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 6) AS avg_yearly
    FROM lineitem l1
    JOIN part ON p_partkey = l1.l_partkey
    WHERE p_brand = 'Brand#12'
      AND l1.l_quantity < (
          SELECT 0.2 * AVG(l2.l_quantity)
          FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey
      )
    """,
)
def q_tpch_q17(spark, sf_dir):
    """Q17 shape: correlated per-part average → de-correlated into a
    grouped aggregate joined back on partkey (never a per-row
    subquery). The brand filter is applied to lineitem BEFORE the
    threshold aggregate: per-part averages are unchanged (the filter
    is a part attribute), but the threshold table shrinks from every
    part to the one brand's parts — at 100 TB the difference between
    a broadcastable threshold side and an impossible one. The brand
    fact subset persists: it feeds both the aggregate and the probe."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#12"
    ).select("p_partkey")
    li_brand = li.join(
        F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi"
    ).transform(scoped_persist)
    thresholds = li_brand.groupBy(
        F.col("l_partkey").alias("t_partkey")
    ).agg((F.avg("l_quantity") * 0.2).alias("qty_threshold"))
    return (
        li_brand.join(
            F.broadcast(thresholds), li_brand.l_partkey == F.col("t_partkey")
        )
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 6).alias("avg_yearly")
        )
    )


Q8_TYPE = "ECONOMY"
Q8_REGION = "AMERICA"
Q8_NATION = "NATION_1"
Q8_LO, Q8_HI = "1995-01-01", "1996-12-31"


@query(
    "tpch_q8_market_share",
    f"""
    WITH volumes AS (
        SELECT EXTRACT(year FROM o_orderdate) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               sn.n_name AS supp_nation
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation cn ON cn.n_nationkey = c_nationkey
        JOIN region ON r_regionkey = cn.n_regionkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation sn ON sn.n_nationkey = s_nationkey
        WHERE p_type = '{Q8_TYPE}'
          AND r_name = '{Q8_REGION}'
          AND o_orderdate BETWEEN TIMESTAMP '{Q8_LO} 00:00:00'
                              AND TIMESTAMP '{Q8_HI} 00:00:00'
    )
    SELECT o_year,
           ROUND(
             CAST(SUM(CASE WHEN supp_nation = '{Q8_NATION}'
                           THEN CAST(volume AS DECIMAL(18,6))
                           ELSE 0 END) AS DOUBLE)
             / CAST(SUM(CAST(volume AS DECIMAL(18,6))) AS DOUBLE),
           6) AS mkt_share
    FROM volumes
    GROUP BY o_year
    """,
)
def q_tpch_q8(spark, sf_dir):
    """Q8 (national market share): the share of one supplier nation in
    a region's market for one part type, per order year.

    Scale shape: the part-type filter lands first and BROADCASTS (the
    restricted part list is tiny), pruning lineitem at the scan join;
    customer/nation/region/supplier are broadcast dims; the only big
    shuffle is lineitem⋈orders on orderkey. Both volume sums aggregate
    in DECIMAL(18,6) (exact, order-independent) and only the final
    ratio becomes a rounded double — summation order cannot flip the
    hash at any SF."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == Q8_TYPE
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            f"{Q8_LO} 00:00:00", f"{Q8_HI} 00:00:00"
        )
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == Q8_REGION
    )
    supplier = load_table(spark, sf_dir, "supplier")

    cust_in_region = (
        customer.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    nation["n_regionkey"] == region["r_regionkey"],
                ).select("n_nationkey")
            ),
            customer["c_nationkey"] == F.col("n_nationkey"),
        ).select("c_custkey")
    )
    supp_nation = supplier.join(
        F.broadcast(nation),
        supplier["s_nationkey"] == nation["n_nationkey"],
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))

    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    volumes = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(
            F.broadcast(cust_in_region),
            orders["o_custkey"] == F.col("c_custkey"),
            "left_semi",
        )
        .join(
            F.broadcast(supp_nation),
            li["l_suppkey"] == F.col("s_suppkey"),
        )
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.cast("decimal(18,6)").alias("volume"),
            "supp_nation",
        )
    )
    return volumes.groupBy("o_year").agg(
        F.round(
            F.sum(
                F.when(
                    F.col("supp_nation") == Q8_NATION, F.col("volume")
                ).otherwise(F.lit(0).cast("decimal(18,6)"))
            ).cast("double")
            / F.sum("volume").cast("double"),
            6,
        ).alias("mkt_share")
    )


# ---------------------------------------------------------------------------
# The remaining 6 of the 22-query family. The fixture star schema has
# no partsupp table and lineitem carries no commit/receipt dates, so
# q2/q9/q11/q16/q20 re-anchor their part-supplier relation on lineitem
# and q21 uses l_returnflag='R' as the "failed the order" signal — each
# adaptation keeps the query's PLAN SHAPE (the thing being tested):
# argmin-per-group join (q2), multi-dim profit rollup (q9),
# global-aggregate threshold subquery (q11), distinct-agg after join
# (q16), scalar-subquery semi-join chain (q20), double-correlated
# exists/not-exists (q21).
# ---------------------------------------------------------------------------

Q2_SIZE_MOD = 10


@query(
    "tpch_q2_min_cost_supplier",
    f"""
    WITH unit AS (
        SELECT l_partkey, l_suppkey,
               l_extendedprice / l_quantity AS unit_price
        FROM lineitem WHERE l_quantity > 0
    ),
    mins AS (
        SELECT l_partkey, MIN(unit_price) AS min_unit
        FROM unit GROUP BY l_partkey
    ),
    best AS (
        SELECT DISTINCT u.l_partkey, u.l_suppkey, m.min_unit
        FROM unit u JOIN mins m
          ON u.l_partkey = m.l_partkey AND u.unit_price = m.min_unit
    )
    SELECT p.p_partkey, p.p_name, s.s_name, s.s_acctbal,
           ROUND(b.min_unit, 6) AS min_unit_price
    FROM best b
    JOIN part p ON p.p_partkey = b.l_partkey
    JOIN supplier s ON s.s_suppkey = b.l_suppkey
    WHERE p.p_size % {Q2_SIZE_MOD} = 0
    """,
)
def q_tpch_q2(spark, sf_dir):
    """Q2 shape (min-cost supplier): argmin-per-group via
    agg-then-equijoin back on (key, min) — the correlated-subquery
    pattern, kept tie-preserving like the real q2 (every supplier at
    the min survives). Adaptation: the part-supplier cost relation is
    lineitem unit price (fixture has no partsupp). The min-frame is
    |parts| rows → broadcastable; float equality on the join is safe
    because both sides carry the identical division result."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    unit = li.select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )
    mins = unit.groupBy("l_partkey").agg(F.min("unit_price").alias("min_unit"))
    best = (
        unit.join(mins, "l_partkey")
        .filter(F.col("unit_price") == F.col("min_unit"))
        .select("l_partkey", "l_suppkey", "min_unit")
        .distinct()
    )
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_size") % Q2_SIZE_MOD == 0
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        best.join(p, best["l_partkey"] == p["p_partkey"])
        .join(s, best["l_suppkey"] == s["s_suppkey"])
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "s_acctbal",
            F.round("min_unit", 6).alias("min_unit_price"),
        )
    )


@query(
    "tpch_q9_profit_by_nation_year",
    """
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         - 0.5 * p.p_retailprice * l.l_quantity
                         AS DECIMAL(18,6))) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
)
def q_tpch_q9(spark, sf_dir):
    """Q9 shape (product-type profit): the widest join in the family —
    fact ⋈ three broadcast dims ⋈ orders — with a derived-expression
    rollup by (nation, year). Adaptation: cost basis is
    0.5·p_retailprice·quantity (no ps_supplycost in the fixture); the
    name filter keeps q9's selective dim predicate. Profit sums in
    DECIMAL(18,6) for order-independent exactness (the q1 rule)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("red")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            F.sum(profit.cast("decimal(18,6)"))
            .cast("double")
            .alias("profit")
        )
    )


Q11_FRACTION = 0.0005


@query(
    "tpch_q11_important_parts",
    f"""
    WITH val AS (
        SELECT l_partkey,
               SUM(CAST(l_extendedprice * (1 - l_discount)
                        AS DECIMAL(18,6))) AS part_value
        FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT SUM(part_value) AS total_value FROM val)
    SELECT v.l_partkey AS p_partkey,
           CAST(v.part_value AS DOUBLE) AS part_value
    FROM val v CROSS JOIN tot t
    WHERE CAST(v.part_value AS DOUBLE)
          > {Q11_FRACTION} * CAST(t.total_value AS DOUBLE)
    """,
)
def q_tpch_q11(spark, sf_dir):
    """Q11 shape (important stock): per-key value filtered against a
    GLOBAL aggregate — the scalar-subquery threshold pattern, realized
    as a 1-row broadcast cross join (no second scan of the fact).
    Adaptation: value is lineitem discounted revenue per part (no
    partsupp). Values sum in decimal; the threshold comparison runs in
    double on identical inputs in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    value = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    val = li.groupBy("l_partkey").agg(F.sum(value).alias("part_value"))
    tot = val.agg(F.sum("part_value").alias("total_value"))
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(
            F.col("part_value").cast("double")
            > Q11_FRACTION * F.col("total_value").cast("double")
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("part_value").cast("double").alias("part_value"),
        )
    )


@query(
    "tpch_q16_supplier_variety",
    """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
    GROUP BY 1, 2, 3
    """,
)
def q_tpch_q16(spark, sf_dir):
    """Q16 shape (part/supplier variety): distinct-count aggregation
    after a dim join with NOT-predicates — Spark expands the distinct
    into a two-phase aggregate (partial on (group, suppkey), then
    count), so the fact never shuffles twice. Adaptation: the
    part-supplier relation is lineitem; the excluded-supplier
    subquery is dropped (no s_comment to filter on)."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_type") != "PROMO")
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q20_YEAR_START = "1997-01-01"
Q20_YEAR_END = "1998-01-01"


@query(
    "tpch_q20_excess_suppliers",
    f"""
    WITH qty AS (
        SELECT l_suppkey, ROUND(SUM(l_quantity), 6) AS total_qty
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE 'small%'
          AND l_shipdate >= TIMESTAMP '{Q20_YEAR_START} 00:00:00'
          AND l_shipdate <  TIMESTAMP '{Q20_YEAR_END} 00:00:00'
        GROUP BY l_suppkey
    ),
    thresh AS (SELECT 1.2 * AVG(total_qty) AS min_qty FROM qty)
    SELECT s.s_suppkey, s.s_name, q.total_qty
    FROM qty q
    JOIN supplier s ON s.s_suppkey = q.l_suppkey
    CROSS JOIN thresh t
    WHERE q.total_qty > t.min_qty
    """,
)
def q_tpch_q20(spark, sf_dir):
    """Q20 shape (suppliers with excess stock): a filtered fact
    aggregate gated by a scalar subquery OVER THAT AGGREGATE (1.2× the
    mean), then joined to the supplier dim — the nested-IN chain of the
    real q20 flattened into agg → broadcast-threshold → dim join.
    Adaptation: 'availability' is shipped quantity of small-prefixed
    parts in 1997 (no partsupp availqty)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (
            F.col("l_shipdate")
            >= F.lit(f"{Q20_YEAR_START} 00:00:00").cast("timestamp")
        )
        & (
            F.col("l_shipdate")
            < F.lit(f"{Q20_YEAR_END} 00:00:00").cast("timestamp")
        )
    )
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").startswith("small")
    )
    qty = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("l_suppkey")
        .agg(F.round(F.sum("l_quantity"), 6).alias("total_qty"))
    )
    thresh = qty.agg((1.2 * F.avg("total_qty")).alias("min_qty"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        qty.crossJoin(F.broadcast(thresh))
        .filter(F.col("total_qty") > F.col("min_qty"))
        .join(s, qty["l_suppkey"] == s["s_suppkey"])
        .select("s_suppkey", "s_name", "total_qty")
    )


@query(
    "tpch_q21_waiting_suppliers",
    """
    WITH rl AS (
        SELECT DISTINCT l_orderkey, l_suppkey
        FROM lineitem WHERE l_returnflag = 'R'
    ),
    al AS (
        SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM rl
    JOIN supplier s ON s.s_suppkey = rl.l_suppkey
    WHERE EXISTS (
            SELECT 1 FROM al
            WHERE al.l_orderkey = rl.l_orderkey
              AND al.l_suppkey <> rl.l_suppkey)
      AND NOT EXISTS (
            SELECT 1 FROM rl r2
            WHERE r2.l_orderkey = rl.l_orderkey
              AND r2.l_suppkey <> rl.l_suppkey)
    GROUP BY s.s_name
    """,
)
def q_tpch_q21(spark, sf_dir):
    """Q21 shape (suppliers who kept orders waiting): the
    double-correlated EXISTS / NOT EXISTS — per supplier, orders where
    it is the SOLE 'failed' participant among multiple suppliers —
    realized as per-order aggregation over distinct (order, supplier,
    failed) tuples instead of a semi+anti join pair: a (order,
    supplier) pair qualifies iff its order has ≥2 distinct suppliers
    (the EXISTS) and exactly 1 distinct failed supplier (the NOT
    EXISTS — any second failed supplier disqualifies every failed
    row, and the single survivor IS the failed one). One lineitem
    scan and two slim-key exchanges replace three scans, two distinct
    shuffles and the semi/anti pair — the oracle keeps the original
    correlated-subquery form, so the hash match is the equivalence
    proof. Adaptation: 'failed' is l_returnflag = 'R' (fixture
    lineitem has no commit/receipt dates)."""
    li = load_table(spark, sf_dir, "lineitem")
    pairs = (
        li.select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_returnflag") == "R").alias("failed"),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("failed").alias("failed"))
    )
    per_order = pairs.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_sup"),
        F.sum(F.col("failed").cast("int")).alias("n_failed"),
        F.max(F.when(F.col("failed"), F.col("l_suppkey"))).alias(
            "l_suppkey"
        ),
    )
    sole = per_order.filter(
        (F.col("n_sup") >= 2) & (F.col("n_failed") == 1)
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        sole.join(F.broadcast(s), sole["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
