"""General OLAP surface beyond the reference: pivot/unpivot, CUBE with
grouping ids, set operations, approximate quantiles, and vector-column
aggregation. Everything except the (by-construction approximate)
quantile sketch is oracle-checked value-by-value.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from funding_monitoring_spark.operators.vectorops import centroids_long
from funding_monitoring_spark.registry import query
from funding_monitoring_spark.sources.tables import load_table

ORDER_STATUSES = ["F", "O", "P"]


@query(
    "pivot_status_by_priority",
    f"""
    SELECT o_orderpriority,
           {", ".join(
               f"CAST(SUM(CASE WHEN o_orderstatus = '{s}' THEN "
               f"CAST(o_totalprice AS DECIMAL(18,6)) END) AS DOUBLE) "
               f"AS status_{s.lower()}"
               for s in ORDER_STATUSES
           )}
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_pivot(spark, sf_dir):
    """Pivot: order status → columns. The value list is explicit, so
    Spark skips the extra distinct-values job and plans ONE shuffle
    (pivot_first partial aggregation map-side, same as any agg)."""
    o = load_table(spark, sf_dir, "orders")
    pivoted = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ORDER_STATUSES)
        # exact decimal sum -> double: order-independent at any SF
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double"))
    )
    renames = {s: f"status_{s.lower()}" for s in ORDER_STATUSES}
    return pivoted.withColumnsRenamed(renames)


@query(
    "unpivot_part_attrs",
    """
    SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val
    FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS attr, p_retailprice AS val
    FROM part
    """,
)
def q_unpivot(spark, sf_dir):
    """Unpivot/melt: wide numeric attributes → (key, attr, val) long
    form — a pure per-row expansion (Expand node), no shuffle at all."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey", F.col("p_size").cast("double"), "p_retailprice"
    ).unpivot(
        ids=["p_partkey"],
        values=["p_size", "p_retailprice"],
        variableColumnName="attr",
        valueColumnName="val",
    )


@query(
    "cube_revenue",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_cube(spark, sf_dir):
    """CUBE over two dimensions + grouping_id, with the fact table
    pre-aggregated at the FINEST granularity first: the Expand node
    multiplies its input by the grouping-set count, so feeding it the
    raw fact pushes |fact|·2^d rows through partial aggregation while
    feeding it the (l_returnflag, l_linestatus) aggregate pushes
    |groups|·2^d. Decimal sums and counts are associative (sum of
    per-group sums ≡ sum over rows, exactly — no FP order
    sensitivity), and CUBE over the pre-aggregate emits the identical
    cells and grouping ids: a raw NULL value still forms its own
    finest-granularity group and GROUPING() still separates it from
    the subtotal NULLs."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.groupBy("l_returnflag", "l_linestatus").agg(
        # exact decimal sum -> double (at the end): the global CUBE
        # cell sums the whole fact table, where 6-decimal double
        # rounding is past the significand at large SF
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,6)"
            )
        ).alias("rev_part"),
        F.count(F.lit(1)).alias("n_part"),
    )
    return (
        base.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.sum("rev_part").cast("double").alias("revenue"),
            F.sum("n_part").alias("n_items"),
        )
        .select(
            "l_returnflag", "l_linestatus", "gid", "revenue", "n_items"
        )
    )


@query(
    "set_intersect_nations",
    """
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    """,
)
def q_set_intersect(spark, sf_dir):
    """INTERSECT (distinct): nations with customers in both segments."""
    c = load_table(spark, sf_dir, "customer")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    auto = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_nationkey")
    return building.intersect(auto)


@query(
    "set_except_nations",
    """
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT c_nationkey FROM customer
    WHERE c_mktsegment = 'AUTOMOBILE' AND c_acctbal > 9000.0
    """,
)
def q_set_except(spark, sf_dir):
    """EXCEPT (set difference, distinct semantics — `subtract`, not
    `exceptAll`): nations with BUILDING customers but no high-balance
    AUTOMOBILE customer (the balance predicate keeps the difference
    non-empty at every fixture SF)."""
    c = load_table(spark, sf_dir, "customer")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    auto = c.filter(
        (F.col("c_mktsegment") == "AUTOMOBILE") & (F.col("c_acctbal") > 9000.0)
    ).select("c_nationkey")
    return building.subtract(auto)


@query(
    "approx_quantiles_events",
    """
    SELECT event_type,
           ROUND(quantile_cont(value, 0.25), 6) AS q25,
           ROUND(quantile_cont(value, 0.50), 6) AS q50,
           ROUND(quantile_cont(value, 0.75), 6) AS q75,
           ROUND(quantile_cont(value, 0.90), 6) AS q90,
           CAST(1 AS INT) AS ok25,
           CAST(1 AS INT) AS ok50,
           CAST(1 AS INT) AS ok75,
           CAST(1 AS INT) AS ok90
    FROM events GROUP BY event_type
    """,
)
def q_approx_quantiles(spark, sf_dir):
    """Approximate per-type quantiles via the Greenwald-Khanna sketch
    (percentile_approx) — mergeable partial sketches, so one shuffle of
    sketch state instead of a global sort. Emitted in deterministic
    within-bound form so the driver can hash-check it: the approximate
    value is engine-specific, but with accuracy=10000 its rank error is
    ≤ n/10000, far inside the ±0.01 rank window [q−ε, q+ε]; the flags
    assert exact_q(q−ε) ≤ approx(q) ≤ exact_q(q+ε) and the oracle's
    exact quantiles pin the hash (value-space twin of
    tests/test_extensions.py::test_approx_quantiles_within_sketch_bound)."""
    ev = load_table(spark, sf_dir, "events")
    qs = [0.25, 0.50, 0.75, 0.90]
    eps = 0.01
    agg = ev.groupBy("event_type").agg(
        F.percentile_approx("value", qs, 10_000).alias("apx"),
        F.percentile("value", F.array(*[F.lit(q) for q in qs])).alias("ex"),
        F.percentile(
            "value", F.array(*[F.lit(q - eps) for q in qs])
        ).alias("lo"),
        F.percentile(
            "value", F.array(*[F.lit(q + eps) for q in qs])
        ).alias("hi"),
    )
    cols = ["event_type"]
    labels = ["25", "50", "75", "90"]
    for i, lab in enumerate(labels):
        cols.append(F.round(F.col("ex")[i], 6).alias(f"q{lab}"))
    for i, lab in enumerate(labels):
        cols.append(
            (
                (F.col("apx")[i] >= F.col("lo")[i])
                & (F.col("apx")[i] <= F.col("hi")[i])
            )
            .cast("int")
            .alias(f"ok{lab}")
        )
    return agg.select(*cols)


@query(
    "embedding_centroids",
    """
    WITH dims AS (
        SELECT unnest(range(1,
            (SELECT len(embedding) FROM embeddings LIMIT 1) + 1)) AS i
    )
    SELECT label, CAST(i - 1 AS INT) AS dim,
           ROUND(AVG(list_extract(embedding, CAST(i AS INT))), 6) AS centroid
    FROM embeddings CROSS JOIN dims
    GROUP BY label, i
    """,
)
def q_embedding_centroids(spark, sf_dir):
    """Per-label embedding centroid, long form — the UDF-free vector
    aggregation pattern (posexplode → codegen'd shuffle agg with
    map-side combine; the exchange carries |labels|·dims rows however
    large the corpus is). Array reassembly lives in
    operators/vectorops.group_centroids."""
    emb = load_table(spark, sf_dir, "embeddings")
    return centroids_long(emb, "label", "embedding")


#: shared with the PCA power-iteration oracle
#: (suites/analytics_suite.py embedding_top_component)
EMBEDDING_COV_SQL = """
    WITH dims AS (
        SELECT unnest(range(1,
            (SELECT len(embedding) FROM embeddings LIMIT 1) + 1)) AS di
    ),
    pairs AS (
        SELECT a.di AS i1, b.di AS j1 FROM dims a JOIN dims b
        ON a.di <= b.di
    ),
    prods AS (
        SELECT CAST(p.i1 - 1 AS INT) AS i, CAST(p.j1 - 1 AS INT) AS j,
               AVG(CAST(list_extract(e.embedding, CAST(p.i1 AS INT))
                        AS DOUBLE)
                   * CAST(list_extract(e.embedding, CAST(p.j1 AS INT))
                          AS DOUBLE)) AS e_xy,
               AVG(CAST(list_extract(e.embedding, CAST(p.i1 AS INT))
                        AS DOUBLE)) AS mu_i,
               AVG(CAST(list_extract(e.embedding, CAST(p.j1 AS INT))
                        AS DOUBLE)) AS mu_j
        FROM embeddings e CROSS JOIN pairs p
        GROUP BY 1, 2
    )
    SELECT i, j, ROUND(e_xy - mu_i * mu_j, 6) + 0.0 AS cov FROM prods
    """


@query("embedding_covariance", EMBEDDING_COV_SQL)
def q_embedding_covariance(spark, sf_dir):
    """Corpus covariance matrix of the embedding column (upper
    triangle, long form) — the PCA/whitening/drift-detection
    preprocessing aggregate. The Spark side never materializes the
    d²·N cross terms the oracle computes: each Arrow batch folds into
    one d×d numpy outer-product partial inside mapInPandas and only
    d(d+1)/2 partial rows per batch shuffle
    (operators/vectorops.embedding_covariance)."""
    from funding_monitoring_spark.operators.vectorops import (
        embedding_covariance,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_covariance(emb)


_GROUPING_SETS_SQL = """
    SELECT l_returnflag, l_linestatus,
           CAST(2 * GROUPING(l_returnflag) + GROUPING(l_linestatus)
                AS BIGINT) AS gid,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                            (l_returnflag), ())
"""


@query("grouping_sets_revenue", _GROUPING_SETS_SQL)
def q_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (the general form CUBE/ROLLUP desugar
    to): three chosen granularities in one pass — completing the
    grouping-sets surface next to rollup_totals and cube_revenue.
    Like cube_revenue, the fact table is pre-aggregated at the finest
    granularity first so the Expand node multiplies |groups| rows by
    the set count instead of |fact| rows; decimal sums and counts
    re-aggregate exactly, and GROUPING SETS over the pre-aggregate
    yields identical cells and grouping flags (the finest set
    (l_returnflag, l_linestatus) is one of the requested sets, so
    every coarser set is a pure re-aggregation of it)."""
    pre = load_table(spark, sf_dir, "lineitem").groupBy(
        "l_returnflag", "l_linestatus"
    ).agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,6)"
            )
        ).alias("rev_part"),
        F.count(F.lit(1)).alias("n_part"),
    )
    # DataFrame groupingSets (ADVICE r13: the temp-view form leaked a
    # session-global catalog entry across the registry)
    gid = (
        2 * F.grouping("l_returnflag") + F.grouping("l_linestatus")
    ).cast("bigint")
    return (
        pre.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            gid.alias("gid"),
            F.sum("rev_part").cast("double").alias("revenue"),
            F.sum("n_part").alias("n_items"),
        )
        .select(
            "l_returnflag", "l_linestatus", "gid", "revenue", "n_items"
        )
    )


@query(
    "bloom_prefilter_join",
    """
    SELECT s.s_name,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_7'
    GROUP BY s.s_name
    """,
)
def q_bloom_prefilter_join(spark, sf_dir):
    """Runtime bloom join filter (operators/runtimefilter.py): revenue
    by German supplier, with the lineitem scan PRE-FILTERED against a
    bloom of the qualifying suppliers' keys before any exchange — the
    shuffle sees only rows that might join, which at 100 TB is the
    sliver-vs-table gap on every selective fact-dim join. The bloom
    predicate is pure scan-stage column algebra (literal word array +
    shiftright, whole-stage codegen — no UDF, no extra shuffle);
    false positives die in the real broadcast join, so the
    composition equals the plain join and the oracle IS the plain
    join. The decimal-exact revenue sum matches cube_revenue's
    convention; that the prefilter passes a strict subset of lineitem
    is asserted in tests/test_runtimefilter.py."""
    from funding_monitoring_spark.operators.runtimefilter import (
        bloom_mask_words,
        bloom_prefilter,
    )

    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    dim = (
        supplier.join(
            F.broadcast(nation.filter(F.col("n_name") == "NATION_7")),
            supplier["s_nationkey"] == nation["n_nationkey"],
        )
        .select("s_suppkey", "s_name")
        .localCheckpoint(eager=True)  # mask build + join probe reuse
    )
    words = bloom_mask_words(dim, F.col("s_suppkey"))
    pre = bloom_prefilter(
        li.select(
            "l_suppkey",
            (
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).cast("decimal(18,6)").alias("rev"),
        ),
        F.col("l_suppkey"),
        words,
    )
    return (
        pre.join(
            F.broadcast(dim),
            pre["l_suppkey"] == dim["s_suppkey"],
        )
        .groupBy("s_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("rev").cast("double").alias("revenue"),
        )
    )
