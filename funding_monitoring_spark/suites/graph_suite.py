"""Graph analytics over the TPC-H trading graph: fixed-iteration
PageRank on the symmetrized customer↔supplier co-trading graph
(customers and suppliers linked whenever an order's lineitem connects
them). The oracle unrolls the same power iterations in SQL, so every
rank value is hash-verified, not just rows-counted."""

from __future__ import annotations

from pyspark.sql import functions as F

from funding_monitoring_spark.operators.components import pagerank_fixed
from funding_monitoring_spark.registry import query
from funding_monitoring_spark.sources.tables import load_table

ITERATIONS = 3
DAMPING = 0.85
ROUND = 8  # rank magnitudes are ~1/N; 6 decimals would erase signal

#: distinct customer↔supplier trade pairs, prefixed into one id space
_SQL_PAIRS = """
    SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS c,
                    's' || CAST(l_suppkey AS VARCHAR) AS s
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
"""


def _iteration_sql(i: int) -> str:
    """One unrolled power iteration r{i} ← r{i-1} (twin of the loop
    body in operators/components.pagerank_fixed)."""
    return f"""
    r{i} AS (
        SELECT nd.node,
               ({1.0 - DAMPING} / an.n)
               + {DAMPING} * COALESCE(m.mass, 0) AS rank
        FROM nodes nd CROSS JOIN n an
        LEFT JOIN (
            SELECT e.dst AS node, SUM(r.rank / d.deg) AS mass
            FROM edges e
            JOIN r{i - 1} r ON r.node = e.src
            JOIN deg d ON d.src = e.src
            GROUP BY 1
        ) m USING (node)
    )"""


def _pagerank_oracle() -> str:
    iters = ",".join(_iteration_sql(i) for i in range(1, ITERATIONS + 1))
    return f"""
    WITH pairs AS ({_SQL_PAIRS}),
    edges AS (
        SELECT c AS src, s AS dst FROM pairs
        UNION ALL
        SELECT s AS src, c AS dst FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    n AS (SELECT COUNT(*) AS n FROM nodes),
    deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY 1),
    r0 AS (SELECT node, 1.0 / an.n AS rank FROM nodes CROSS JOIN n an),
    {iters}
    SELECT node, ROUND(rank, {ROUND}) AS rank FROM r{ITERATIONS}
    """


@query("pagerank_trading_graph", _pagerank_oracle())
def q_pagerank_trading_graph(spark, sf_dir):
    """3-iteration PageRank over the symmetrized customer↔supplier
    graph. Symmetrization guarantees no dangling nodes (the operator's
    contract); 3 fixed iterations keep the oracle an exact unroll."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    pairs = (
        orders.join(
            lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
        )
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias(
                "c"
            ),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias(
                "s"
            ),
        )
        .distinct()
    )
    # one-pass symmetrization: a self-union would evaluate the
    # orders⋈lineitem + distinct pair pipeline twice (no subplan
    # reuse in Catalyst); the explode emits both directions map-side
    edges = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("c").alias("src"), F.col("s").alias("dst")
                ),
                F.struct(
                    F.col("s").alias("src"), F.col("c").alias("dst")
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    # broadcast_ranks: the node universe is customers ∪ suppliers —
    # dimension-bounded at any corpus scale, so the per-iteration
    # rank vector broadcasts and the edge list never re-shuffles
    ranks = pagerank_fixed(
        edges, iterations=ITERATIONS, damping=DAMPING,
        broadcast_ranks=True,
    )
    return ranks.select("node", F.round("rank", ROUND).alias("rank"))


# -- k-core decomposition (operators/components.kcore_decomposition) -------

KCORE_K = 3
KCORE_MIN_WEIGHT = 3  #: edge = pair with >= 3 joint lineitems
#: oracle unroll depth: the sf0.01 cascade converges in 3 rounds
#: (probed); extra rounds delete nothing on either engine, so a
#: fixed generous unroll stays exact
KCORE_ORACLE_ROUNDS = 8

_KCORE_PAIRS_SQL = f"""
    SELECT 'c' || CAST(o_custkey AS VARCHAR) AS c,
           's' || CAST(l_suppkey AS VARCHAR) AS s
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY 1, 2 HAVING COUNT(*) >= {KCORE_MIN_WEIGHT}
"""


def _kcore_round_sql(i: int) -> str:
    """One synchronous peel round: keep an edge iff BOTH endpoints
    currently have degree >= k (twin of the loop body in
    operators/components.kcore_decomposition). MATERIALIZED: each
    alive{{i}} is referenced three times — default inlining would
    re-expand the chain exponentially in depth (the r10 BPE-oracle
    lesson)."""
    return f"""
    alive{i} AS MATERIALIZED (
        SELECT u, v FROM alive{i - 1}
        WHERE u IN (SELECT u FROM alive{i - 1}
                    GROUP BY u HAVING COUNT(*) >= {KCORE_K})
          AND v IN (SELECT u FROM alive{i - 1}
                    GROUP BY u HAVING COUNT(*) >= {KCORE_K})
    )"""


def _kcore_oracle() -> str:
    rounds = ",".join(
        _kcore_round_sql(i) for i in range(1, KCORE_ORACLE_ROUNDS + 1)
    )
    return f"""
    WITH pairs AS MATERIALIZED ({_KCORE_PAIRS_SQL}),
    alive0 AS MATERIALIZED (
        SELECT c AS u, s AS v FROM pairs
        UNION ALL
        SELECT s AS u, c AS v FROM pairs
    ),
    {rounds}
    SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS core_deg
    FROM alive{KCORE_ORACLE_ROUNDS}
    GROUP BY u
    """


@query("kcore_trading_graph", _kcore_oracle())
def q_kcore_trading_graph(spark, sf_dir):
    """The 3-core of the weight-thresholded trading graph (customers
    and suppliers linked by >= 3 joint lineitems): the standard
    dense-community / spam-structure filter — peripheral actors peel
    away in cascades (the sf0.01 fixture takes 3 synchronous rounds;
    weight filtering is what creates the cascade, the raw graph is
    uniformly dense). Spark iterates to the fixpoint (bounded by
    max_rounds); the oracle unrolls a fixed generous round count —
    identical by the no-op-past-convergence argument in the operator
    docstring. Only (node, node) pairs shuffle; degree aggregates and
    anti-joins per round."""
    from funding_monitoring_spark.operators.components import (
        kcore_decomposition,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    pairs = (
        orders.join(
            lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
        )
        .groupBy(
            F.concat(
                F.lit("c"), F.col("o_custkey").cast("string")
            ).alias("c"),
            F.concat(
                F.lit("s"), F.col("l_suppkey").cast("string")
            ).alias("s"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= KCORE_MIN_WEIGHT)
    )
    return kcore_decomposition(pairs, KCORE_K, src="c", dst="s")
