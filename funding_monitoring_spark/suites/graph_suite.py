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
    edges = pairs.selectExpr("c AS src", "s AS dst").union(
        pairs.selectExpr("s AS src", "c AS dst")
    )
    ranks = pagerank_fixed(
        edges, iterations=ITERATIONS, damping=DAMPING
    )
    return ranks.select("node", F.round("rank", ROUND).alias("rank"))
