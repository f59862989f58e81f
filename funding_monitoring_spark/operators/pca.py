"""Distributed power-iteration PCA: the corpus's top principal
component from the covariance long-form table.

PCA preprocessing for an embedding corpus splits into two regimes:
the COVARIANCE is the data-scale aggregate (operators/vectorops.py —
one d×d outer-product partial per Arrow batch, the only part that
touches the 100 TB), and the eigensolve runs on the d² covariance
entries. This module keeps even the eigensolve distributed and
declarative — the matrix stays a (i, j, cov) DataFrame and each power
iteration

    w = C v        (equi-join on j + groupBy i — matrix·vector)
    v = w / ‖w‖    (1-row broadcast norm)

is joins and aggregates, unrollable verbatim in SQL for the
differential oracle. For d = 64 that is overkill on purpose: the SAME
plan is the one you'd run when "the matrix" is a web-graph or a
feature co-occurrence with d in the millions, where collect-and-numpy
stops being an option.

Engine determinism: the covariance input is the round-6 table both
engines agree on; each iteration re-rounds the vector (sum order
differs across engines at ~1e-15), v₀ is the exact constant
1/√d-free all-ones vector, and the sign is therefore fixed by
construction (no eigenvector sign ambiguity)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: per-iteration vector rounding — coarse enough that cross-engine
#: summation-order noise (~1e-15) never reaches a half-boundary,
#: fine enough that 4 iterations converge identically
VEC_ROUND = 8


def symmetrize(cov_upper: DataFrame) -> DataFrame:
    """(i ≤ j) upper triangle → full symmetric (i, j, cov)."""
    lower = cov_upper.filter(F.col("i") != F.col("j")).select(
        F.col("j").alias("i"), F.col("i").alias("j"), "cov"
    )
    return cov_upper.unionAll(lower)


def top_component(
    spark: SparkSession,
    cov_upper: DataFrame,
    n_iter: int = 4,
) -> DataFrame:
    """``n_iter`` power iterations on the (upper-triangular) covariance
    table; returns (dim, loading, eigenvalue) — the principal
    direction estimate and its ‖Cv‖ eigenvalue estimate. Convergence
    rate is (λ₂/λ₁)ᵏ: structured data converges in a handful of
    iterations, a flat spectrum needs more — the differential oracle
    checks the ALGEBRA exactly at any k (tests assert the monotone
    Rayleigh climb separately).

    Fully declarative: the vector is a d-row DataFrame, each iteration
    one join + one aggregate + one broadcast norm; intermediates are
    checkpointed (tiny) so iteration k never re-derives 1..k-1."""
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    cov = symmetrize(cov_upper).localCheckpoint(eager=True)
    v = (
        cov.select(F.col("i").alias("dim"))
        .distinct()
        .withColumn("x", F.lit(1.0))
        .localCheckpoint(eager=True)
    )
    eig = None
    for _ in range(n_iter):
        w = (
            cov.join(v, cov["j"] == v["dim"])
            .groupBy(F.col("i").alias("dim"))
            .agg(
                F.round(F.sum(F.col("cov") * F.col("x")), VEC_ROUND)
                .alias("w")
            )
        )
        norm = w.agg(
            F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
        )
        v = (
            w.crossJoin(F.broadcast(norm))
            .select(
                "dim",
                F.round(F.col("w") / F.col("nrm"), VEC_ROUND).alias("x"),
            )
            .localCheckpoint(eager=True)
        )
        eig = norm
    return v.crossJoin(F.broadcast(eig)).select(
        "dim",
        F.col("x").alias("loading"),
        F.round(F.col("nrm"), VEC_ROUND).alias("eigenvalue"),
    )


def oracle_top_component_sql(cov_cte: str, n_iter: int = 4) -> str:
    """DuckDB twin: unroll the same iterations over ``cov_cte`` (a CTE
    body yielding the upper-triangular (i, j, cov))."""
    r = VEC_ROUND
    ctes = [
        f"cov_u AS ({cov_cte})",
        """cov_f AS (
        SELECT i, j, cov FROM cov_u
        UNION ALL
        SELECT j AS i, i AS j, cov FROM cov_u WHERE i <> j
    )""",
        "v0 AS (SELECT DISTINCT i AS dim, 1.0 AS x FROM cov_f)",
    ]
    for k in range(1, n_iter + 1):
        p = k - 1
        ctes.append(f"""w{k} AS (
        SELECT c.i AS dim,
               ROUND(SUM(c.cov * v.x), {r}) AS w
        FROM cov_f c JOIN v{p} v ON v.dim = c.j
        GROUP BY c.i
    )""")
        ctes.append(
            f"n{k} AS (SELECT sqrt(SUM(w * w)) AS nrm FROM w{k})"
        )
        ctes.append(f"""v{k} AS (
        SELECT dim, ROUND(w / (SELECT nrm FROM n{k}), {r}) AS x
        FROM w{k}
    )""")
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT dim, x AS loading,
           ROUND((SELECT nrm FROM n{n_iter}), {r}) AS eigenvalue
    FROM v{n_iter}"""
    )
