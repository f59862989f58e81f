"""Distributed vector-column operations without Python UDFs.

Embedding columns (``array<float>``) need aggregate operations —
per-group centroids for IVF index builds (operators/similarity.py
seeds its cells this way conceptually), class prototypes, drift
monitoring. The UDF-free pattern: posexplode the vector to
(group, dim, value) rows, aggregate per (group, dim) — plain codegen'd
shuffle agg with map-side combine — then reassemble the array with an
order-preserving collect. At 100 TB the explode multiplies rows by the
dimension count but each row is 20 bytes and the partial aggregate
collapses them to |groups|·dims before the exchange, so the shuffle is
tiny regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROUND = 6


def centroids_long(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    round_digits: int = ROUND,
) -> DataFrame:
    """Per-group elementwise mean in long form: (group, dim, centroid).
    One shuffle on (group, dim); the pre-shuffle partial average
    collapses the exploded rows per partition."""
    exploded = df.select(
        F.col(group_col), F.posexplode(F.col(vec_col)).alias("dim", "val")
    )
    return exploded.groupBy(group_col, "dim").agg(
        F.round(F.avg("val"), round_digits).alias("centroid")
    )


def group_centroids(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    round_digits: int = ROUND,
) -> DataFrame:
    """Per-group centroid reassembled to an array column: collect
    (dim, centroid) structs per group and sort by dim — deterministic
    order without any assumption about shuffle arrival order."""
    long = centroids_long(df, group_col, vec_col, round_digits)
    return long.groupBy(group_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "centroid"))),
            lambda s: s["centroid"],
        ).alias("centroid")
    )


def quantize_int8_stats(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector int8 scalar quantization audit: absmax scale
    (scale = max|v| / 127), symmetric quantization q = ⌊v/scale + ½⌋,
    and the resulting L1 stats — the standard check before shipping a
    quantized embedding table.

    All higher-order column functions, zero shuffle, codegen'd with
    the scan. Rounding is ⌊x+½⌋ (identical algebra in the DuckDB
    oracle) rather than engine round(): Java rint half-evens while
    DuckDB rounds half-away — on a tie they'd diverge. The dequant
    error is a SEQUENTIAL fold over dimensions (same operand order in
    both engines → bit-identical before the output rounding).
    Zero vectors quantize to all-zero with scale 0 (guarded).
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    out = df.select(
        F.col(id_col),
        v.alias("__v"),
        (
            F.array_max(F.transform(v, lambda x: F.abs(x))) / 127.0
        ).alias("__scale"),
    )
    q = F.when(
        F.col("__scale") == 0.0,
        F.transform(F.col("__v"), lambda x: F.lit(0).cast("long")),
    ).otherwise(
        F.transform(
            F.col("__v"),
            lambda x: F.floor(x / F.col("__scale") + F.lit(0.5)),
        )
    )
    out = out.withColumn("__q", q)
    abs_err_sum = F.aggregate(
        F.zip_with(
            F.col("__v"),
            F.col("__q"),
            lambda a, b: F.abs(a - b * F.col("__scale")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return out.select(
        id_col,
        F.round(F.col("__scale"), 6).alias("scale"),
        F.aggregate(
            F.col("__q"), F.lit(0).cast("long"), lambda acc, x: acc + F.abs(x)
        ).alias("q_l1"),
        F.round(
            abs_err_sum / F.greatest(F.size("__v"), F.lit(1)), 6
        ).alias("mean_abs_err"),
    )


COV_SCHEMA = "i int, j int, sum_xy double, n long"


def embedding_covariance(
    df: DataFrame,
    vec_col: str = "embedding",
    round_digits: int = ROUND,
) -> DataFrame:
    """Population covariance matrix of the embedding column in long
    upper-triangular form: (i, j, cov) for i ≤ j — the preprocessing
    aggregate for PCA / whitening / drift detection over an embedding
    corpus.

    Scale shape — the matrix-accumulator version of map-side combine:
    a naive formulation self-joins the posexploded vector on the row
    id, shuffling dims·N rows twice; instead each Arrow batch computes
    ONE d×d partial outer-product (numpy einsum, vectorized over the
    whole batch) inside mapInPandas and emits d(d+1)/2 partial-sum
    rows, so the only shuffle carries partials·batches rows —
    independent of corpus size, exactly like a partial aggregate.
    Means come from the standard posexplode aggregate; the final
    combine is cov = E[xy] − E[x]E[y] over the tiny (i, j) frame.
    """
    import numpy as np
    import pandas as pd

    try:
        import sys as _sys

        from pyspark import cloudpickle as _cp

        _cp.register_pickle_by_value(_sys.modules[__name__])
    except Exception:
        pass

    def partial_outer(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            s = x.T @ x  # d×d sum of outer products over the batch
            iu, ju = np.triu_indices(s.shape[0])
            yield pd.DataFrame(
                {
                    "i": iu.astype(np.int32),
                    "j": ju.astype(np.int32),
                    "sum_xy": s[iu, ju],
                    "n": np.int64(len(pdf)),
                }
            )

    partials = df.select(vec_col).mapInPandas(partial_outer, COV_SCHEMA)
    exy = partials.groupBy("i", "j").agg(
        (F.sum("sum_xy") / F.sum("n")).alias("e_xy")
    )
    means = (
        df.select(F.posexplode(vec_col).alias("d", "x"))
        .groupBy("d")
        .agg(F.avg("x").alias("mu"))
    )
    mi = means.select(F.col("d").alias("i"), F.col("mu").alias("mu_i"))
    mj = means.select(F.col("d").alias("j"), F.col("mu").alias("mu_j"))
    return (
        exy.join(F.broadcast(mi), "i")
        .join(F.broadcast(mj), "j")
        .select(
            "i",
            "j",
            # + 0.0 canonicalizes IEEE negative zero: round(-1e-9, 6)
            # is -0.0, which stringifies differently across engines
            (
                F.round(
                    F.col("e_xy") - F.col("mu_i") * F.col("mu_j"),
                    round_digits,
                )
                + F.lit(0.0)
            ).alias("cov"),
        )
    )
