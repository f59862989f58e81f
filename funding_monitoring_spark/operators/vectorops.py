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
