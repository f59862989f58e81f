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
