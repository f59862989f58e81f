"""Skew-handling primitives for hot keys (SURVEY.md §7 Phase 4 scale
notes: "salted keys for skewed symbols").

At 100 TB a handful of hot symbols (or hot dedup buckets) can
concentrate a shuffle partition onto one executor. Two mitigations:

1. AQE skew-join splitting — on by default in the session factory
   (`spark.sql.adaptive.skewJoin.enabled`), handles skewed JOINS with
   no code change.
2. Salted two-phase aggregation (this module) — for skewed GROUP BYs
   whose aggregates decompose (sum/count/min/max/avg-as-sum+count):
   shuffle once on (key, salt) spreading each hot key over
   `num_salts` partitions, partially aggregate, then shuffle the
   tiny partial frame on the key alone and combine.

The second shuffle carries ``|keys| × num_salts`` rows regardless of
input size, so the cost of de-skewing is negligible. Results are
EXACTLY the plain groupBy result (modulo float summation order, which
the engine's oracle-checked queries round anyway) — equivalence is
asserted by the `salted_group_agg` oracle query and unit tests.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (spark_agg, combine_agg) per supported decomposable aggregate
_COMBINERS = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    aggs: {output_name: (fn, input_col)} with fn in sum|count|min|max.
    A random salt in [0, num_salts) spreads each key's rows across
    partitions for phase 1; phase 2 combines the ≤ num_salts partial
    rows per key (sum of partial counts, min of partial mins, ...).
    """
    for name, (fn, _) in aggs.items():
        if fn not in _COMBINERS:
            raise ValueError(f"{name}: non-decomposable aggregate {fn!r}")

    salt = (F.rand(seed=42) * num_salts).cast("int").alias("__salt")
    phase1 = (
        df.withColumn("__salt", salt)
        .groupBy(*group_cols, "__salt")
        .agg(
            *[
                _COMBINERS[fn][0](F.col(col)).alias(f"__p_{name}")
                for name, (fn, col) in aggs.items()
            ]
        )
    )
    return phase1.groupBy(*group_cols).agg(
        *[
            _COMBINERS[fn][1](F.col(f"__p_{name}")).alias(name)
            for name, (fn, _) in aggs.items()
        ]
    )


def with_salted_key(
    df: DataFrame, key_col: str, num_salts: int, out_col: str = "__salted_key"
) -> DataFrame:
    """Explicit salted join key for replicate-broadcast skew joins:
    the skewed fact side gets key||salt; the dim side is exploded
    num_salts× so every salted key finds its match. Returns the fact
    side with the salted key appended (dim-side explode is a one-liner:
    ``dim.withColumn('__salt', F.explode(F.array(*[F.lit(i) ...])))``).
    """
    return df.withColumn(
        out_col,
        F.concat_ws(
            "#",
            F.col(key_col),
            (F.rand(seed=42) * num_salts).cast("int"),
        ),
    )
