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
   tiny partial frame on the key alone and combine. Plus the
   replicate-and-salt JOIN (`salted_join`) for when AQE is off or the
   dim side is too big to broadcast but cheap to replicate num_salts×.

Salts are DETERMINISTIC: ``pmod(xxhash64(tiebreak_cols), num_salts)``
over caller-named per-row columns, never ``rand()`` — a random salt is
correct for any single evaluation (each row lands in exactly one salt
bucket), but under speculative retry or stage recompute a recomputed
partition would re-salt its rows differently than the attempt that
already shipped partial results, and the same pipeline run twice would
not be byte-identical. Hash salting costs the same one expression and
is stable under repartition/retry/replay.

The second shuffle carries ``|keys| × num_salts`` rows regardless of
input size, so the cost of de-skewing is negligible. Results are
EXACTLY the plain groupBy/join result (modulo float summation order,
which the engine's oracle-checked queries round anyway) — equivalence
is asserted by the `salted_group_agg` / `salted_join_agg` oracle
queries and unit tests.
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


def _salt_col(tiebreak_cols: Sequence[str], num_salts: int) -> Column:
    """Deterministic salt in [0, num_salts): hash of the per-row
    tiebreak columns. pmod (not %) because xxhash64 is signed."""
    return F.pmod(
        F.xxhash64(*[F.col(c) for c in tiebreak_cols]), F.lit(num_salts)
    ).cast("int")


def salted_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    num_salts: int = 16,
    tiebreak_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Two-phase salted aggregation.

    aggs: {output_name: (fn, input_col)} with fn in sum|count|min|max.
    The salt spreads each key's rows across partitions for phase 1;
    phase 2 combines the ≤ num_salts partial rows per key (sum of
    partial counts, min of partial mins, ...).

    tiebreak_cols: per-row columns hashed into the deterministic salt
    (e.g. the table's primary key). They need not be unique — any
    spread-giving columns work; uniform hot-key fan-out just degrades
    with their cardinality. Defaults to all non-group columns.
    """
    for name, (fn, _) in aggs.items():
        if fn not in _COMBINERS:
            raise ValueError(f"{name}: non-decomposable aggregate {fn!r}")
    if tiebreak_cols is None:
        tiebreak_cols = [c for c in df.columns if c not in group_cols]
        if not tiebreak_cols:
            # every column is a group column (e.g. count of a group
            # col); hash the group columns rather than emit a zero-arg
            # xxhash64 (opaque WRONG_NUM_ARGS). Salting can't spread a
            # hot key here, but the result stays correct.
            tiebreak_cols = list(group_cols)
    if not tiebreak_cols:
        raise ValueError("tiebreak_cols must not be empty")
    phase1 = (
        df.withColumn("__salt", _salt_col(tiebreak_cols, num_salts))
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
    df: DataFrame,
    key_col: str,
    num_salts: int,
    tiebreak_cols: Sequence[str],
    out_col: str = "__salted_key",
) -> DataFrame:
    """Explicit salted join key for replicate-broadcast skew joins:
    the skewed fact side gets key||salt with the salt hashed from
    tiebreak_cols (stable under retry — see module docstring); the
    dim side is exploded num_salts× so every salted key finds its
    match (`replicate_dim`)."""
    return df.withColumn(
        out_col,
        F.concat_ws(
            "#",
            F.col(key_col),
            _salt_col(tiebreak_cols, num_salts),
        ),
    )


def replicate_dim(
    dim: DataFrame,
    key_col: str,
    num_salts: int,
    out_col: str = "__salted_key",
) -> DataFrame:
    """The dim half of the salted join: replicate every row once per
    salt value so each fact-side salted key finds its match. The dim
    grows num_salts× — use when it is too big to broadcast whole but
    small enough to replicate (the classic mid-size-dim window where
    skew hurts most)."""
    salts = F.array(*[F.lit(i) for i in range(num_salts)])
    return dim.withColumn("__salt", F.explode(salts)).withColumn(
        out_col, F.concat_ws("#", F.col(key_col), F.col("__salt"))
    ).drop("__salt")


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key_col: str,
    num_salts: int,
    tiebreak_cols: Sequence[str],
    dim_key_col: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: fact salted (deterministically), dim
    replicated, joined on the salted key. Row-for-row equal to
    ``fact.join(dim, fact[key_col] == dim[dim_key_col], how)`` for
    inner joins — each fact row carries exactly one salt and meets
    exactly the one dim replica with that salt. dim_key_col defaults
    to key_col (same-named keys on both sides)."""
    dim_key = dim_key_col or key_col
    f = with_salted_key(fact, key_col, num_salts, tiebreak_cols)
    d = replicate_dim(
        dim.withColumnRenamed(dim_key, "__dim_key"), "__dim_key", num_salts
    )
    # fact's key column survives; the dim twin + helper keys drop
    return (
        f.join(d, on="__salted_key", how=how)
        .drop("__salted_key", "__dim_key")
    )
