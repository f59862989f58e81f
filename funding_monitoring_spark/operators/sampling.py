"""Deterministic key-hash sampling for training-data curation.

Random sampling (``df.sample``) is useless for a 100 TB curation
pipeline: re-runs must select the SAME rows (resumable jobs,
reproducible ablations, stable train/test membership), membership must
be decidable per-row with no coordination, and an auditor must be able
to re-derive the sample in another engine. So sampling here is a pure
function of the row key: a 31-bit LCG-style mix

    h(key, seed) = ((key mod M) * A + C + seed) mod M,   M = 2^31

with keep-if ``h < floor(fraction * M)``. Exact integer arithmetic →
bit-identical in Spark and DuckDB (the differential oracle checks the
actual sampled rows, not just counts). The reference has no sampling
surface (SURVEY.md §2 — none); this is a north-star extension.

Properties (tested in tests/test_sampling.py):
- deterministic: same (key, seed) → same decision, any run, any engine;
- nested: fraction f1 < f2 → sample(f1) ⊆ sample(f2) (thresholding);
- disjoint splits: train/test partition the keyspace exactly;
- scale: evaluates as a pushed-down scalar predicate on the scan —
  no shuffle, no state, embarrassingly parallel.

A and C are the classic glibc LCG multiplier/increment — public
constants, chosen for familiarity not cryptography; anyone who must
not be able to *predict* membership should mix a secret seed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SAMPLE_MOD = 2_147_483_648  # 2^31
SAMPLE_MUL = 1_103_515_245
SAMPLE_INC = 12_345
SAMPLE_SEED_PRIME = 1_000_003


def key_hash(key: Column, seed: int = 0) -> Column:
    """31-bit deterministic mix of an integral key column. The inner
    ``pmod`` bounds the multiplicand so the product stays far below
    2^63 — safe under ANSI overflow checking for any bigint key."""
    # seed is mixed in BEFORE the multiplier (key + seed·P, P prime) so
    # that adjacent seeds produce uncorrelated hashes — an additive
    # seed after the multiply would only rotate the hash space by one.
    bounded = F.pmod(
        key.cast("bigint") + F.lit(seed * SAMPLE_SEED_PRIME), F.lit(SAMPLE_MOD)
    )
    return F.pmod(
        bounded * F.lit(SAMPLE_MUL) + F.lit(SAMPLE_INC),
        F.lit(SAMPLE_MOD),
    )


def hash_threshold(fraction: float) -> int:
    """Keep-threshold for a fraction in [0, 1]."""
    return int(fraction * SAMPLE_MOD)


def hash_sample(
    df: DataFrame, key: str, fraction: float, seed: int = 0
) -> DataFrame:
    """Deterministic Bernoulli-style sample: keep rows whose key hash
    falls below fraction·2^31. Pure row-local predicate — Catalyst
    evaluates it in the scan stage, no shuffle."""
    return df.filter(key_hash(F.col(key), seed) < F.lit(hash_threshold(fraction)))


def stratified_sample(
    df: DataFrame,
    strata: str,
    key: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling rates (e.g. language
    rebalancing: keep 10% of English, 100% of low-resource languages).
    The per-stratum threshold is a CASE expression over the strata
    column — still a pure scan-stage predicate, no shuffle, no
    per-group state."""
    thr: Column = F.lit(hash_threshold(default_fraction))
    for value, fraction in sorted(fractions.items()):
        thr = (
            F.when(F.col(strata) == value, F.lit(hash_threshold(fraction)))
            .otherwise(thr)
        )
    return df.filter(key_hash(F.col(key), seed) < thr)


def train_test_split(
    df: DataFrame, key: str, train_fraction: float, seed: int = 0
) -> DataFrame:
    """Adds a ``split`` column ('train'/'test') — an exact partition of
    the keyspace: every row lands in exactly one side, stable across
    runs and engines. Downstream filters on ``split`` stay pushed
    down."""
    is_train = key_hash(F.col(key), seed) < F.lit(hash_threshold(train_fraction))
    return df.withColumn(
        "split", F.when(is_train, F.lit("train")).otherwise(F.lit("test"))
    )


def fixed_size_group_sample(
    df: DataFrame,
    group_col: str,
    key: str,
    k: int,
    seed: int = 0,
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Exactly-k-per-group uniform sample without replacement — the
    deterministic equivalent of per-group reservoir sampling.

    Ordering each group by ``key_hash(key, seed)`` and keeping the
    first k rows selects a uniform k-subset (any fixed hash order of
    i.i.d.-unrelated keys is a random permutation with respect to the
    payload), but unlike a reservoir it is a pure function of the
    keys: re-runs, retries, and other engines select the SAME rows.

    Plan shape: one shuffle on ``group_col`` + a bounded row_number —
    the same single-window pass as top-k. The hash, not the data,
    decides membership, so adding rows to a group only ever displaces
    the largest-hash members (nested-sample property per group).
    Groups smaller than k keep every row.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(
        key_hash(F.col(key), seed).asc(), F.col(key).asc()
    )
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def oracle_hash_expr(key_sql: str, seed: int = 0) -> str:
    """The DuckDB-side twin of key_hash — identical integer algebra,
    used by the differential oracles."""
    m, a, c = SAMPLE_MOD, SAMPLE_MUL, SAMPLE_INC
    shifted = f"(({key_sql}) + {seed * SAMPLE_SEED_PRIME})"
    return f"((({shifted} % {m} + {m}) % {m}) * {a} + {c}) % {m}"


def kfold_assign(
    df: DataFrame, key: str, k: int, seed: int = 0,
    fold_col: str = "fold",
) -> DataFrame:
    """Deterministic k-fold assignment: fold = key_hash(key) mod k —
    an exact partition of the keyspace, stable across runs, engines,
    and cluster sizes (pure scan-stage integer algebra, no shuffle,
    no randomness to seed-manage per executor). Cross-validation and
    sharded evaluation read fold i via a pushed-down filter; the same
    key always lands in the same fold, so folds never leak rows when
    the corpus grows."""
    return df.withColumn(
        fold_col,
        F.pmod(key_hash(F.col(key), seed), F.lit(k)).cast("int"),
    )


def weighted_priority_sample(
    df: DataFrame,
    group_col: str,
    key: str,
    weight_col: str,
    k: int,
    seed: int = 0,
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Deterministic weight-proportional sample: k rows per group by
    PRIORITY SAMPLING (Duffield, Lund & Thorup 2007) — priority
    q_i = w_i / u_i with u_i a deterministic uniform in (0, 1] derived
    from the key hash; keep the k largest priorities per group.
    Heavier rows win proportionally more often, every row keeps a
    nonzero chance, and — unlike A-ES exponential weighting — the
    priority needs NO transcendental function: two IEEE divisions over
    exact integers, so membership is bit-identical across engines,
    runs, and cluster sizes (the differential oracle checks the actual
    sampled rows). Ties (equal weight AND colliding 31-bit hash) break
    on the key, keeping the sample a pure function of the data.

    The ranking is one per-group window — the same single-shuffle
    shape as operators/topk.py; at 100 TB the group cardinality is the
    parallelism, and a skewed group can pre-reduce with a per-partition
    top-k before the window without changing the result (any local
    row below its partition's k-th priority can never enter the global
    top k)."""
    u = (key_hash(F.col(key), seed) + F.lit(1)).cast("double") / F.lit(
        float(SAMPLE_MOD)
    )
    pri = F.col(weight_col).cast("double") / u
    w = (
        Window.partitionBy(group_col)
        .orderBy(pri.desc(), F.col(key))
    )
    return (
        df.withColumn(rank_col, F.row_number().over(w).cast("long"))
        .filter(F.col(rank_col) <= k)
    )
