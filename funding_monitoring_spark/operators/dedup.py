"""Document deduplication family (north-star extension): exact,
MinHash+LSH, SimHash, n-gram Jaccard. Embedding-cosine near-dup lives
in operators/similarity.py.

All signature computation is per-row projection with higher-order
array functions — JVM-side, no shuffle, no UDFs. The only shuffles are
the LSH band joins (equi-joins on band keys), which is the point of
LSH: at 100 TB you never compare all pairs; you shuffle each document
to its O(bands) bucket keys and compare only within buckets. Every
step (tokenize → shingle → polynomial fingerprint → affine min-hash →
band → verify Jaccard) is reproducible in ANSI SQL, so even the
probabilistic pipeline is oracle-checkable exactly.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from funding_monitoring_spark.operators.textstats import (
    POLY_INIT,
    POLY_MOD,
    POLY_MULT,
    tokens,
)

SHINGLE_N = 3
MINHASH_K = 12
MINHASH_BANDS = 4
MINHASH_ROWS = MINHASH_K // MINHASH_BANDS  # 3 rows per band

#: fixed affine minhash params (a, b): h_j(x) = (a_j * x + b_j) mod P
MINHASH_PARAMS: list[tuple[int, int]] = [
    (int(a), int(b))
    for a, b in np.random.RandomState(11).randint(
        1, POLY_MOD, size=(MINHASH_K, 2)
    )
]

SIMHASH_BITS = 32
SIMHASH_BAND_BITS = 8
SIMHASH_BANDS = SIMHASH_BITS // SIMHASH_BAND_BITS


def poly_hash_of(s: Column) -> Column:
    """Polynomial codepoint hash of an arbitrary string expression
    (same recurrence as textstats.poly_fingerprint)."""
    codes = F.transform(F.split(s, ""), lambda ch: F.ascii(ch).cast("long"))
    return F.aggregate(
        codes,
        F.lit(POLY_INIT).cast("long"),
        lambda acc, x: (acc * POLY_MULT + x) % POLY_MOD,
    )


def token_shingles(col: Column | str, n: int = SHINGLE_N) -> Column:
    """Distinct n-token shingles; a document shorter than n tokens
    contributes its whole token string as a single shingle."""
    toks = tokens(col)
    windows = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(windows)).otherwise(
        F.array(F.concat_ws(" ", toks))
    )


def shingle_fingerprints(col: Column | str, n: int = SHINGLE_N) -> Column:
    """Distinct numeric shingle set: poly-hash each shingle."""
    return F.array_distinct(
        F.transform(token_shingles(col, n), lambda s: poly_hash_of(s))
    )


def minhash_signature(fps: Column) -> Column:
    """MinHash signature: per hash function j, min over the shingle set
    of (a_j * fp + b_j) mod P. Returns an array of MINHASH_K longs."""
    def affine(a: int, b: int):
        # single-arg lambda: F.transform dispatches on lambda arity
        return lambda f: (f * a + b) % POLY_MOD

    sigs = [
        F.array_min(F.transform(fps, affine(a, b))) for a, b in MINHASH_PARAMS
    ]
    return F.array(*sigs)


def minhash_band_keys(sig: Column) -> Column:
    """LSH band keys: signature split into MINHASH_BANDS rows-per-band
    groups, each serialized as 'band:v1:v2:v3'."""
    keys = []
    for b in range(MINHASH_BANDS):
        parts = [F.lit(str(b))] + [
            sig[b * MINHASH_ROWS + r].cast("string")
            for r in range(MINHASH_ROWS)
        ]
        keys.append(F.concat_ws(":", *parts))
    return F.array(*keys)


def jaccard(a: Column, b: Column) -> Column:
    """Set Jaccard over (already-distinct) arrays."""
    return F.size(F.array_intersect(a, b)) / F.size(F.array_union(a, b))


def exact_dedup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup: hash-groupBy on md5(text); canonical row = min id.
    One shuffle on the 128-bit digest (not the full text — at 100 TB
    you never shuffle document bodies to dedup them)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.min(F.col(id_col)).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    round_digits: int = 6,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs, verified with true Jaccard.

    shingle → fingerprint → signature → explode band keys →
    self-equi-join on band key → distinct candidate pair →
    exact Jaccard on the shingle sets → threshold filter.
    """
    sigs = df.select(
        F.col(id_col).alias("id"),
        shingle_fingerprints(text_col).alias("fps"),
    ).withColumn("band_key", F.explode(minhash_band_keys(minhash_signature(F.col("fps")))))

    left = sigs.select(
        F.col("id").alias("id_a"),
        F.col("fps").alias("fps_a"),
        "band_key",
    )
    right = sigs.select(
        F.col("id").alias("id_b"),
        F.col("fps").alias("fps_b"),
        "band_key",
    )
    candidates = (
        left.join(right, on="band_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "fps_a", "fps_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        candidates.withColumn(
            "jaccard",
            F.round(jaccard(F.col("fps_a"), F.col("fps_b")), round_digits),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    n: int = SHINGLE_N,
    round_digits: int = 6,
) -> DataFrame:
    """Brute-force n-gram Jaccard pairs — the exact counterpart the
    LSH path approximates; keep the input bounded (it is O(N²))."""
    s = df.select(
        F.col(id_col).alias("id"), shingle_fingerprints(text_col, n).alias("fps")
    )
    a = s.select(F.col("id").alias("id_a"), F.col("fps").alias("fps_a"))
    b = s.select(F.col("id").alias("id_b"), F.col("fps").alias("fps_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "jaccard",
            F.round(jaccard(F.col("fps_a"), F.col("fps_b")), round_digits),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_expr(col: Column | str, bits: int = SIMHASH_BITS) -> Column:
    """SimHash over token fingerprints: bit b of the signature is the
    sign of Σ_tokens (±1 by bit b of the token hash). Per-row array
    folds only — no explode, no shuffle."""
    fps = F.transform(tokens(col), lambda t: poly_hash_of(t))

    def bit_vote(b: int):
        # two-arg lambda: F.aggregate dispatches on lambda arity
        return lambda acc, f: acc + (
            F.shiftright(f, b).bitwiseAND(F.lit(1)) * 2 - 1
        )

    sig = F.lit(0).cast("long")
    for b in range(bits):
        vote = F.aggregate(fps, F.lit(0).cast("long"), bit_vote(b))
        sig = sig + F.when(vote >= 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sig


def simhash_near_dup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 6,
) -> DataFrame:
    """SimHash near-dup pairs: band the signature into byte blocks
    (equi-join candidates must share ≥1 exact block — pigeonhole holds
    when max_hamming < SIMHASH_BANDS·1), then verify Hamming ≤ t."""
    sigs = df.select(
        F.col(id_col).alias("id"), simhash_expr(text_col).alias("sig")
    )
    banded = sigs.withColumn(
        "band_key",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        ":",
                        F.lit(str(b)),
                        (
                            F.shiftright(F.col("sig"), b * SIMHASH_BAND_BITS)
                            .bitwiseAND(F.lit((1 << SIMHASH_BAND_BITS) - 1))
                        ).cast("string"),
                    )
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ),
    )
    left = banded.select(
        F.col("id").alias("id_a"), F.col("sig").alias("sig_a"), "band_key"
    )
    right = banded.select(
        F.col("id").alias("id_b"), F.col("sig").alias("sig_b"), "band_key"
    )
    return (
        left.join(right, on="band_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn(
            "hamming",
            F.bit_count(
                F.col("sig_a").bitwiseXOR(F.col("sig_b"))
            ),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
