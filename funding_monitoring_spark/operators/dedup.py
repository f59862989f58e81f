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
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from funding_monitoring_spark.functions.scalars import let
from funding_monitoring_spark.operators.cachescope import scoped_persist
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


def _poly_fold(hs: Column) -> Column:
    """Polynomial fold over an array of longs (same recurrence as the
    char-level hash, lifted to token-hash values)."""
    return F.aggregate(
        hs,
        F.lit(POLY_INIT).cast("long"),
        lambda acc, x: (acc * POLY_MULT + x) % POLY_MOD,
    )


def shingle_fingerprints(col: Column | str, n: int = SHINGLE_N) -> Column:
    """Distinct numeric shingle set as hash-of-token-hashes.

    Each token is char-hashed ONCE; a shingle fingerprint is then a
    3-step polynomial fold over the n token hashes — O(chars + n·shingles)
    per document instead of O(n·chars·shingles) for re-hashing every
    shingle string. The token-hash array is let-bound so it is
    evaluated exactly once per row. A document shorter than n tokens
    contributes one fingerprint folded over all its token hashes.
    """
    th_expr = F.transform(tokens(col), lambda t: poly_hash_of(t))

    def body(th: Column) -> Column:
        windows = F.transform(
            F.sequence(F.lit(1), F.size(th) - (n - 1)),
            lambda i: _poly_fold(F.slice(th, i, F.lit(n))),
        )
        return F.when(F.size(th) >= n, F.array_distinct(windows)).otherwise(
            F.array(_poly_fold(th))
        )

    return let(th_expr, body)


def minhash_signature(fps: Column) -> Column:
    """MinHash signature: per hash function j, min over the shingle set
    of (a_j * fp + b_j) mod P. Returns an array of MINHASH_K longs.

    Computed as ONE fold over the shingle set carrying all K running
    minima — the fps expression appears exactly once in the tree, so
    the (expensive) shingle fingerprints are evaluated once per row,
    not once per hash function.
    """
    a_arr = F.array(*[F.lit(a).cast("long") for a, _ in MINHASH_PARAMS])
    b_arr = F.array(*[F.lit(b).cast("long") for _, b in MINHASH_PARAMS])
    # running minima start at POLY_MOD (> every hash value in [0, P-1]);
    # fps is never empty (an empty document yields one empty shingle)
    return F.aggregate(
        fps,
        F.array_repeat(F.lit(POLY_MOD).cast("long"), MINHASH_K),
        lambda acc, f: F.transform(
            acc,
            lambda m, j: F.least(
                m, (f * F.get(a_arr, j) + F.get(b_arr, j)) % POLY_MOD
            ),
        ),
    )


def minhash_band_keys(sig: Column) -> Column:
    """LSH band keys: signature split into MINHASH_BANDS rows-per-band
    groups, each serialized as 'band:v1:v2:v3'. Built with transform
    over a band-index sequence so `sig` appears once in the tree."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(MINHASH_BANDS - 1)),
        lambda b: F.concat_ws(
            ":",
            b.cast("string"),
            F.concat_ws(
                ":",
                F.transform(
                    F.slice(sig, b * MINHASH_ROWS + 1, F.lit(MINHASH_ROWS)),
                    lambda v: v.cast("string"),
                ),
            ),
        ),
    )


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


def minhash_signature_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, fps, sig): the persisted MinHash signature table — the
    expensive shingle fingerprints are computed a single time even
    though the frame is scanned several times downstream (band join
    sides, verify joins). At cluster scale this is the signature
    store you persist/checkpoint once per corpus and keep between
    ingest batches (the incremental path's historical index)."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            shingle_fingerprints(text_col).alias("fps"),
        )
        .select(
            "id", "fps", minhash_signature(F.col("fps")).alias("sig")
        )
        .transform(scoped_persist)
    )


def _band_rows(sigs: DataFrame) -> DataFrame:
    """Slim (id, band_key) rows: only these shuffle in the LSH join —
    never the fingerprint arrays, never the document text."""
    return sigs.select(
        "id", F.explode(minhash_band_keys(F.col("sig"))).alias("band_key")
    )


def _verify_pairs(
    candidates: DataFrame,
    sigs: DataFrame,
    threshold: float,
    round_digits: int,
) -> DataFrame:
    """Exact-Jaccard verification of (id_a, id_b) candidates against
    the signature table's shingle sets."""
    verified = (
        candidates.join(
            sigs.select(F.col("id").alias("id_a"), F.col("fps").alias("fps_a")),
            "id_a",
        )
        .join(
            sigs.select(F.col("id").alias("id_b"), F.col("fps").alias("fps_b")),
            "id_b",
        )
    )
    return (
        verified.withColumn(
            "jaccard",
            F.round(jaccard(F.col("fps_a"), F.col("fps_b")), round_digits),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
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
    sigs = minhash_signature_table(df, text_col, id_col)
    bands = _band_rows(sigs)
    candidates = (
        bands.select(F.col("id").alias("id_a"), "band_key")
        .join(bands.select(F.col("id").alias("id_b"), "band_key"), "band_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return _verify_pairs(candidates, sigs, threshold, round_digits)


def minhash_lsh_pairs_incremental(
    new_sigs: DataFrame,
    store_sigs: DataFrame,
    threshold: float = 0.5,
    round_digits: int = 6,
) -> DataFrame:
    """Near-dup pairs INVOLVING the new batch, probed against a
    persisted signature store — the steady-state shape of corpus
    near-dup at 100 TB: each arriving batch computes its own
    signatures, probes its band keys against the historical band
    index PLUS itself, and never re-pairs the historical corpus
    against itself. Equivalent to running the full LSH join on
    (store ∪ new) and keeping pairs with >= 1 new member — band
    collision is symmetric, so probing new-vs-all finds exactly the
    (old, new) and (new, new) collisions — which is what lets the
    differential oracle be the full-pipeline SQL filtered to new
    members. Output pairs are normalized id_a < id_b.

    Both inputs are (id, fps, sig) signature tables
    (minhash_signature_table); ids must be disjoint. The store's
    band index shuffles as slim (id, band_key) rows; its fps arrays
    move only for the verified candidates."""
    all_sigs = store_sigs.unionByName(new_sigs)
    new_bands = _band_rows(new_sigs)
    all_bands = _band_rows(all_sigs)
    candidates = (
        new_bands.select(F.col("id").alias("id_n"), "band_key")
        .join(
            all_bands.select(F.col("id").alias("id_o"), "band_key"),
            "band_key",
        )
        .filter(F.col("id_n") != F.col("id_o"))
        .select(
            F.least("id_n", "id_o").alias("id_a"),
            F.greatest("id_n", "id_o").alias("id_b"),
        )
        .distinct()
    )
    return _verify_pairs(candidates, all_sigs, threshold, round_digits)


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
    folds only — no explode, no shuffle.

    ONE fold over the token fingerprints carries all `bits` vote
    counters (vs. one fold per bit, which re-evaluates every token
    hash `bits` times — a ~30× slowdown measured at sf0.1).
    """
    fps = F.transform(tokens(col), lambda t: poly_hash_of(t))

    # token hashes are non-negative (< POLY_MOD), so bit b of f is
    # floor(f / 2^b) % 2 — exact in double for f < 2^53
    votes = F.aggregate(
        fps,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, f: F.transform(
            acc,
            lambda v, b: v
            + (F.floor(f / F.pow(F.lit(2.0), b)).cast("long") % 2) * 2
            - 1,
        ),
    )
    contrib = F.transform(
        votes,
        lambda v, b: F.when(v >= 0, F.pow(F.lit(2.0), b)).otherwise(
            F.lit(0.0)
        ),
    )
    return F.aggregate(contrib, F.lit(0.0), lambda a, x: a + x).cast("long")


def simhash_signatures_df(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """(id, simhash) per document — the scale path for SimHash.

    Explodes token hashes and computes the per-bit votes as `bits`
    codegen'd SUM aggregates: map-side partial aggregation collapses
    each document back to one row before the shuffle, so the exchange
    carries ~1 row × 32 longs per document regardless of document
    length. ~10× faster than the per-row array fold (`simhash_expr`)
    at sf0.1 and strictly better-behaved at 100 TB (whole-stage
    codegen vs. interpreted higher-order functions).

    Semantics identical to `simhash_expr`: a document with no tokens
    has every vote 0 ⇒ all bits set.

    The char-fold hash runs once per DISTINCT token (a separate tiny
    aggregate), then broadcast-joins back onto the token stream —
    natural-language vocabularies grow ~O(corpus^0.5) (Heaps' law)
    while the token stream grows linearly, so at any scale the
    expensive interpreted fold touches a vanishing fraction of rows
    (measured 4.0s → 1.6s for the near-dup pipeline at sf0.1). The
    broadcast is an explicit hint, sized for real vocabularies (even
    web-scale corpora stay in the tens of millions of tokens); a
    corpus whose vocabulary would defeat the broadcast needs the hint
    swapped for a plain (shuffle) join on `tok` — still strictly less
    work than re-hashing every occurrence.
    """
    occurrences = df.select(
        F.col(id_col).alias("id"),
        F.explode_outer(tokens(text_col)).alias("tok"),
    )
    vocab = occurrences.select("tok").where(
        F.col("tok").isNotNull()
    ).distinct().select("tok", poly_hash_of(F.col("tok")).alias("h"))
    hashed = occurrences.join(F.broadcast(vocab), "tok", "left").select(
        "id", "h"
    )
    votes = hashed.groupBy("id").agg(
        *[
            F.coalesce(
                F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) * 2 - 1),
                F.lit(0).cast("long"),
            ).alias(f"v{b}")
            for b in range(bits)
        ]
    )
    sig = sum(
        (
            F.when(F.col(f"v{b}") >= 0, F.lit(1 << b).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
            for b in range(bits)
        ),
        start=F.lit(0).cast("long"),
    )
    return votes.select(F.col("id").alias(id_col), sig.alias("simhash"))


def simhash_near_dup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 6,
) -> DataFrame:
    """SimHash near-dup pairs: band the signature into byte blocks
    (equi-join candidates must share ≥1 exact block — pigeonhole holds
    when max_hamming < SIMHASH_BANDS·1), then verify Hamming ≤ t."""
    # persist (NOT localCheckpoint): the signature computation is the
    # expensive part and the band self-join consumes it twice, but a
    # checkpoint erases the relation's statistics (LogicalRDD defaults
    # to a huge sizeInBytes), flipping the band equi-join to a
    # SortMergeJoin — measured 4x slower on the histogram variant at
    # sf0.1. The frame is signature-sized (id + one long per doc);
    # the scoped cache registry releases it once the consuming query
    # materializes (operators/cachescope.py —
    # release_scoped_caches()).
    sigs = (
        simhash_signatures_df(df, text_col, id_col)
        .select(F.col(id_col).alias("id"), F.col("simhash").alias("sig"))
        .transform(scoped_persist)
    )
    # posexplode so the probe side carries the band INDEX as an int —
    # the first-shared-band filter below never parses the key string
    # on the (huge) joined stream
    banded = sigs.select(
        "id",
        "sig",
        F.posexplode(
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
        ).alias("_band_idx", "band_key"),
    )
    left = banded.select(
        F.col("id").alias("id_a"),
        F.col("sig").alias("sig_a"),
        "band_key",
        "_band_idx",
    )
    right = banded.select(
        F.col("id").alias("id_b"), F.col("sig").alias("sig_b"), "band_key"
    )

    # FIRST-SHARED-BAND dedup (r12): a pair colliding in k bands comes
    # out of the band join k times; it is kept ONLY in its minimal
    # shared band, decided from the two sigs already on the joined row
    # — pure codegen, replacing the dropDuplicates that shuffled the
    # ENTIRE raw candidate pair mass (quadratic in band-bucket size;
    # the r12 sf1 sweep OOM'd the unfiltered histogram variant on
    # exactly that exchange). The cheap bit-op hamming filter runs
    # FIRST so the band-equality array only evaluates on survivors.
    def _band_val(col, b):
        return F.shiftright(F.col(col), b * SIMHASH_BAND_BITS).bitwiseAND(
            F.lit((1 << SIMHASH_BAND_BITS) - 1)
        )

    first_shared = F.array_position(
        F.array(
            *[
                _band_val("sig_a", b) == _band_val("sig_b", b)
                for b in range(SIMHASH_BANDS)
            ]
        ),
        F.lit(True),
    )
    return (
        left.join(right, on="band_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "hamming",
            F.bit_count(
                F.col("sig_a").bitwiseXOR(F.col("sig_b"))
            ),
        )
        .filter(F.col("hamming") <= max_hamming)
        .filter(F.col("_band_idx") + 1 == first_shared)
        .select("id_a", "id_b", "hamming")
    )


def hex_signature_near_dup(
    sigs: DataFrame,
    id_col: str = "id",
    hex_col: str = "sig",
    bands: int = 4,
    max_hamming: int = 3,
    max_band_bucket: int | None = None,
) -> DataFrame:
    """Banded near-dup pairs over a 64-bit HEX-string signature column
    (16 lowercase hex chars — the image dHash serialization): the
    simhash_near_dup machinery generalized to any precomputed
    fingerprint. Bands are 16/bands-hex-char substrings, candidates
    must share >= 1 exact band (pigeonhole EXACT while
    max_hamming < bands), and survivors verify Hamming <= t with
    hi/lo 32-bit xor+bit_count (a 64-bit unsigned hex does not fit a
    signed conv() long). Shuffle key is a band, never a pair.

    ``max_band_bucket`` is the loud pair-mass guard (the fuzzyjoin
    hot-bucket pattern): the candidate space — and on a
    duplicate-heavy corpus the OUTPUT pair set itself — is quadratic
    in the largest band bucket, so a viral duplicate group (k copies
    of one image hash → C(k, 2) true pairs) fails loudly instead of
    materializing O(k²) rows. The guard is OPT-IN here (default
    ``None`` — the raw operator keeps its original slow-but-correct
    contract and adds no eager probe job at construction); scale-path
    call sites (the registered `image_dhash_near_dup` query, the
    star-form cluster builders, which collapse to DISTINCT
    representative signatures first) pass an explicit bound. The
    scale-safe consumer shape is hex_signature_cluster_edges (star
    form), which collapses exact duplicates before banding and never
    pays the quadratic output."""
    if max_hamming >= bands:
        raise ValueError(
            f"banding is only pigeonhole-exact for max_hamming < bands "
            f"({max_hamming} >= {bands})"
        )
    if 16 % bands:
        raise ValueError(f"bands={bands} must divide 16 hex chars")
    width = 16 // bands
    # persist: the guard probe and the self-join's two sides consume
    # sigs; a checkpoint here would erase relation statistics and flip
    # the band equi-join to SortMergeJoin (see simhash_near_dup).
    # The frame is 16 hex chars + an id per signature; the scoped
    # cache registry releases it once the consuming query
    # materializes (operators/cachescope.py).
    sigs = scoped_persist(
        sigs.select(F.col(id_col).alias("id"), F.col(hex_col).alias("sig"))
    )
    # posexplode: the band INDEX rides as an int so the
    # first-shared-band filter never parses the key string
    banded = sigs.select(
        "id",
        "sig",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        ":",
                        F.lit(str(b)),
                        F.substring("sig", 1 + b * width, width),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_band_idx", "band_key"),
    )
    if max_band_bucket is not None:
        # loud pair-mass guard (fuzzyjoin hot-bucket pattern): the
        # band self-join is quadratic per band bucket, and a bucket
        # dominated by one exact signature means the OUTPUT pair set
        # itself is quadratic — refuse with the scale-safe alternative
        # named instead of materializing it. One cheap count pass over
        # the checkpointed sigs (16 chars/row), .limit(1) probe only.
        hot = (
            banded.groupBy("band_key")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > max_band_bucket)
            .limit(1)
            .collect()
        )
        if hot:
            r = hot[0]
            raise ValueError(
                f"hex_signature_near_dup band bucket "
                f"{r.band_key!r} holds {r._n} signatures > "
                f"max_band_bucket={max_band_bucket}: the candidate "
                "(and likely output) pair set is quadratic in that "
                "bucket — use hex_signature_cluster_edges (star-form "
                "output) for duplicate-heavy corpora, or raise the "
                "bound deliberately"
            )
    left = banded.select(
        F.col("id").alias("id_a"),
        F.col("sig").alias("sig_a"),
        "band_key",
        "_band_idx",
    )
    right = banded.select(
        F.col("id").alias("id_b"), F.col("sig").alias("sig_b"), "band_key"
    )

    def half(col, lo):
        return F.conv(
            F.substring(col, 1 + (0 if not lo else 8), 8), 16, 10
        ).cast("long")

    hamming = (
        F.bit_count(half("sig_a", 0).bitwiseXOR(half("sig_b", 0)))
        + F.bit_count(half("sig_a", 1).bitwiseXOR(half("sig_b", 1)))
    )
    # first-shared-band dedup (r12, same trick as simhash_near_dup):
    # keep each pair only in its minimal shared band — decided from
    # the hex substrings already on the joined row, replacing the
    # dropDuplicates that shuffled the whole raw candidate pair mass;
    # the cheap hamming filter runs first so the band-equality array
    # only evaluates on survivors
    first_shared = F.array_position(
        F.array(
            *[
                F.substring("sig_a", 1 + b * width, width)
                == F.substring("sig_b", 1 + b * width, width)
                for b in range(bands)
            ]
        ),
        F.lit(True),
    )
    return (
        left.join(right, on="band_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .filter(F.col("_band_idx") + 1 == first_shared)
        .select("id_a", "id_b", "hamming")
    )


def hex_signature_cluster_edges(
    sigs: DataFrame,
    id_col: str = "id",
    hex_col: str = "sig",
    bands: int = 4,
    max_hamming: int = 3,
    max_band_bucket: int | None = 10_000,
) -> DataFrame:
    """A SPANNING edge set of the Hamming-<=t graph over 64-bit hex
    signatures in cluster-representative (star) form — the scale path
    for CLUSTERING consumers of image near-dup, which need
    connectivity, not every pair (the same contract as
    fuzzyjoin.edit_distance_cluster_edges, lifted to signatures).

    Exact-duplicate collapse first: identical signatures enter the
    banded candidate space ONCE via their min-id representative, the
    other copies attaching by star edges (representative -> member,
    hamming 0 — identical signatures ARE Hamming 0). A viral duplicate
    group of k copies therefore costs k star rows plus ONE node in the
    band join instead of C(k, 2) verified pairs — the r10 sf1 sweep
    measured the all-pairs form at 20.3x wall at 10x data on exactly
    this shape (pair mass, not compute, was the growth).

    Connectivity is IDENTICAL to hex_signature_near_dup's full pair
    set: copies are Hamming 0 from their representative (<= t), and
    any cross-copy pair's distance equals its representatives'
    distance (same signatures), so a path exists in the star form iff
    one exists in the pair form; connected components yield the same
    clusters. Only the (deliberately unmaterialized) pair multiset
    differs. Returns (id_a, id_b, hamming): hamming 0 on star edges,
    the verified distance on representative pairs.

    The band bucket after collapse holds at most one row per DISTINCT
    signature, so ``max_band_bucket`` now guards genuine near-collision
    density, not duplicate mass — it only trips when > max_band_bucket
    distinct signatures share a band value."""
    # ONE window pass tags every signature row with its min-id
    # representative (a groupBy + re-join would shuffle twice); the
    # slim tagged frame is checkpointed because both outputs filter it
    # and Catalyst re-executes unshared subplans per consumer
    w = Window.partitionBy("sig")
    tagged = (
        sigs.select(F.col(id_col).alias("id"), F.col(hex_col).alias("sig"))
        .filter(F.col("sig").isNotNull())
        .withColumn("_rep", F.min("id").over(w))
        .localCheckpoint(eager=True)
    )
    star = tagged.filter(F.col("id") != F.col("_rep")).select(
        F.col("_rep").alias("id_a"),
        F.col("id").alias("id_b"),
        F.lit(0).cast("integer").alias("hamming"),
    )
    reps = tagged.filter(F.col("id") == F.col("_rep")).select("id", "sig")
    rep_pairs = hex_signature_near_dup(
        reps,
        id_col="id",
        hex_col="sig",
        bands=bands,
        max_hamming=max_hamming,
        max_band_bucket=max_band_bucket,
    ).select("id_a", "id_b", F.col("hamming").cast("integer").alias("hamming"))
    return rep_pairs.unionByName(star)


def hex_signature_clusters(
    sigs: DataFrame,
    id_col: str = "id",
    hex_col: str = "sig",
    bands: int = 4,
    max_hamming: int = 3,
    max_band_bucket: int | None = 10_000,
) -> DataFrame:
    """Cluster membership (id, cluster_id, is_canonical) over 64-bit
    hex signatures — the end-to-end scale path: exact-duplicate
    collapse, banded near-dup over DISTINCT signatures only, and
    connected components over the QUOTIENT graph (representatives
    only). Star edges never enter the iterative CC — they cannot
    change connectivity between representatives, so the label
    propagation runs on O(distinct signatures) nodes instead of
    O(corpus), and members inherit their representative's final label
    with one broadcast-sized join. cluster_id is the min id in the
    component (the deterministic survivor rule); signatures in no
    near-dup pair form singleton clusters under their own
    representative."""
    from funding_monitoring_spark.operators.components import (
        connected_components,
    )

    # ONE pass over sigs, checkpointed: the input may be an expensive
    # pipeline (codec decode + hash), and the membership universe and
    # the representative rows both slice this frame. NULL-signature
    # rows have no near-dup identity and stay their own singleton
    # clusters (_rep = id — the window would otherwise collapse ALL
    # null sigs into one bogus group), the same contract as
    # fuzzyjoin.edit_distance_clusters.
    w = Window.partitionBy("sig")
    tagged = (
        sigs.select(F.col(id_col).alias("id"), F.col(hex_col).alias("sig"))
        .withColumn(
            "_rep",
            F.when(
                F.col("sig").isNotNull(), F.min("id").over(w)
            ).otherwise(F.col("id")),
        )
        .localCheckpoint(eager=True)
    )
    reps = tagged.filter(
        F.col("sig").isNotNull() & (F.col("id") == F.col("_rep"))
    ).select("id", "sig")
    rep_pairs = hex_signature_near_dup(
        reps,
        id_col="id",
        hex_col="sig",
        bands=bands,
        max_hamming=max_hamming,
        max_band_bucket=max_band_bucket,
    )
    comp = connected_components(rep_pairs).withColumnRenamed(
        "id", "_rep"
    )
    return (
        tagged.join(F.broadcast(comp), "_rep", "left")
        .withColumn(
            "cluster_id", F.coalesce(F.col("cluster_id"), F.col("_rep"))
        )
        .select(
            F.col("id").alias(id_col),
            "cluster_id",
            (F.col("id") == F.col("cluster_id")).alias("is_canonical"),
        )
    )


def duplicated_span_report(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_gram: int = 8,
    fold_grams: bool = False,
) -> DataFrame:
    """Offset-robust exact-substring duplication report — the
    suffix-array-style dedup family (anchor n-grams + span
    coalescing) that fixed-grid span dedup cannot express: a
    boilerplate passage repeated at ARBITRARY word offsets across
    (or within) documents is found exactly, because every token
    position anchors a ``min_gram``-word shingle, not just positions
    on a segment grid.

    Semantics (the public corpus-dedup definition): a position i in a
    document is *duplicated* iff the exact ``min_gram``-word sequence
    starting at i occurs >= 2 times corpus-wide (within-document
    repetition counts, as in suffix-array exact-substring dedup).
    Overlapping/adjacent duplicated windows coalesce into maximal
    spans; the report gives per document the duplicated-anchor count,
    the number of maximal spans, the union token mass they cover, and
    its ratio to the document length.

    Scale shape (100 TB): the ONLY data-sized shuffle keys are the
    anchor gram (one count-over-partition window — linear, never a
    pair join: a viral gram just has a large count, there is no
    quadratic candidate set to guard) and doc_id (island coalescing +
    the final report aggregation share one partitioning).
    ``fold_grams=True`` is the full-scale variant: the ``min_gram``-
    word gram string (~8 words of key mass per anchor row) is
    xxhash64-folded to 8 bytes BEFORE the gram-keyed shuffle, cutting
    the biggest exchange of a corpus-wide pass ~8x. A 64-bit collision
    would over-count one anchor as duplicated — negligible at any
    corpus size and property-tested fold ≡ string
    (tests/test_extensions.py). Default False replays the exact
    string so the DuckDB oracle matches verbatim.

    Returns (id, n_tokens, dup_gram_starts, n_dup_spans, dup_tokens,
    dup_ratio) for EVERY input document (zero rows for docs shorter
    than ``min_gram`` or with no duplicated anchor)."""
    L = int(min_gram)
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.regexp_extract_all(
            F.col(text_col), F.lit(r"(\S+)"), 1
        ).alias("l"),
    ).select("doc_id", F.size("l").alias("n_tokens"), "l")
    grams = (
        toks.filter(F.col("n_tokens") >= L)
        .select(
            "doc_id",
            "n_tokens",
            F.explode(
                F.sequence(F.lit(0), F.col("n_tokens") - L)
            ).alias("pos"),
            "l",
        )
        .select(
            "doc_id",
            "n_tokens",
            "pos",
            F.array_join(
                F.slice("l", F.col("pos") + 1, L), " "
            ).alias("gram"),
        )
    )
    if fold_grams:
        # fold the ~8-word key to 8 bytes BEFORE the gram-keyed
        # exchange — the string never rides the shuffle
        grams = grams.withColumn("gram", F.xxhash64("gram"))
    dup = grams.withColumn(
        "_cnt", F.count(F.lit(1)).over(Window.partitionBy("gram"))
    ).filter(F.col("_cnt") >= 2)
    # gaps-and-islands over anchor positions: intervals [pos, pos+L-1]
    # merge when overlapping or adjacent, so islands are the maximal
    # contiguous duplicated regions and their length is the exact
    # union coverage.
    w_doc = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = dup.withColumn(
        "_new",
        (
            F.col("pos")
            > F.coalesce(
                F.max(F.col("pos") + (L - 1)).over(w_doc),
                F.lit(-(L + 2)),
            )
            + 1
        ).cast("int"),
    ).withColumn(
        "_isl",
        F.sum("_new").over(
            Window.partitionBy("doc_id")
            .orderBy("pos")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    per_island = flagged.groupBy("doc_id", "n_tokens", "_isl").agg(
        F.count(F.lit(1)).alias("_starts"),
        (F.max("pos") - F.min("pos") + L).alias("_covered"),
    )
    per_doc = per_island.groupBy("doc_id", "n_tokens").agg(
        F.sum("_starts").alias("dup_gram_starts"),
        F.count(F.lit(1)).alias("n_dup_spans"),
        F.sum("_covered").alias("dup_tokens"),
    )
    return (
        toks.select("doc_id", "n_tokens")
        .join(per_doc.drop("n_tokens"), "doc_id", "left")
        .select(
            F.col("doc_id").alias(id_col),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce("dup_gram_starts", F.lit(0))
            .cast("long")
            .alias("dup_gram_starts"),
            F.coalesce("n_dup_spans", F.lit(0))
            .cast("long")
            .alias("n_dup_spans"),
            F.coalesce("dup_tokens", F.lit(0))
            .cast("long")
            .alias("dup_tokens"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0))
                / F.greatest(F.col("n_tokens"), F.lit(1)),
                6,
            ).alias("dup_ratio"),
        )
    )


def remove_duplicated_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_gram: int = 8,
    fold_grams: bool = False,
) -> DataFrame:
    """The APPLY half of offset-robust exact-substring dedup
    (duplicated_span_report is the measure half): keep the FIRST
    corpus-wide occurrence of every duplicated ``min_gram``-token
    window (ordered by (doc_id, position) — deterministic) and remove
    the tokens every LATER occurrence covers, reassembling each
    document from its surviving tokens. This is the
    public-corpus-pipeline exact-substring dedup contract
    (keep-one-copy), robust to arbitrary word offsets — unlike a
    fixed segment grid.

    Scale shape: one window shuffle on the anchor gram (rank the
    occurrences — linear, never a pair join), then covered positions
    explode at a bounded x``min_gram`` factor and everything else
    shuffles on doc_id (anti-join of token positions against covered
    positions + ordered reassembly share the key). Rows stay
    O(total tokens x min_gram) worst case, O(duplicated anchors x
    min_gram) after the rank filter in practice. ``fold_grams=True``
    xxhash64-folds the gram key to 8 bytes before the rank shuffle
    (see duplicated_span_report — property-tested fold ≡ string).

    Returns (id, n_tokens, n_removed, cleaned_text); cleaned_text is
    NULL when nothing survives (matching SQL string_agg over an empty
    group)."""
    L = int(min_gram)
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.regexp_extract_all(
            F.col(text_col), F.lit(r"(\S+)"), 1
        ).alias("l"),
    ).select("doc_id", F.size("l").alias("n_tokens"), "l")
    grams = (
        toks.filter(F.col("n_tokens") >= L)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), F.col("n_tokens") - L)
            ).alias("pos"),
            "l",
        )
        .select(
            "doc_id",
            "pos",
            F.array_join(
                F.slice("l", F.col("pos") + 1, L), " "
            ).alias("gram"),
        )
    )
    if fold_grams:
        # full-scale key fold: 8 bytes instead of ~8 words on the
        # rank shuffle (see duplicated_span_report)
        grams = grams.withColumn("gram", F.xxhash64("gram"))
    w_gram = Window.partitionBy("gram")
    ranked = grams.withColumn(
        "_cnt", F.count(F.lit(1)).over(w_gram)
    ).withColumn(
        "_rn",
        F.row_number().over(w_gram.orderBy("doc_id", "pos")),
    )
    # later occurrences of a duplicated window: their covered token
    # positions are removed (bounded xL explode)
    covered = (
        ranked.filter((F.col("_cnt") >= 2) & (F.col("_rn") >= 2))
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (L - 1))
            ).alias("cpos"),
        )
        .distinct()
    )
    words = toks.select(
        "doc_id",
        "n_tokens",
        F.posexplode("l").alias("pos", "word"),
    )
    # explicit disambiguation: words and covered share lineage, so a
    # direct attribute comparison would be the ambiguous-self-join
    # shape Spark has to heuristically repair
    covered = covered.select(
        F.col("doc_id").alias("_cdoc"), "cpos"
    )
    kept = words.join(
        covered,
        (F.col("doc_id") == F.col("_cdoc"))
        & (F.col("pos") == F.col("cpos")),
        "left_anti",
    )
    cleaned = kept.groupBy("doc_id", "n_tokens").agg(
        F.count(F.lit(1)).alias("_kept"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "word"))),
                lambda x: x["word"],
            ),
            " ",
        ).alias("_joined"),
    )
    return (
        toks.select("doc_id", "n_tokens")
        .join(cleaned.drop("n_tokens"), "doc_id", "left")
        .select(
            F.col("doc_id").alias(id_col),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            (
                F.col("n_tokens") - F.coalesce("_kept", F.lit(0))
            ).cast("long").alias("n_removed"),
            F.when(
                F.coalesce("_kept", F.lit(0)) > 0, F.col("_joined")
            ).alias("cleaned_text"),
        )
    )


def incremental_duplicated_spans(
    batch: DataFrame,
    store: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_gram: int = 8,
    fold_grams: bool = False,
) -> DataFrame:
    """Steady-state offset-robust substring dedup: report how much of
    each ARRIVING document is covered by exact ``min_gram``-word
    windows that already exist in the historical corpus — without
    ever re-pairing history against itself (the incremental_dedup /
    incremental_minhash_dedup contract, lifted to substrings). The
    store side reduces to its DISTINCT gram set (at 100 TB this is
    the persisted anchor-gram index, bucketed by gram; history never
    re-shuffles per batch), the batch side anchors every position,
    and one left-semi join on the gram marks covered anchors; spans
    coalesce exactly as in duplicated_span_report. ``fold_grams=True``
    xxhash64-folds both sides' gram keys to 8 bytes before the
    distinct and the semi-join — at full scale the persisted index
    stores the folds, ~8x smaller (property-tested fold ≡ string).

    Returns (id, n_tokens, dup_gram_starts, n_dup_spans, dup_tokens,
    dup_ratio) for every batch document."""
    L = int(min_gram)

    def _grams(docs: DataFrame) -> DataFrame:
        toks = docs.select(
            F.col(id_col).alias("doc_id"),
            F.regexp_extract_all(
                F.col(text_col), F.lit(r"(\S+)"), 1
            ).alias("l"),
        ).select("doc_id", F.size("l").alias("n_tokens"), "l")
        return toks, (
            toks.filter(F.col("n_tokens") >= L)
            .select(
                "doc_id",
                "n_tokens",
                F.explode(
                    F.sequence(F.lit(0), F.col("n_tokens") - L)
                ).alias("pos"),
                "l",
            )
            .select(
                "doc_id",
                "n_tokens",
                "pos",
                F.array_join(
                    F.slice("l", F.col("pos") + 1, L), " "
                ).alias("gram"),
            )
        )
    _, store_grams = _grams(store)
    batch_toks, batch_grams = _grams(batch)
    if fold_grams:
        store_grams = store_grams.withColumn(
            "gram", F.xxhash64("gram")
        )
        batch_grams = batch_grams.withColumn(
            "gram", F.xxhash64("gram")
        )
    store_index = store_grams.select("gram").distinct()
    dup = batch_grams.join(store_index, "gram", "left_semi")
    w_doc = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = dup.withColumn(
        "_new",
        (
            F.col("pos")
            > F.coalesce(
                F.max(F.col("pos") + (L - 1)).over(w_doc),
                F.lit(-(L + 2)),
            )
            + 1
        ).cast("int"),
    ).withColumn(
        "_isl",
        F.sum("_new").over(
            Window.partitionBy("doc_id")
            .orderBy("pos")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    per_island = flagged.groupBy("doc_id", "n_tokens", "_isl").agg(
        F.count(F.lit(1)).alias("_starts"),
        (F.max("pos") - F.min("pos") + L).alias("_covered"),
    )
    per_doc = per_island.groupBy("doc_id", "n_tokens").agg(
        F.sum("_starts").alias("dup_gram_starts"),
        F.count(F.lit(1)).alias("n_dup_spans"),
        F.sum("_covered").alias("dup_tokens"),
    )
    return (
        batch_toks.select("doc_id", "n_tokens")
        .join(per_doc.drop("n_tokens"), "doc_id", "left")
        .select(
            F.col("doc_id").alias(id_col),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce("dup_gram_starts", F.lit(0))
            .cast("long")
            .alias("dup_gram_starts"),
            F.coalesce("n_dup_spans", F.lit(0))
            .cast("long")
            .alias("n_dup_spans"),
            F.coalesce("dup_tokens", F.lit(0))
            .cast("long")
            .alias("dup_tokens"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0))
                / F.greatest(F.col("n_tokens"), F.lit(1)),
                6,
            ).alias("dup_ratio"),
        )
    )
