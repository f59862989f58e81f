"""Dedup-family queries over the documents fixture. Every stage of the
probabilistic pipelines (shingle → fingerprint → minhash/simhash →
bands → verify) is reproduced exactly in the DuckDB oracle SQL, so the
LSH pipelines are hash-verified, not just rows-counted."""

from __future__ import annotations

from pyspark.sql import functions as F

from funding_monitoring_spark.operators import dedup as D
from funding_monitoring_spark.operators.textstats import (
    POLY_INIT,
    POLY_MOD,
    POLY_MULT,
    poly_fingerprint,
)
from funding_monitoring_spark.registry import query
from funding_monitoring_spark.sources.tables import load_table

NGRAM_LIMIT = 150  # brute-force pair bound
THRESHOLD = 0.5
# Hamming ≤ 3 of 32 bits: selective enough to mean "near-dup" on
# shared-vocabulary corpora (≤ 6 passed nearly half of all pairs)
MAX_HAMMING = 3

# ---- SQL fragments mirroring operators/dedup.py exactly ----------------

_TOKS = r"regexp_extract_all(text, '\S+')"


def _sql_poly(s: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST({POLY_INIT} AS BIGINT), "
        f"list_transform(string_split({s}, ''), "
        f"ch -> CAST(ascii(ch) AS BIGINT))), "
        f"(acc, x) -> (acc * {POLY_MULT} + x) % {POLY_MOD})"
    )


def _sql_fold(hs: str) -> str:
    """Polynomial fold over a BIGINT list (twin of dedup._poly_fold)."""
    return (
        f"list_reduce(list_prepend(CAST({POLY_INIT} AS BIGINT), {hs}), "
        f"(acc, x) -> (acc * {POLY_MULT} + x) % {POLY_MOD})"
    )


#: per-token char hashes (each token hashed once, as in Spark side)
_TH = f"list_transform({_TOKS}, tok -> {_sql_poly('tok')})"

#: shingle fingerprints = fold over n consecutive token hashes
_FPS = f"""
    CASE WHEN len({_TH}) >= {D.SHINGLE_N}
         THEN list_distinct([{_sql_fold(f"({_TH})[i:i+{D.SHINGLE_N - 1}]")}
                             for i in generate_series(1, len({_TH}) - {D.SHINGLE_N - 1})])
         ELSE [{_sql_fold(_TH)}] END
"""


def _sql_minhash_sigs() -> list[str]:
    return [
        f"list_min(list_transform(fps, f -> (f * {a} + {b}) % {POLY_MOD}))"
        for a, b in D.MINHASH_PARAMS
    ]


def _sql_band_keys() -> str:
    keys = []
    for b in range(D.MINHASH_BANDS):
        parts = [f"'{b}'"] + [
            f"CAST(s{b * D.MINHASH_ROWS + r} AS VARCHAR)"
            for r in range(D.MINHASH_ROWS)
        ]
        keys.append(" || ':' || ".join(parts))
    return "[" + ", ".join(keys) + "]"


_JACCARD = (
    "ROUND(CAST(len(list_intersect(fps_a, fps_b)) AS DOUBLE) "
    "/ len(list_distinct(fps_a || fps_b)), 6)"
)


@query(
    "exact_dedup",
    """
    SELECT md5(text) AS content_hash, MIN(doc_id) AS canonical_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def q_exact_dedup(spark, sf_dir):
    """Exact dedup: hash-groupBy on md5(text), canonical = min doc_id."""
    return D.exact_dedup_groups(load_table(spark, sf_dir, "documents"))


@query(
    "minhash_lsh_dedup",
    f"""
    WITH sigs AS (
        SELECT doc_id AS id, {_FPS} AS fps FROM documents
    ),
    mh AS (
        SELECT id, fps,
               {", ".join(f"{expr} AS s{j}" for j, expr in enumerate(_sql_minhash_sigs()))}
        FROM sigs
    ),
    banded AS (
        SELECT id, fps, unnest({_sql_band_keys()}) AS band_key FROM mh
    ),
    candidates AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM banded a JOIN banded b USING (band_key)
        WHERE a.id < b.id
    ),
    verified AS (
        SELECT c.id_a, c.id_b, sa.fps AS fps_a, sb.fps AS fps_b
        FROM candidates c
        JOIN sigs sa ON sa.id = c.id_a
        JOIN sigs sb ON sb.id = c.id_b
    )
    SELECT id_a, id_b, {_JACCARD} AS jaccard
    FROM verified WHERE {_JACCARD} >= {THRESHOLD}
    """,
)
def q_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup pairs, verified with exact shingle Jaccard."""
    return D.minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"), threshold=THRESHOLD
    )


@query(
    "ngram_jaccard_dedup",
    f"""
    WITH sigs AS (
        SELECT doc_id AS id, {_FPS} AS fps FROM documents
        WHERE doc_id < {NGRAM_LIMIT}
    ),
    pairs AS (
        SELECT a.id AS id_a, b.id AS id_b, a.fps AS fps_a, b.fps AS fps_b
        FROM sigs a CROSS JOIN sigs b WHERE a.id < b.id
    )
    SELECT id_a, id_b, {_JACCARD} AS jaccard
    FROM pairs WHERE {_JACCARD} >= {THRESHOLD}
    """,
)
def q_ngram_jaccard(spark, sf_dir):
    """Brute-force n-gram Jaccard pairs (exact counterpart of LSH)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        f"doc_id < {NGRAM_LIMIT}"
    )
    return D.ngram_jaccard_pairs(docs, threshold=THRESHOLD)


def _sql_simhash() -> str:
    votes = []
    for b in range(D.SIMHASH_BITS):
        vote = (
            f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"list_transform(fps, f -> ((f >> {b}) & 1) * 2 - 1)), "
            f"(acc, x) -> acc + x)"
        )
        votes.append(
            f"(CASE WHEN {vote} >= 0 THEN CAST(1 AS BIGINT) << {b} "
            f"ELSE 0 END)"
        )
    return " + ".join(votes)


@query(
    "simhash_signatures",
    f"""
    WITH t AS (
        SELECT doc_id,
               list_transform({_TOKS}, tok -> {_sql_poly('tok')}) AS fps
        FROM documents
    )
    SELECT doc_id, {_sql_simhash()} AS simhash FROM t
    """,
)
def q_simhash_signatures(spark, sf_dir):
    """32-bit SimHash signature per document (codegen'd bit-vote sums
    with map-side combine; see D.simhash_signatures_df)."""
    return D.simhash_signatures_df(load_table(spark, sf_dir, "documents"))


@query(
    "simhash_near_dup",
    f"""
    WITH t AS (
        SELECT doc_id,
               list_transform({_TOKS}, tok -> {_sql_poly('tok')}) AS fps
        FROM documents
    ),
    sigs AS (SELECT doc_id AS id, {_sql_simhash()} AS sig FROM t),
    banded AS (
        SELECT id, sig,
               unnest([CAST(b AS VARCHAR) || ':' ||
                       CAST((sig >> (b * {D.SIMHASH_BAND_BITS})) &
                            {(1 << D.SIMHASH_BAND_BITS) - 1} AS VARCHAR)
                       for b in generate_series(0, {D.SIMHASH_BANDS - 1})])
                   AS band_key
        FROM sigs
    ),
    candidates AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b,
               a.sig AS sig_a, b.sig AS sig_b
        FROM banded a JOIN banded b USING (band_key)
        WHERE a.id < b.id
    )
    SELECT id_a, id_b, CAST(bit_count(xor(sig_a, sig_b)) AS INT) AS hamming
    FROM candidates WHERE bit_count(xor(sig_a, sig_b)) <= {MAX_HAMMING}
    """,
)
def q_simhash_near_dup(spark, sf_dir):
    """SimHash near-dup pairs: byte-band candidates + Hamming verify."""
    return D.simhash_near_dup(
        load_table(spark, sf_dir, "documents"), max_hamming=MAX_HAMMING
    )


_CLUSTERS_ORACLE = f"""
    WITH RECURSIVE sigs AS (
        SELECT doc_id AS id, {_FPS} AS fps FROM documents
    ),
    mh AS (
        SELECT id, fps,
               {", ".join(f"{expr} AS s{j}" for j, expr in enumerate(_sql_minhash_sigs()))}
        FROM sigs
    ),
    banded AS (
        SELECT id, fps, unnest({_sql_band_keys()}) AS band_key FROM mh
    ),
    candidates AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM banded a JOIN banded b USING (band_key)
        WHERE a.id < b.id
    ),
    verified AS (
        SELECT c.id_a, c.id_b, sa.fps AS fps_a, sb.fps AS fps_b
        FROM candidates c
        JOIN sigs sa ON sa.id = c.id_a
        JOIN sigs sb ON sb.id = c.id_b
    ),
    pairs AS (
        SELECT id_a, id_b FROM verified WHERE {_JACCARD} >= {THRESHOLD}
    ),
    edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION
        SELECT id_b AS u, id_a AS v FROM pairs
    ),
    reach(id, lbl) AS (
        SELECT u, u FROM edges
        UNION
        SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.id
    ),
    comp AS (SELECT id, MIN(lbl) AS cluster_id FROM reach GROUP BY id)
    SELECT d.doc_id,
           COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
           d.doc_id = COALESCE(c.cluster_id, d.doc_id) AS is_canonical
    FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
    """


@query("dedup_clusters", _CLUSTERS_ORACLE)
def q_dedup_clusters(spark, sf_dir):
    """Transitive dup clusters: MinHash-LSH pairs → connected
    components (hash-min label propagation) → per-document canonical
    assignment. The oracle computes the same closure with a recursive
    CTE, so cluster ids are value-checked document by document."""
    from funding_monitoring_spark.operators.components import (
        dedup_cluster_assignment,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs, threshold=THRESHOLD)
    return dedup_cluster_assignment(docs, pairs).select(
        "doc_id", "cluster_id", "is_canonical"
    )


@query("dedup_clusters_star", _CLUSTERS_ORACLE)
def q_dedup_clusters_star(spark, sf_dir):
    """Same clustering contract as dedup_clusters (identical oracle),
    computed with the alternating large-star/small-star CC variant —
    diameter-independent convergence for adversarial chain-shaped dup
    graphs where hash-min's rounds-=-diameter bound fails loudly
    (operators/components.connected_components_star; the path-graph
    property test in tests/test_components.py pins exactly that
    divergence)."""
    from funding_monitoring_spark.operators.components import (
        dedup_cluster_assignment,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs, threshold=THRESHOLD)
    return dedup_cluster_assignment(docs, pairs, method="star").select(
        "doc_id", "cluster_id", "is_canonical"
    )


_INCR_FP = """
    list_reduce(
        list_prepend(CAST({init} AS BIGINT),
            list_transform(string_split(text, ''),
                           ch -> CAST(ascii(ch) AS BIGINT))),
        (acc, x) -> (acc * {mult} + x) % {mod}
    )
""".format(init=POLY_INIT, mult=POLY_MULT, mod=POLY_MOD)

INCREMENTAL_DEDUP_ORACLE = f"""
    WITH store AS (
        SELECT DISTINCT {_INCR_FP} AS fingerprint
        FROM documents WHERE doc_id % 3 <> 0
    ),
    batch AS (
        SELECT doc_id, {_INCR_FP} AS fingerprint
        FROM documents
    )
    SELECT b.doc_id, b.fingerprint
    FROM batch b
    WHERE NOT EXISTS (SELECT 1 FROM store s
                      WHERE s.fingerprint = b.fingerprint)
"""


@query("incremental_dedup", INCREMENTAL_DEDUP_ORACLE)
def q_incremental_dedup(spark, sf_dir):
    """Continuous-ingestion dedup: admit only the documents of a new
    batch whose fingerprint is NOT in the historical fingerprint
    store — the steady-state shape of corpus dedup (each arriving
    batch checks against everything already accepted, never
    re-clustering the full corpus). One LEFT ANTI join on the 64-bit
    fingerprint: the store side carries fingerprints only (never
    text), and at 100 TB both sides are bucketed by fingerprint so
    the probe is exchange-free. Fixture: the store is the docs with
    doc_id % 3 != 0; the fixture's exact-duplicate pairs make the
    admitted set a strict subset of the %3==0 docs."""
    docs = load_table(spark, sf_dir, "documents")
    fp = poly_fingerprint("text").alias("fingerprint")
    store = (
        docs.filter(F.col("doc_id") % 3 != 0)
        .select(fp)
        .distinct()
    )
    batch = docs.select("doc_id", fp)
    return batch.join(store, "fingerprint", "left_anti").select(
        "doc_id", "fingerprint"
    )


SIMHASH_HIST_ORACLE = f"""
    WITH t AS (
        SELECT doc_id,
               list_transform({_TOKS}, tok -> {_sql_poly('tok')}) AS fps
        FROM documents
    ),
    sigs AS (SELECT doc_id AS id, {_sql_simhash()} AS sig FROM t),
    banded AS (
        SELECT id, sig,
               unnest([CAST(b AS VARCHAR) || ':' ||
                       CAST((sig >> (b * {D.SIMHASH_BAND_BITS})) &
                            {(1 << D.SIMHASH_BAND_BITS) - 1} AS VARCHAR)
                       for b in generate_series(0, {D.SIMHASH_BANDS - 1})])
                   AS band_key
        FROM sigs
    ),
    candidates AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b,
               a.sig AS sig_a, b.sig AS sig_b
        FROM banded a JOIN banded b USING (band_key)
        WHERE a.id < b.id
    )
    SELECT CAST(bit_count(xor(sig_a, sig_b)) AS INT) AS hamming,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM candidates GROUP BY 1
"""


@query("simhash_distance_histogram", SIMHASH_HIST_ORACLE)
def q_simhash_distance_histogram(spark, sf_dir):
    """Threshold calibration for SimHash near-dup: the full Hamming
    distribution over the band-candidate pairs — pick max_hamming
    where the histogram's near-dup mode separates from the random-pair
    bulk (the operational answer to "is 3 the right cutoff?"). Same
    banded candidate generation as the dedup path (the 100 TB shape:
    only (id, band_key) shuffles); the verify filter is simply not
    applied, so every candidate's distance lands in the histogram."""
    pairs = D.simhash_near_dup(
        load_table(spark, sf_dir, "documents"),
        max_hamming=D.SIMHASH_BITS,
    )
    return pairs.groupBy("hamming").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )


# -- edit-distance fuzzy join --------------------------------------------

_FUZZY_D = 3
_FUZZY_TITLE_LEN = 40

FUZZY_TITLE_ORACLE = f"""
    WITH t AS (
        SELECT doc_id, lang,
               substring(text, 1, {_FUZZY_TITLE_LEN}) AS title
        FROM documents
    )
    SELECT a.lang,
           a.doc_id AS doc_id_a,
           b.doc_id AS doc_id_b,
           CAST(levenshtein(a.title, b.title) AS BIGINT) AS dist
    FROM t a JOIN t b
      ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE abs(length(a.title) - length(b.title)) <= {_FUZZY_D}
      AND levenshtein(a.title, b.title) <= {_FUZZY_D}
"""


@query("fuzzy_title_pairs", FUZZY_TITLE_ORACLE)
def q_fuzzy_title_pairs(spark, sf_dir):
    """Within-language document pairs whose 40-char title prefixes are
    within edit distance 3 (operators/fuzzyjoin.py edit_distance_join)
    — the entity-resolution primitive for canonicalizing titles/URLs
    at corpus scale. Candidates come from a self-join on (lang,
    prefix q-gram) — the shuffle key is a gram, never a row pair —
    then banded Levenshtein verifies exactly, so the result is
    IDENTICAL to the O(N²) cross join the oracle runs; blocking
    changes data movement, never the answer. The corpus is ASCII, so
    Spark's codepoint Levenshtein and DuckDB's byte-based one agree
    (asserted structurally: titles are drawn from '\\S+' ASCII word
    text; a multibyte corpus would need a byte-identical key)."""
    from funding_monitoring_spark.operators.fuzzyjoin import (
        edit_distance_join,
    )

    docs = load_table(spark, sf_dir, "documents")
    titles = docs.select(
        "doc_id",
        "lang",
        F.substring(F.col("text"), 1, _FUZZY_TITLE_LEN).alias(
            "title"
        ),
    )
    # q=5 blocking (r14): gram size is an INTERNAL blocking knob —
    # the output is exact for any q (prefix principle), and 5-grams
    # discriminate where this corpus's 3-grams do not: candidate
    # pairs 1.67M -> 310k at sf0.1, output verified identical.
    return edit_distance_join(
        titles, "doc_id", "lang", "title", _FUZZY_D, q=5
    ).select("lang", "doc_id_a", "doc_id_b", "dist")


FUZZY_CLUSTERS_ORACLE = f"""
    WITH RECURSIVE t AS (
        SELECT doc_id, lang,
               substring(text, 1, {_FUZZY_TITLE_LEN}) AS title
        FROM documents
    ),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM t a JOIN t b
          ON a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE abs(length(a.title) - length(b.title)) <= {_FUZZY_D}
          AND levenshtein(a.title, b.title) <= {_FUZZY_D}
    ),
    edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION
        SELECT id_b AS u, id_a AS v FROM pairs
    ),
    reach(id, lbl) AS (
        SELECT u, u FROM edges
        UNION
        SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.id
    ),
    comp AS (SELECT id, MIN(lbl) AS cluster_id FROM reach GROUP BY id)
    SELECT d.doc_id,
           COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
           d.doc_id = COALESCE(c.cluster_id, d.doc_id) AS is_canonical
    FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
"""


@query("fuzzy_title_clusters", FUZZY_CLUSTERS_ORACLE)
def q_fuzzy_title_clusters(spark, sf_dir):
    """Entity-resolution end to end: fuzzy title pairs (prefix-filter
    blocking + banded Levenshtein, exact) feed connected components,
    and every document gets its canonical cluster representative (min
    doc_id survivor rule) — the same clustering contract as
    dedup_clusters, over an edit-distance graph instead of a Jaccard
    one. Transitivity is the point: titles A~B and B~C within
    distance 3 may sit 6 apart, and a record-linkage pipeline must
    still merge them; the recursive-CTE oracle value-checks the
    closure per document."""
    from funding_monitoring_spark.operators.fuzzyjoin import (
        edit_distance_clusters,
    )

    docs = load_table(spark, sf_dir, "documents")
    titles = docs.select(
        "doc_id",
        "lang",
        F.substring(F.col("text"), 1, _FUZZY_TITLE_LEN).alias(
            "title"
        ),
    )
    # r10 scale shape: exact-duplicate titles collapse to their
    # min-id representative BEFORE the fuzzy candidate space — a
    # viral duplicate group of k copies costs k membership rows + one
    # fuzzy node instead of C(k, 2) verified pairs (the r9 sf1 sweep
    # measured 2,948x pair growth at 10x data on the all-pairs form).
    # r11: connected components run over the QUOTIENT graph only
    # (representative pairs; members inherit by one broadcast join),
    # so the iterative CC never touches O(corpus) star edges.
    # Connectivity — hence the clustering and this oracle — is
    # identical.
    # q=5 blocking: see q_fuzzy_title_pairs (same exactness argument;
    # clusters verified identical at sf0.1)
    return edit_distance_clusters(
        titles, "doc_id", "lang", "title", _FUZZY_D, q=5
    ).select("doc_id", "cluster_id", "is_canonical")


_DAMERAU_D = 2

DAMERAU_TITLE_ORACLE = f"""
    WITH t AS (
        SELECT doc_id, lang,
               substring(text, 1, {_FUZZY_TITLE_LEN}) AS title
        FROM documents
    )
    SELECT a.lang,
           a.doc_id AS doc_id_a,
           b.doc_id AS doc_id_b,
           CAST(damerau_levenshtein(a.title, b.title) AS BIGINT)
               AS dist
    FROM t a JOIN t b
      ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE abs(length(a.title) - length(b.title)) <= {_DAMERAU_D}
      AND damerau_levenshtein(a.title, b.title) <= {_DAMERAU_D}
"""


@query("damerau_title_pairs", DAMERAU_TITLE_ORACLE)
def q_damerau_title_pairs(spark, sf_dir):
    """Within-language document pairs whose 40-char title prefixes
    are within TRUE Damerau-Levenshtein distance 2
    (operators/fuzzyjoin.damerau_join) — the record-linkage metric
    where a swapped character pair ("teh"/"the") is ONE edit, so the
    most common human typo class doesn't cost double. Candidates come
    from the same prefix-filter blocking as fuzzy_title_pairs with
    the transposition-aware d*(q+1)+1 gram budget; the exact
    Lowrance-Wagner DP verifies in one Arrow-batched pass over
    CANDIDATES only, so the result is identical to the O(N²) cross
    join the oracle runs with DuckDB's independent
    damerau_levenshtein (both sides unrestricted DL — probed on the
    'CA'/'ABC' discriminator, and pinned to each other in
    tests/test_fuzzyjoin.py). Same ASCII-corpus caveat as
    fuzzy_title_pairs."""
    from funding_monitoring_spark.operators.fuzzyjoin import (
        damerau_join,
    )

    docs = load_table(spark, sf_dir, "documents")
    titles = docs.select(
        "doc_id",
        "lang",
        F.substring(F.col("text"), 1, _FUZZY_TITLE_LEN).alias(
            "title"
        ),
    )
    # q=5 blocking: see q_fuzzy_title_pairs (transpositions touch at
    # most q+1 grams, so the p = d*(q+1)+1 prefix bound holds for any
    # q; output verified identical, warm wall 4.5 -> 3.0 s at sf0.1)
    return damerau_join(
        titles, "doc_id", "lang", "title", _DAMERAU_D, q=5
    ).select("lang", "doc_id_a", "doc_id_b", "dist")


INCR_MINHASH_SPLIT_MOD = 4  #: new batch = doc_id % 4 == 0


@query(
    "incremental_minhash_dedup",
    f"""
    WITH sigs AS (
        SELECT doc_id AS id, {_FPS} AS fps FROM documents
    ),
    mh AS (
        SELECT id, fps,
               {", ".join(f"{expr} AS s{j}" for j, expr in enumerate(_sql_minhash_sigs()))}
        FROM sigs
    ),
    banded AS (
        SELECT id, fps, unnest({_sql_band_keys()}) AS band_key FROM mh
    ),
    candidates AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM banded a JOIN banded b USING (band_key)
        WHERE a.id < b.id
    ),
    verified AS (
        SELECT c.id_a, c.id_b, sa.fps AS fps_a, sb.fps AS fps_b
        FROM candidates c
        JOIN sigs sa ON sa.id = c.id_a
        JOIN sigs sb ON sb.id = c.id_b
    )
    SELECT id_a, id_b, {_JACCARD} AS jaccard
    FROM verified
    WHERE {_JACCARD} >= {THRESHOLD}
      AND (id_a % {INCR_MINHASH_SPLIT_MOD} = 0
           OR id_b % {INCR_MINHASH_SPLIT_MOD} = 0)
    """,
)
def q_incremental_minhash_dedup(spark, sf_dir):
    """Incremental NEAR-dup detection — the MinHash twin of
    incremental_dedup's exact path, and the steady-state 100 TB
    shape: the historical corpus keeps a persisted signature store
    (id, shingle fps, MinHash sig), an arriving batch computes ONLY
    its own signatures and probes its band keys against the
    historical band index plus itself — the old corpus is never
    re-paired against itself. Equivalence to the full-corpus LSH
    join filtered to pairs with >= 1 new member is what the oracle
    checks (band collision is symmetric, so new-vs-all probing finds
    exactly those pairs). Fixture split: new batch = doc_id % 4 == 0,
    store = the rest."""
    docs = load_table(spark, sf_dir, "documents")
    is_new = (F.col("doc_id") % INCR_MINHASH_SPLIT_MOD) == 0
    store_sigs = D.minhash_signature_table(docs.filter(~is_new))
    new_sigs = D.minhash_signature_table(docs.filter(is_new))
    return D.minhash_lsh_pairs_incremental(
        new_sigs, store_sigs, threshold=THRESHOLD
    )
