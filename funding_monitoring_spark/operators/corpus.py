"""Corpus-level curation operators for training-data pipelines:
repetition filtering (Gopher-style), TF-IDF salient terms, and
test-set n-gram contamination detection.

These are DataFrame→DataFrame operators (they need joins/aggregations
across documents), unlike operators/textstats.py which is pure column
expressions. Everything stays JVM-side; every shuffle is keyed by
doc_id or a token/gram hash, so the plans scale horizontally: no
driver collects, no cross joins, no global windows over row-level
data.

Scale notes (100 TB):
- repetition_metrics shuffles (doc_id, bigram) pairs — cardinality is
  bounded by total token count, partial-aggregated map-side before the
  exchange, then reduced per doc_id. Skew equals the largest single
  document, not the corpus.
- tfidf_top_terms shuffles (doc_id, term) then (term); the document
  count joins in as a 1-row broadcast, and the per-doc top-k is a
  bounded window (k rows survive per doc).
- ngram_contamination broadcasts the (small) eval-set gram dictionary
  — the train side never shuffles at all; the only exchange is the
  final per-doc count aggregation. Grams travel as int64 fingerprints
  (operators/dedup.py machinery), never as strings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from funding_monitoring_spark.operators.dedup import shingle_fingerprints
from funding_monitoring_spark.operators.textstats import (
    distinct_token_ratio,
    token_count,
    word_bigrams,
)

#: Gopher-style repetition thresholds (Rae et al. 2021 use a family of
#: duplicate-n-gram-fraction rules; the exact cutoffs are corpus-tuned)
MAX_TOP_BIGRAM_FRACTION = 0.18
MIN_DISTINCT_TOKEN_RATIO = 0.4
#: the top-bigram rule is meaningless on short documents (with B
#: distinct bigrams the fraction is already 1/B), so it only applies
#: once a document has a meaningful bigram population
MIN_BIGRAMS_FOR_TOP_RULE = 20


def repetition_metrics(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition profile: distinct-token ratio and the
    fraction of bigram occurrences taken by the single most frequent
    bigram (high = the document loops over one phrase), plus the
    composite is_repetitive verdict.

    The bigram stage explodes the bigram multiset and aggregates by
    (doc, bigram) — map-side combinable, skew bounded by the largest
    document. Documents with <2 tokens have no bigrams: their top
    fraction is defined as 0.0 (nothing repeats).
    """
    base = docs.select(
        id_col,
        token_count(text_col).alias("n_tokens"),
        F.round(distinct_token_ratio(text_col), 6).alias("distinct_ratio"),
        word_bigrams(text_col).alias("__bigrams"),
    )
    # ONE corpus pass, no join-back (guide §2.4): the old shape
    # re-evaluated `base` on both sides of a left join (no subplan
    # reuse — the doc scan and both tokenize HOFs ran twice).
    # explode_outer keeps bigram-less documents (<2 tokens) as a NULL
    # bigram row, the per-doc scalars ride the two aggregations via
    # first(), and count/max over the BIGRAM column ignore the NULL
    # row — so top_n/total_bigrams are NULL for those docs exactly as
    # the left join produced.
    joined = (
        base.select(
            id_col,
            "n_tokens",
            "distinct_ratio",
            F.explode_outer("__bigrams").alias("bigram"),
        )
        .groupBy(id_col, "bigram")
        .agg(
            F.count("bigram").alias("c"),
            F.first("n_tokens").alias("n_tokens"),
            F.first("distinct_ratio").alias("distinct_ratio"),
        )
        .groupBy(id_col)
        .agg(
            F.first("n_tokens").alias("n_tokens"),
            F.first("distinct_ratio").alias("distinct_ratio"),
            F.max(
                F.when(F.col("bigram").isNotNull(), F.col("c"))
            ).alias("top_n"),
            F.sum(
                F.when(F.col("bigram").isNotNull(), F.col("c"))
            ).alias("total_bigrams"),
        )
    )
    top_frac = F.round(
        F.coalesce(F.col("top_n") / F.col("total_bigrams"), F.lit(0.0)), 6
    )
    return joined.select(
        id_col,
        "n_tokens",
        "distinct_ratio",
        top_frac.alias("top_bigram_fraction"),
        (
            (F.col("distinct_ratio") < MIN_DISTINCT_TOKEN_RATIO)
            | (
                (
                    F.coalesce(F.col("total_bigrams"), F.lit(0))
                    >= MIN_BIGRAMS_FOR_TOP_RULE
                )
                & (top_frac > MAX_TOP_BIGRAM_FRACTION)
            )
        )
        .cast("int")
        .alias("is_repetitive"),
    )


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-k salient terms per document by TF-IDF (tf × ln(N/df)).

    Document frequency comes from the (doc, term) aggregate itself, so
    each term string shuffles once; the corpus document count joins as
    a 1-row broadcast. Ranking uses the ROUNDED score (then term) so
    the order is reproducible across engines — float ulps in ln() can
    not flip ranks.
    """
    terms = docs.select(
        id_col, F.explode(F.regexp_extract_all(text_col, F.lit(r"(\S+)"), 1)).alias("term")
    )
    tf = terms.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    # df as a window-count over the term partition instead of a
    # groupBy + join back onto tf (guide §2.4): the join shape
    # evaluated the tokenize + tf aggregate on both sides (no subplan
    # reuse); the window counts the identical per-term row count
    # inside one term-keyed exchange.
    df = F.count("*").over(Window.partitionBy("term"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.withColumn("df", df)
        .join(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(id_col, "term", "tfidf", "rn")
    )


def ngram_contamination(
    docs: DataFrame,
    eval_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Train/eval contamination scan: which training documents share
    token-shingle n-grams with the held-out eval set, and how much.

    Both sides reduce text to the int64 shingle fingerprints from
    operators/dedup.py (distinct per document), so the comparison is
    an equi-join on longs. The eval gram dictionary is broadcast —
    the right design whenever the eval set ≪ corpus, which is the
    contamination use case — so the train scan never shuffles text OR
    grams; the only exchange is the final per-doc aggregation.

    Returns one row per contaminated train doc: the number of shared
    grams, the doc's total gram count, and the contamination rate.
    """
    # Each side shingles only ITS documents, once (guide §2.4): the
    # old shape shingled the WHOLE corpus into one frame and filtered
    # it three ways — with no subplan reuse the full shingle explode
    # evaluated three times. The eval dictionary now derives from the
    # (small) eval partition alone, and the train pass aggregates
    # total and shared counts in ONE groupBy over a broadcast left
    # join (map-side), so the train corpus is shingled exactly once.
    eval_grams = (
        docs.filter(eval_pred)
        .select(F.explode(shingle_fingerprints(text_col)).alias("gram"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    train = docs.filter(~eval_pred).select(
        F.col(id_col),
        F.explode(shingle_fingerprints(text_col)).alias("gram"),
    )
    # shingle_fingerprints is distinct per doc, so count(*) == n grams
    per_doc = (
        train.join(F.broadcast(eval_grams), on="gram", how="left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.count("__hit").alias("n_shared_grams"),
        )
    )
    return per_doc.filter(F.col("n_shared_grams") > 0).select(
        id_col,
        "n_shared_grams",
        "n_grams",
        F.round(F.col("n_shared_grams") / F.col("n_grams"), 6).alias(
            "contamination_rate"
        ),
    )


def containment_join(
    train: DataFrame,
    test: DataFrame,
    t_num: int,
    t_den: int,
    train_id: str = "train_id",
    test_id: str = "test_id",
    text_col: str = "text",
    max_pairs_per_gram: int = 10_000_000,
) -> DataFrame:
    """All (train, test) document pairs where the train document
    contains at least ``t_num/t_den`` of the test document's shingle
    set: |G_train ∩ G_test| / |G_test| >= t — the pairwise
    decontamination primitive (ngram_contamination above answers "how
    contaminated is this train doc overall"; this answers WHICH
    eval document leaked into it, the evidence an ablation needs).

    EXACT output via asymmetric prefix filtering (the containment
    variant of the SSJoin/PPJoin family, Chaudhuri et al. 2006 / Xiao
    et al. 2008): with overlap threshold o = ceil(t·|G_B|), any
    qualifying pair must share a gram within B's first
    |G_B| - o + 1 grams under ANY fixed global order (pigeonhole);
    ordering by ascending train-side document frequency just makes
    those prefixes rare-gram-biased. Candidates therefore come from
    an equi-join of the test-side PREFIX against the full train-side
    inverted index — the shuffle key is an int64 gram, never a pair —
    and the verify step computes the exact intersection from the two
    (bounded, per-document) gram arrays. The threshold is evaluated
    in INTEGER arithmetic (n_shared·t_den >= t_num·n_test) on both
    engines: an IEEE ceil(0.6·5) = ceil(3.0000000000000004) = 4
    boundary flip is exactly the kind of cross-engine hazard the
    repo's round-4 lessons document.

    ``max_pairs_per_gram`` guards the candidate product of one gram's
    train posting list × its test prefix postings — the quadratic
    failure mode when a stop-shingle floods both sides — and fails
    loudly with the offending gram (raise the bound deliberately, or
    pre-filter stop shingles).

    Returns (train_id, test_id, n_shared, n_test_grams, containment
    rounded to 6)."""
    from funding_monitoring_spark.operators.cachescope import (
        scoped_persist,
    )

    if not (0 < t_num <= t_den):
        raise ValueError(
            f"threshold {t_num}/{t_den} must be in (0, 1]"
        )
    # persisted: consumed by the gram-explode (inverted index) AND the
    # verify join — without the cache the train-side shingle fold (the
    # expensive tokenize+hash pass) runs twice (guide §2.4/§5)
    tr_arr = train.select(
        F.col(train_id).alias("_tid"),
        shingle_fingerprints(text_col).alias("_tg"),
    ).transform(scoped_persist)
    te_arr = test.select(
        F.col(test_id).alias("_eid"),
        shingle_fingerprints(text_col).alias("_eg"),
    ).transform(scoped_persist)

    tr_grams = tr_arr.select(
        "_tid", F.explode("_tg").alias("_gram")
    ).transform(scoped_persist)
    te_grams = te_arr.select(
        "_eid",
        F.size("_eg").alias("_n"),
        F.explode("_eg").alias("_gram"),
    )

    # o = ceil(t_num * n / t_den) in integers; prefix = n - o + 1
    o = (
        (F.col("_n") * t_num + (t_den - 1))
        / t_den
    ).cast("long")
    freq = tr_grams.groupBy("_gram").agg(
        F.count(F.lit(1)).alias("_gf")
    )
    w = Window.partitionBy("_eid").orderBy(
        F.col("_gf").asc_nulls_first(), F.col("_gram")
    )
    prefix = (
        te_grams.join(freq, "_gram", "left")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.col("_n") - o + 1)
        .select("_eid", "_gram")
        .transform(scoped_persist)
    )

    hot = (
        tr_grams.groupBy("_gram")
        .agg(F.count(F.lit(1)).alias("_tp"))
        .join(
            prefix.groupBy("_gram").agg(
                F.count(F.lit(1)).alias("_pp")
            ),
            "_gram",
        )
        .filter(
            F.col("_tp") * F.col("_pp") > max_pairs_per_gram
        )
        .limit(1)
        .collect()
    )
    if hot:
        r = hot[0]
        raise ValueError(
            f"containment_join gram {r._gram} joins {r._tp} train "
            f"postings x {r._pp} test prefix postings > "
            f"max_pairs_per_gram={max_pairs_per_gram}: a stop-shingle "
            "floods both sides — pre-filter it or raise the bound "
            "deliberately"
        )

    cands = (
        prefix.join(tr_grams, "_gram")
        .select("_tid", "_eid")
        .distinct()
    )
    verified = (
        cands.join(tr_arr, "_tid")
        .join(te_arr, "_eid")
        .select(
            "_tid",
            "_eid",
            F.size(F.array_intersect("_tg", "_eg")).alias(
                "_shared"
            ),
            F.size("_eg").alias("_n"),
        )
        .filter(
            F.col("_shared") * t_den >= F.col("_n") * t_num
        )
    )
    return verified.select(
        F.col("_tid").alias(train_id),
        F.col("_eid").alias(test_id),
        F.col("_shared").cast("bigint").alias("n_shared"),
        F.col("_n").cast("bigint").alias("n_test_grams"),
        F.round(
            F.col("_shared") / F.col("_n").cast("double"), 6
        ).alias("containment"),
    )


#: Robertson/Sparck-Jones BM25 constants (the standard defaults)
BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    docs: DataFrame,
    query_terms: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """BM25 ranked retrieval: the top-``k`` documents for a bag of
    query terms — the search primitive that turns term_posting_lists'
    inverted index into something a curation pipeline actually uses
    (retrieval-based dedup, eval-leak lookup, boilerplate hunting by
    example). ``query_terms`` is a 1-column ('term') DataFrame,
    broadcast — the corpus side never shuffles text: one (doc, term)
    tf aggregation, a broadcast semi-restriction to query terms, a
    per-doc sum and one bounded top-k window.

    idf = ln((N - df + 0.5)/(df + 0.5) + 1) (the non-negative BM25+
    flavor); per-term scores round at 9 digits BEFORE the per-doc sum
    so cross-engine float summation orders re-synchronize (the
    quality-classifier precedent), and the final score rounds at 6.
    Ties rank deterministically by (score desc, doc_id asc).

    Returns (rank, doc_id, n_hit_terms, score)."""
    from funding_monitoring_spark.operators.textstats import tokens

    from funding_monitoring_spark.operators.cachescope import (
        scoped_persist,
    )

    toks = docs.select(
        F.col(id_col),
        F.explode(tokens(text_col)).alias("term"),
    )
    # ONE corpus tokenize pass (guide §2.4): tf is persisted and every
    # other statistic derives from it — df is the per-term row count,
    # and dl = Σ_term tf (the token count per document, identical to
    # counting the raw token stream). The old shape re-tokenized the
    # corpus for each of tf/df/dl/stats (no subplan reuse), 4 passes.
    tf = scoped_persist(
        toks.groupBy(id_col, "term").agg(
            F.count(F.lit(1)).alias("tf")
        )
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum("dl").cast("double") / F.count(F.lit(1))
        ).alias("avgdl"),
    )
    hits = (
        tf.join(F.broadcast(query_terms.select("term")), "term")
        .join(F.broadcast(df_), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5)
        / (F.col("df") + 0.5)
        + 1.0
    )
    norm = F.col("tf") + k1 * (
        1.0 - b + b * F.col("dl") / F.col("avgdl")
    )
    term_score = F.round(
        idf * F.col("tf") * (k1 + 1.0) / norm, 9
    )
    scored = hits.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_hit_terms"),
        F.round(F.sum(term_score), 6).alias("score"),
    )
    # global top-k via TakeOrderedAndProject (per-partition heaps
    # merged on the driver — no full sort, SURVEY §7 #6); the rank
    # window then runs over only the k surviving rows
    top = scored.orderBy(
        F.col("score").desc(), F.col(id_col)
    ).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", id_col, "n_hit_terms", "score"
    )
