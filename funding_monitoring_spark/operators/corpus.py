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
    top = (
        base.select(id_col, F.explode("__bigrams").alias("bigram"))
        .groupBy(id_col, "bigram")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(
            F.max("c").alias("top_n"),
            F.sum("c").alias("total_bigrams"),
        )
    )
    joined = base.drop("__bigrams").join(top, on=id_col, how="left")
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
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df, on="term")
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
    grams = docs.select(
        F.col(id_col),
        eval_pred.alias("__is_eval"),
        F.explode(shingle_fingerprints(text_col)).alias("gram"),
    )
    eval_grams = (
        grams.filter(F.col("__is_eval")).select("gram").distinct()
    )
    train = grams.filter(~F.col("__is_eval"))
    # shingle_fingerprints is distinct per doc, so count(*) == n grams
    per_doc = train.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    hits = (
        train.join(F.broadcast(eval_grams), on="gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared_grams"))
    )
    return hits.join(per_doc, on=id_col).select(
        id_col,
        "n_shared_grams",
        "n_grams",
        F.round(F.col("n_shared_grams") / F.col("n_grams"), 6).alias(
            "contamination_rate"
        ),
    )
