"""Oracle-checked queries for the deterministic sampling operators
(`operators/sampling.py`). The oracle runs the SAME integer hash in
DuckDB, so the differential check compares the actual sampled row
sets, not just their sizes — a wrong hash or an off-by-one threshold
flips the value hash immediately.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from funding_monitoring_spark.operators.sampling import (
    SAMPLE_MOD,
    hash_sample,
    hash_threshold,
    oracle_hash_expr,
    stratified_sample,
    train_test_split,
)
from funding_monitoring_spark.registry import query
from funding_monitoring_spark.sources.tables import load_table

SAMPLE_FRACTION = 0.2
SAMPLE_SEED = 7
STRATA_FRACTIONS = {"en": 0.1, "de": 0.5, "zh": 1.0}
STRATA_DEFAULT = 0.25
SPLIT_TRAIN_FRACTION = 0.8

_H = oracle_hash_expr("doc_id", SAMPLE_SEED)


@query(
    "hash_sample_documents",
    f"""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE {_H} < {hash_threshold(SAMPLE_FRACTION)}
    """,
)
def q_hash_sample(spark, sf_dir):
    """Deterministic 20% sample of documents — the predicate is a pure
    scalar on doc_id, evaluated in the scan stage (zero shuffle, zero
    state; identical membership on every run and engine)."""
    docs = load_table(spark, sf_dir, "documents")
    return hash_sample(docs, "doc_id", SAMPLE_FRACTION, SAMPLE_SEED).select(
        "doc_id", "lang", "source", "n_chars"
    )


@query(
    "stratified_sample_by_lang",
    f"""
    SELECT lang, COUNT(*) AS n_kept,
           CAST(MIN({_H}) AS BIGINT) AS min_hash
    FROM documents
    WHERE {_H} < CASE lang
                   WHEN 'zh' THEN {hash_threshold(STRATA_FRACTIONS["zh"])}
                   WHEN 'en' THEN {hash_threshold(STRATA_FRACTIONS["en"])}
                   WHEN 'de' THEN {hash_threshold(STRATA_FRACTIONS["de"])}
                   ELSE {hash_threshold(STRATA_DEFAULT)}
                 END
    GROUP BY lang
    """,
)
def q_stratified_sample(spark, sf_dir):
    """Language rebalancing: keep 10% of the dominant language, all of
    the rare one — per-stratum thresholds via a CASE over the strata
    column, still a scan-stage predicate."""
    docs = load_table(spark, sf_dir, "documents")
    kept = stratified_sample(
        docs, "lang", "doc_id", STRATA_FRACTIONS, STRATA_DEFAULT, SAMPLE_SEED
    )
    from funding_monitoring_spark.operators.sampling import key_hash

    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.min(key_hash(F.col("doc_id"), SAMPLE_SEED)).alias("min_hash"),
    )


@query(
    "train_test_split_stats",
    f"""
    SELECT CASE WHEN {_H} < {hash_threshold(SPLIT_TRAIN_FRACTION)}
                THEN 'train' ELSE 'test' END AS split,
           lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY split, lang
    """,
)
def q_train_test_split(spark, sf_dir):
    """Exact keyspace partition into train/test with per-language
    volume stats — every doc in exactly one side, stable across runs;
    disjointness is asserted in tests/test_sampling.py."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        train_test_split(docs, "doc_id", SPLIT_TRAIN_FRACTION, SAMPLE_SEED)
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


_UH = oracle_hash_expr("user_id", SAMPLE_SEED)


@query(
    "grouped_split_leakage_report",
    f"""
    WITH tagged AS (
        SELECT *,
               CASE WHEN {_UH} < {hash_threshold(SPLIT_TRAIN_FRACTION)}
                    THEN 'train' ELSE 'test' END AS split
        FROM events
    ),
    leak AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS leaked_users FROM (
            SELECT user_id FROM tagged
            GROUP BY user_id HAVING COUNT(DISTINCT split) > 1
        )
    )
    SELECT split,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           (SELECT leaked_users FROM leak) AS leaked_users
    FROM tagged GROUP BY split
    """,
)
def q_grouped_split_leakage_report(spark, sf_dir):
    """GROUP-level train/test split — the ML leakage guard a row-level
    split misses: splitting events by event hash puts one user's
    history on both sides, so a model trains on the very users it is
    evaluated on. Here the split key is the GROUP (user_id hash):
    every event of a user lands on exactly one side by construction,
    and the report MEASURES it rather than assuming it — leaked_users
    counts users observed in both splits via an actual aggregation
    (hash-verified 0 on both engines), next to per-split user/event
    volumes. Still a scan-stage predicate: zero shuffle for the
    split itself, one aggregation for the report."""
    from funding_monitoring_spark.operators.sampling import key_hash

    ev = load_table(spark, sf_dir, "events")
    tagged = ev.withColumn(
        "split",
        F.when(
            key_hash(F.col("user_id"), SAMPLE_SEED)
            < hash_threshold(SPLIT_TRAIN_FRACTION),
            F.lit("train"),
        ).otherwise(F.lit("test")),
    )
    leak = (
        tagged.groupBy("user_id")
        .agg(F.countDistinct("split").alias("n_sides"))
        .filter(F.col("n_sides") > 1)
        .agg(F.count(F.lit(1)).alias("leaked_users"))
    )
    return (
        tagged.groupBy("split")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .crossJoin(F.broadcast(leak))
    )


N_FOLDS = 5


@query(
    "kfold_split_stats",
    f"""
    SELECT CAST(({_H}) % {N_FOLDS} AS INT) AS fold,
           lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    GROUP BY 1, 2
    """,
)
def q_kfold_split_stats(spark, sf_dir):
    """Deterministic k-fold assignment audited per (fold, language):
    fold = key_hash(doc_id) mod 5, a pure scan-stage partition of the
    keyspace — stable across engines and corpus growth, no RNG state
    to manage per executor. The per-fold per-language doc and char
    counts hash against the oracle's identical integer algebra, so a
    single row assigned to a different fold breaks the row; balance
    across folds is visible in the report rather than assumed."""
    from funding_monitoring_spark.operators.sampling import (
        kfold_assign,
    )

    docs = load_table(spark, sf_dir, "documents")
    return (
        kfold_assign(docs, "doc_id", N_FOLDS, seed=SAMPLE_SEED)
        .groupBy("fold", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


# -- weighted (priority) sampling ----------------------------------------

_WPS_K = 20


@query(
    "weighted_sample_priority",
    f"""
    WITH pri AS (
        SELECT lang, doc_id, n_chars,
               CAST(n_chars AS DOUBLE)
               / (CAST(({_H}) + 1 AS DOUBLE) / {float(SAMPLE_MOD)})
                   AS p
        FROM documents
    ),
    ranked AS (
        SELECT lang, doc_id, n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY lang ORDER BY p DESC, doc_id
               ) AS sample_rank
        FROM pri
    )
    SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(sample_rank AS BIGINT) AS sample_rank
    FROM ranked WHERE sample_rank <= {_WPS_K}
    """,
)
def q_weighted_sample_priority(spark, sf_dir):
    """Weight-proportional sample of 20 docs per language, weighted by
    document length (operators/sampling.py weighted_priority_sample):
    priority sampling keeps the k largest w/u priorities with u a
    deterministic uniform from the key hash — longer documents are
    proportionally likelier, yet membership stays a pure function of
    the data (resumable, auditable, bit-identical across engines; the
    oracle checks the SAMPLED ROWS, not a count). Chosen over A-ES
    exponential keys because w/u needs no transcendental function —
    the two IEEE divisions are exactly reproducible in any engine;
    pow/log implementations are not guaranteed to be."""
    from funding_monitoring_spark.operators.sampling import (
        weighted_priority_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    return weighted_priority_sample(
        docs, "lang", "doc_id", "n_chars", _WPS_K, seed=SAMPLE_SEED
    ).select("lang", "doc_id", "n_chars", "sample_rank")
