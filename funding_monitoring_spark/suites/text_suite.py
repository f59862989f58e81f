"""Text-analysis queries over the documents fixture, each with an
exact DuckDB oracle (tokenizer/hash/score formulas are generated from
the same Python constants on both sides)."""

from __future__ import annotations

from pyspark.sql import functions as F

from funding_monitoring_spark.operators import textstats as X
from funding_monitoring_spark.registry import query
from funding_monitoring_spark.sources.tables import load_table

# --- shared SQL fragments (kept in lockstep with operators/textstats.py)

_SQL_TOKENS = r"regexp_extract_all(text, '\S+')"
_SQL_PUNCT = r"""len(regexp_extract_all(text, '[.,;:!?''"()\-]'))"""


def _sql_lang_score(lang: str) -> str:
    if lang == "zh":
        return r"len(regexp_extract_all(text, '[一-鿿]'))"
    words = ", ".join(f"'{w}'" for w in X.LANG_MARKERS[lang])
    return (
        f"len(list_filter({_SQL_TOKENS}, "
        f"t -> list_contains([{words}], lower(t))))"
    )


def _sql_stop_ratio() -> str:
    words = ", ".join(f"'{w}'" for w in X.LANG_MARKERS["en"])
    return (
        f"CASE WHEN len({_SQL_TOKENS}) > 0 THEN "
        f"len(list_filter({_SQL_TOKENS}, t -> list_contains([{words}], "
        f"lower(t)))) / len({_SQL_TOKENS}) ELSE 0.0 END"
    )


@query(
    "token_count",
    f"SELECT doc_id, len({_SQL_TOKENS}) AS n_tokens, "
    "length(text) AS n_chars_measured FROM documents",
)
def q_token_count(spark, sf_dir):
    """Whitespace + regex token counting (north-star text analysis)."""
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        X.token_count("text").alias("n_tokens"),
        F.length("text").alias("n_chars_measured"),
    )


@query(
    "doc_fingerprint",
    f"""
    SELECT doc_id,
           list_reduce(
               list_prepend(CAST({X.POLY_INIT} AS BIGINT),
                   list_transform(string_split(text, ''),
                                  ch -> CAST(ascii(ch) AS BIGINT))),
               (acc, x) -> (acc * {X.POLY_MULT} + x) % {X.POLY_MOD}
           ) AS fingerprint
    FROM documents
    """,
)
def q_doc_fingerprint(spark, sf_dir):
    """Rolling polynomial document fingerprint (Rabin-Karp style),
    JVM-side via higher-order functions."""
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", X.poly_fingerprint("text").alias("fingerprint")
    )


@query(
    "text_quality",
    f"""
    SELECT doc_id,
           ROUND(
             LEAST(1.0, len({_SQL_TOKENS}) / 100.0) * 0.5
           + (1.0 - LEAST(1.0,
                CASE WHEN length(text) > 0
                     THEN {_SQL_PUNCT} / length(text) ELSE 0.0 END * 5)) * 0.3
           + LEAST(1.0, ({_sql_stop_ratio()}) * 5) * 0.2,
           6) AS quality
    FROM documents
    """,
)
def q_text_quality(spark, sf_dir):
    """Length/punctuation/stopword quality heuristic in [0,1]."""
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", F.round(X.quality_score("text"), 6).alias("quality")
    )


def _lang_case_expr() -> str:
    """CASE expression computing the argmax language over `text`."""
    scores = {lang: _sql_lang_score(lang) for lang in ("en", "de", "fr", "es", "zh")}
    best = "GREATEST(" + ", ".join(scores.values()) + ")"
    whens = "\n".join(
        f"WHEN {best} > 0 AND {scores[lang]} = {best} THEN '{lang}'"
        for lang in ("en", "de", "fr", "es", "zh")
    )
    return f"CASE {whens} ELSE 'und' END"


_QUALITY_EXPR = f"""ROUND(
             LEAST(1.0, len({_SQL_TOKENS}) / 100.0) * 0.5
           + (1.0 - LEAST(1.0,
                CASE WHEN length(text) > 0
                     THEN {_SQL_PUNCT} / length(text) ELSE 0.0 END * 5)) * 0.3
           + LEAST(1.0, ({_sql_stop_ratio()}) * 5) * 0.2,
           6)"""


@query(
    "lang_id",
    "SELECT doc_id, lang AS labeled_lang, "
    f"{_lang_case_expr()} AS detected_lang FROM documents",
)
def q_lang_id(spark, sf_dir):
    """Marker-word language-ID heuristic with fixed tie priority."""
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        X.lang_id("text").alias("detected_lang"),
    )


# -- composite: the end-to-end curation pipeline -------------------------

MIN_TOKENS = 30
MIN_QUALITY = 0.5


@query(
    "curation_pipeline",
    f"""
    WITH enriched AS (
        SELECT doc_id, text,
               len({_SQL_TOKENS}) AS n_tokens,
               {_QUALITY_EXPR} AS quality,
               {_lang_case_expr()} AS detected_lang
        FROM documents
    ),
    filtered AS (
        SELECT * FROM enriched
        WHERE n_tokens >= {MIN_TOKENS}
          AND quality >= {MIN_QUALITY}
          AND detected_lang = 'en'
    ),
    canon AS (
        SELECT MIN(doc_id) AS doc_id FROM filtered GROUP BY md5(text)
    )
    SELECT f.doc_id, f.n_tokens, f.quality, f.detected_lang
    FROM filtered f JOIN canon USING (doc_id)
    """,
)
def q_curation_pipeline(spark, sf_dir):
    """End-to-end training-data curation: enrich (token count, quality
    score, language ID — one narrow projection, no shuffle) → filter →
    exact dedup keeping the canonical (min-id) copy. The only shuffle
    is the dedup groupBy on the md5 digest; the filters run BEFORE it,
    so at 100 TB the shuffle carries only the curated survivors."""
    docs = load_table(spark, sf_dir, "documents")
    enriched = docs.select(
        "doc_id",
        "text",
        X.token_count("text").alias("n_tokens"),
        F.round(X.quality_score("text"), 6).alias("quality"),
        X.lang_id("text").alias("detected_lang"),
    )
    filtered = enriched.filter(
        (F.col("n_tokens") >= MIN_TOKENS)
        & (F.col("quality") >= MIN_QUALITY)
        & (F.col("detected_lang") == "en")
    )
    canon = filtered.groupBy(F.md5("text")).agg(
        F.min("doc_id").alias("doc_id")
    )
    return filtered.join(
        canon.select("doc_id"), on="doc_id", how="left_semi"
    ).select("doc_id", "n_tokens", "quality", "detected_lang")
