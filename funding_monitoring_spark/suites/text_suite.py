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


def _lang_id_sql() -> str:
    scores = {lang: _sql_lang_score(lang) for lang in ("en", "de", "fr", "es", "zh")}
    best = "GREATEST(" + ", ".join(scores.values()) + ")"
    whens = "\n".join(
        f"WHEN {best} > 0 AND {scores[lang]} = {best} THEN '{lang}'"
        for lang in ("en", "de", "fr", "es", "zh")
    )
    return (
        "SELECT doc_id, lang AS labeled_lang, "
        f"CASE {whens} ELSE 'und' END AS detected_lang FROM documents"
    )


@query("lang_id", _lang_id_sql())
def q_lang_id(spark, sf_dir):
    """Marker-word language-ID heuristic with fixed tie priority."""
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        X.lang_id("text").alias("detected_lang"),
    )
