"""Unicode normalization as a distributed corpus operator.

A 100 TB crawl corpus is full of byte sequences that are canonically
equivalent but binary-distinct — decomposed combining sequences
(e + U+0301 vs é), compatibility ligatures (ﬁ vs fi), fullwidth
forms — and every downstream exact/near-dup, tokenization, and
fingerprinting stage silently fractures on them unless the corpus is
normalized first. The reference stack has no text-normalization
surface (its payloads are numeric market data); this module is part
of the LLM-training-data extension surface, alongside
operators/textstats.py.

Spark has NO built-in Unicode normalizer (`F.normalize` does not
exist; `unbase64`/`encode` don't touch canonical equivalence), so the
operator is a 1:1 Arrow-batched mapInPandas over Python's
``unicodedata`` — the stdlib's NFC/NFKC/NFD/NFKD tables, the same
Unicode character database DuckDB's ``nfc_normalize`` is built on
(the differential oracle cross-checks the two implementations on
every row). Scale shape: a narrow per-row projection, no shuffle at
any corpus size; it pipelines with the parquet scan exactly like the
codec stages in operators/multimodal.py.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
import pyspark.sql.types as T

_FORMS = ("NFC", "NFKC", "NFD", "NFKD")


def with_unicode_normalized(
    df: DataFrame,
    col: str,
    out_col: str,
    form: str = "NFC",
    casefold: bool = False,
) -> DataFrame:
    """Append ``out_col`` = ``unicodedata.normalize(form, col)``
    (optionally casefolded after normalizing — the NFKC_Casefold-ish
    composition used for identifier/key canonicalization). NULL in,
    NULL out. One Arrow-batched mapInPandas; the input schema passes
    through unchanged with the new string column appended."""
    if form not in _FORMS:
        raise ValueError(
            f"unicode normalization form {form!r} not in {_FORMS}"
        )
    if out_col in df.columns:
        raise ValueError(f"output column {out_col!r} already exists")

    from funding_monitoring_spark.operators.multimodal import (
        register_module_by_value,
    )

    register_module_by_value(__name__)

    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.StringType())]
    )

    def run(batches: Iterator) -> Iterator:
        import unicodedata

        for pdf in batches:
            def norm(s):
                if s is None:
                    return None
                out = unicodedata.normalize(form, s)
                return out.casefold() if casefold else out

            pdf = pdf.copy()
            pdf[out_col] = pdf[col].map(norm)
            yield pdf

    return df.mapInPandas(run, schema=schema)
