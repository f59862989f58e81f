"""Multimodal plumbing query: binary payload + mapInPandas feature
extraction. n_bytes/header_hex are oracle-checked against DuckDB blob
functions; the fake feature vector is dropped here (it is pinned by a
unit test instead — DuckDB 1.0 cannot fold over blob bytes)."""

from __future__ import annotations

from funding_monitoring_spark.operators.multimodal import (
    documents_as_media,
    extract_features,
)
from funding_monitoring_spark.registry import query
from funding_monitoring_spark.sources.tables import load_table


@query(
    "multimodal_features",
    """
    SELECT doc_id AS media_id,
           octet_length(encode(text)) AS n_bytes,
           lower(substring(hex(encode(text)), 1, 8)) AS header_hex
    FROM documents
    """,
)
def q_multimodal_features(spark, sf_dir):
    """Binary media column → Arrow-batched mapInPandas extraction
    (decode step is a deterministic fake; plumbing is real)."""
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return extract_features(media).select("media_id", "n_bytes", "header_hex")
