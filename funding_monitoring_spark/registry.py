"""Query + oracle registry: the single source of truth mapping
SURVEY.md §2 operator IDs to (PySpark query, DuckDB oracle SQL) pairs.

Each entry is registered with @query(name, sql) where sql is the
ANSI-SQL twin DuckDB runs on the same parquet views. Column names are
aliased identically on both sides (the driver hashes values after
sorting columns by name). Entries whose semantics are not
SQL-expressible register with sql=None → rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, sql: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if sql is not None:
            _ORACLES[name] = sql
        return fn

    return deco


#: Driver-verification priority. The per-round differential driver
#: checks only the FIRST 50 entries of queries(), so ordering decides
#: which queries get an external correctness row this round. Round 1
#: verified the 50 batch/dedup/parity/sampling queries; this round the
#: previously-unchecked families (TPC-H, temporal, streaming,
#: similarity, text, window) plus every query new in round 2 go first,
#: so cumulative driver coverage reaches the whole registry. Rotate in
#: future rounds so no query's driver row goes stale.
_PRIORITY: list[str] = [
    # TPC-H family (15)
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q7_nation_volume",
    "tpch_q10_returned_items",
    "tpch_q12_priority_classes",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_effect",
    "tpch_q15_top_supplier",
    "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_volume_customers",
    "tpch_q19_discounted_revenue",
    "tpch_q22_dormant_customers",
    # temporal (4)
    "asof_join_backward",
    "sessionize_events",
    "session_window_agg",
    "interval_join_attribution",
    # streaming (7)
    "stream_upsert_rates",
    "stream_tumbling_rollup",
    "stream_lending_append",
    "stream_ewma_stateful",
    "stream_funding_pipeline",
    "stream_stream_join_attribution",
    "stream_session_windows",
    # similarity / ANN (5)
    "ann_cosine_topk",
    "ann_cosine_topk_lsh",
    "ann_cosine_topk_scale",
    "ann_cosine_topk_ivf",
    "embedding_near_dup",
    # text (5)
    "token_count",
    "doc_fingerprint",
    "text_quality",
    "lang_id",
    "curation_pipeline",
    "curation_pipeline_full",
    # window family + remaining round-1 stragglers (2)
    "window_functions_suite",
    "train_test_split_stats",
    # --- new in round 2 (each needs a first driver row) ---
    "embedding_near_dup_exact",
    "paged_backfill",
    "ann_cosine_topk_ivf_kmeans",
    "repetition_filter",
    "tfidf_top_terms",
    "test_set_contamination",
    "pii_redaction",
    "corpus_balance_report",
    "cdc_materialize",
    "event_transition_matrix",
    "winsorized_stats",
]
# ^ exactly 50 entries — the window is full. Registered later in
# round 2 and therefore owed their FIRST driver row at the head of
# round 3's rotation: stream_cdc_materialize, pagerank_trading_graph,
# hopping_window_rollup, trailing_time_features, tpch_q8_market_share,
# multimodal_bmp_roundtrip, term_posting_lists, ngram_novelty,
# embedding_quantize_int8, sequence_packing_plan, expectation_audit,
# stream_hopping_rollup, jsonl_quarantine.


def _ordered(d: dict) -> dict:
    head = {k: d[k] for k in _PRIORITY if k in d}
    tail = {k: v for k, v in d.items() if k not in head}
    return {**head, **tail}


def queries() -> dict[str, QueryFn]:
    _load_all()
    return _ordered(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return _ordered(_ORACLES)


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (import = register)."""
    global _LOADED
    if _LOADED:
        return
    from funding_monitoring_spark import suites  # noqa: F401

    _LOADED = True
