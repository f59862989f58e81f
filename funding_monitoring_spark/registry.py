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
#: which queries get an external correctness row this round.
#:
#: Rotation schedule (documented commitment; max row age <= 2 rounds):
#:   r1 window: the 50 batch/dedup/olap/parity/sampling queries.
#:   r2 window: TPC-H, temporal, streaming, ANN, text, window families
#:              plus all round-2 first-wave queries (50/50 green).
#:   r3 window (this list): (a) the 13 late-round-2 queries owed their
#:       FIRST driver row, (b) the two approx sketches whose last
#:       driver word was the r1 FAIL — now re-shaped into
#:       deterministic within-bound form so hash_match is meaningful,
#:       (c) queries NEW in round 3, then (d) the oldest r1-verified
#:       rows, starting with those whose underlying code changed since
#:       r1 (operators/rolling.py, upsert.py, functions/scalars.py,
#:       operators/skew.py, components.py, multimodal.py).
#:   r4+ plan: remaining r1 rows not refreshed here (sampling, paging
#:       snapshots, set ops), then r2 rows in registration order.
_PRIORITY: list[str] = [
    # (a) owed a first driver row since late round 2 (13)
    "stream_cdc_materialize",
    "pagerank_trading_graph",
    "hopping_window_rollup",
    "trailing_time_features",
    "tpch_q8_market_share",
    "multimodal_bmp_roundtrip",
    "term_posting_lists",
    "ngram_novelty",
    "embedding_quantize_int8",
    "sequence_packing_plan",
    "expectation_audit",
    "stream_hopping_rollup",
    "jsonl_quarantine",
    # (b) sketches re-shaped to hash-checkable within-bound form (2)
    "approx_distinct_users",
    "approx_quantiles_events",
    # (c) new in round 3 (first driver row)
    "multimodal_png_roundtrip",
    "sequence_packing_sharded",
    "salted_join_agg",
    "dedup_clusters_star",
    # (d) oldest r1 rows over since-changed code first
    "group_count_guard",
    "latest_per_group",
    "dedup_keys",
    "upsert_merge",
    "scalar_datetime_suite",
    "scalar_string_suite",
    "scalar_cast_annualize",
    "snake_case_rename",
    "funding_stats",
    "sql_funding_stats",
    "salted_group_agg",
    "dedup_clusters",
    "multimodal_features",
    "multimodal_resize_pipeline",
    # (d cont.) remaining oldest r1 rows, registration order
    "exact_dedup",
    "minhash_lsh_dedup",
    "ngram_jaccard_dedup",
    "simhash_signatures",
    "simhash_near_dup",
    "futures_snapshot",
    "spot_pairs_snapshot",
    "lending_pipeline",
    "json_extract",
    "nested_json_explode",
    "full_outer_reconciliation",
    "pivot_status_by_priority",
    "unpivot_part_attrs",
    "cube_revenue",
    "set_intersect_nations",
    "set_except_nations",
    "embedding_centroids",
]
# ^ exactly 50 entries. Owed a FIRST driver row at the head of round
# 4's rotation (registered late in round 3, after the window filled):
# tpch_q2_min_cost_supplier, tpch_q9_profit_by_nation_year,
# tpch_q11_important_parts, tpch_q16_supplier_variety,
# tpch_q20_excess_suppliers, tpch_q21_waiting_suppliers,
# embedding_covariance, window_distribution_suite, cap_per_source,
# asof_join_forward, grouping_sets_revenue, multimodal_wav_roundtrip,
# multimodal_avi_framesample, jsonl_file_source, tsv_file_source.
# Then still carrying an r1-only driver row (refresh in r4):
# value_percentiles, keep_list_projection, drop_column,
# filter_suffix, filter_equality, filter_time_range, group_min,
# rollup_totals, distinct_values, existence_probe, broadcast_join_dim,
# semi_join_universe, sort_limit, topk_per_group, union_append,
# hash_sample_documents, stratified_sample_by_lang.


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
