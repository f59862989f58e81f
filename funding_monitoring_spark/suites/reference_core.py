"""Core reference-surface queries (SURVEY.md §2) with DuckDB oracles."""

from __future__ import annotations

from funding_monitoring_spark.pipeline.funding_stats import (
    funding_stats_oracle_sql,
    funding_stats_query,
)
from funding_monitoring_spark.registry import query


@query("funding_stats", funding_stats_oracle_sql())
def q_funding_stats(spark, sf_dir):
    """Flagship: F4 filter → A3/A4/F5 guarded window stats → J1 join →
    C12 annualize → P4 projection (funding_stats_etl.py:63-128)."""
    return funding_stats_query(spark, sf_dir)
