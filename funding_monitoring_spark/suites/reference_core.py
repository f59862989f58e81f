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


@query("sql_funding_stats", funding_stats_oracle_sql())
def q_sql_funding_stats(spark, sf_dir):
    """The spark.sql entry surface (K6 temp view + pure SQL): the very
    same dialect-neutral SQL text runs through Spark SQL here and
    through DuckDB as the oracle — one source of truth, two engines,
    identical hashes. Also pins DataFrame-API ≡ SQL-API equivalence
    for the flagship (both must match the same oracle)."""
    from funding_monitoring_spark.sources.tables import load_table

    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(funding_stats_oracle_sql())
