"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship funding-stats query on sf0.001 (smoke).
queries()     — one callable per implemented operator (SURVEY.md §2).
oracle_sql()  — DuckDB twin per query for the differential oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from funding_monitoring_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from funding_monitoring_spark.pipeline.funding_stats import funding_stats_query

    return funding_stats_query(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
