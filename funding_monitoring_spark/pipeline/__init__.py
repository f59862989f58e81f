from funding_monitoring_spark.pipeline.funding_stats import (
    FUNDING_WINDOWS,
    funding_stats_query,
)

__all__ = ["FUNDING_WINDOWS", "funding_stats_query"]
