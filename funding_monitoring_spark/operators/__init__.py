from funding_monitoring_spark.operators.rolling import (
    guarded_recent_means,
    latest_per_group,
)
from funding_monitoring_spark.operators.topk import top_k_per_group
from funding_monitoring_spark.operators.upsert import upsert

__all__ = [
    "guarded_recent_means",
    "latest_per_group",
    "top_k_per_group",
    "upsert",
]
