"""Query suites: importing this package registers every query/oracle
pair with funding_monitoring_spark.registry."""

from funding_monitoring_spark.suites import (  # noqa: F401
    batch_ops,
    pipeline_parity,
    reference_core,
)
