"""Query suites: importing this package registers every query/oracle
pair with funding_monitoring_spark.registry."""

from funding_monitoring_spark.suites import reference_core  # noqa: F401
