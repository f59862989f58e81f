from funding_monitoring_spark.functions.scalars import (
    annualize_daily,
    annualize_funding,
    camel_to_snake,
    ceil_to_interval,
    epoch_ms_to_ts,
    nan_to_null,
    snake_case_columns,
    time_of_day,
    trunc_seconds,
)

__all__ = [
    "annualize_daily",
    "annualize_funding",
    "camel_to_snake",
    "ceil_to_interval",
    "epoch_ms_to_ts",
    "nan_to_null",
    "snake_case_columns",
    "time_of_day",
    "trunc_seconds",
]
