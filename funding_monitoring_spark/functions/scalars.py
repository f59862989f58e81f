"""Scalar function library (SURVEY.md §2.8, C1-C17).

Everything here is a thin, named composition of built-in
``pyspark.sql.functions`` — JVM-side, codegen-friendly, no Python UDFs.
The reference implemented these as element-wise pandas lambdas; every
one collapses to a vectorized builtin (SURVEY.md §2.10).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Sessions per day × days per year — the reference annualizes 8-hour
# funding rates as rate*3*365 (funding_stats_etl.py:77-80,92-95,102-104).
FUNDING_SESSIONS_PER_DAY = 3
DAYS_PER_YEAR = 365

_CAMEL_BOUNDARY = re.compile(r"(?<!^)(?=[A-Z])")


def let(bound: Column, body) -> Column:
    """Single-evaluation let-binding for column expressions.

    Catalyst duplicates a sub-expression everywhere it is referenced
    (projection collapsing inlines aliases), so an expensive expression
    used N times is *evaluated* N times per row. Wrapping it as the
    sole element of an array and applying ``transform`` binds the
    evaluated value to a lambda variable — the body can then reference
    it any number of times at zero extra cost. JVM-side, no UDF.

    ``let(expensive, lambda v: f(v, v, v))`` evaluates ``expensive``
    exactly once per row.
    """
    return F.get(F.transform(F.array(bound), body), 0)


def camel_to_snake(name: str) -> str:
    """camelCase → snake_case (same regex as active_futures_etl.py:60)."""
    return _CAMEL_BOUNDARY.sub("_", name).lower()


def snake_case_columns(df: DataFrame) -> DataFrame:
    """Schema-normalization pass (SURVEY.md §2.2 P7/C4): rename every
    column camelCase→snake_case. Driver-side rename — zero execution cost."""
    return df.toDF(*[camel_to_snake(c) for c in df.columns])


def epoch_ms_to_ts(col: Column | str) -> Column:
    """Epoch-milliseconds → timestamp (C6; pd.to_datetime(unit='ms')
    at funding_rates_etl.py:87)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_millis(c.cast("long"))


def time_of_day(col: Column | str) -> Column:
    """Timestamp → 'HH:mm:ss' string (C7). The reference stores
    time-of-day as text (models.py:42,62); Spark has no TIME type, so
    string is the faithful representation."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "HH:mm:ss")


def trunc_seconds(col: Column | str) -> Column:
    """Drop sub-second precision (C8; t.replace(microsecond=0))."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_trunc("second", c)


def ceil_to_interval(col: Column | str, interval_seconds: int = 300) -> Column:
    """Ceiling-round a timestamp to the NEXT interval boundary (C10).

    The reference always advances to the next 5-minute boundary, even
    when the input is already aligned (lending_data_etl.py:54-60:
    ``(ts_ns // ns5min + 1) * ns5min`` — the +1 is unconditional).
    """
    c = F.col(col) if isinstance(col, str) else col
    secs = F.floor(F.unix_timestamp(c) / interval_seconds) + 1
    return F.timestamp_seconds(secs * interval_seconds)


def annualize_funding(col: Column | str) -> Column:
    """8h funding rate → APR: ×3×365 (C12)."""
    c = F.col(col) if isinstance(col, str) else col
    return c * FUNDING_SESSIONS_PER_DAY * DAYS_PER_YEAR


def annualize_daily(col: Column | str) -> Column:
    """Daily rate → APR: ×365 (C13; lending_data_etl.py:47-50)."""
    c = F.col(col) if isinstance(col, str) else col
    return c * DAYS_PER_YEAR


def nan_to_null(df: DataFrame, *cols: str) -> DataFrame:
    """Normalize float NaN → SQL NULL (SURVEY.md §1.5).

    pandas uses np.NaN as its null sentinel (funding_stats_etl.py:97);
    in Spark NaN and NULL are distinct values with different
    group-by/join/comparison semantics, so ingestion normalizes.
    Applies to the named double columns, or every double column if none
    are named.
    """
    targets = list(cols) or [
        f.name for f in df.schema.fields if f.dataType.typeName() == "double"
    ]
    out = df
    for name in targets:
        out = out.withColumn(
            name, F.when(F.isnan(F.col(name)), F.lit(None)).otherwise(F.col(name))
        )
    return out
