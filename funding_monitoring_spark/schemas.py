"""Explicit schemas: the 5 reference tables + the 10 fixture tables.

Reference schemas transcribed from the SQLAlchemy models at
reference scripts/models.py:14-79 (see SURVEY.md §1.2), mapped per
SURVEY.md §1.5: DateTime→TimestampType, Float→DoubleType,
Integer→IntegerType, String→StringType, time-of-day→StringType
(Spark has no TIME type; the reference stores it as text anyway).

Fixture schemas match the driver-generated parquet at
/root/testdata/sf*/ (FIXTURES.md §A).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Reference tables (models.py:14-79)
# --------------------------------------------------------------------------

#: models.py:14-20 — time series, composite key (created_at, loan_duration_days)
LENDING_RATES = T.StructType(
    [
        T.StructField("created_at", T.TimestampType(), False),
        T.StructField("daily_interest_rate", T.DoubleType(), False),
        T.StructField("loan_duration_days", T.IntegerType(), False),
        T.StructField("annualized_interest_rate", T.DoubleType(), False),
    ]
)

#: models.py:23-43 — snapshot dimension, key symbol (18 columns)
ACTIVE_FUTURES = T.StructType(
    [
        T.StructField("symbol", T.StringType(), False),
        T.StructField("first_open_date", T.TimestampType(), True),
        T.StructField("base_currency", T.StringType(), True),
        T.StructField("quote_currency", T.StringType(), True),
        T.StructField("tick_size", T.DoubleType(), True),
        T.StructField("initial_margin", T.DoubleType(), True),
        T.StructField("maintain_margin", T.DoubleType(), True),
        T.StructField("max_risk_limit", T.IntegerType(), True),
        T.StructField("min_risk_limit", T.IntegerType(), True),
        T.StructField("futures_maker_fee", T.DoubleType(), True),
        T.StructField("futures_taker_fee", T.DoubleType(), True),
        T.StructField("funding_fee_rate", T.DoubleType(), True),
        T.StructField("predicted_funding_fee_rate", T.DoubleType(), True),
        T.StructField("open_interest", T.IntegerType(), True),
        T.StructField("futures_dollar_volume_24h", T.DoubleType(), True),
        T.StructField("futures_unit_volume_24h", T.DoubleType(), True),
        # time-of-day stored as text in the reference (models.py:42)
        T.StructField("time_to_next_funding_rate", T.StringType(), True),
        T.StructField("max_leverage", T.IntegerType(), True),
    ]
)

#: models.py:46-55 — snapshot dimension, key symbol
ACTIVE_SPOT_PAIRS = T.StructType(
    [
        T.StructField("symbol", T.StringType(), False),
        T.StructField("spot_unit_volume24h", T.DoubleType(), True),
        T.StructField("spot_dollar_volume24h", T.DoubleType(), True),
        T.StructField("spot_taker_fee", T.DoubleType(), True),
        T.StructField("spot_maker_fee", T.DoubleType(), True),
        T.StructField("base_currency", T.StringType(), True),
        T.StructField("quote_currency", T.StringType(), True),
    ]
)

#: models.py:58-64 — core time series, composite key (symbol, funding_time)
FUNDING_RATES = T.StructType(
    [
        T.StructField("symbol", T.StringType(), False),
        # time-of-day serialized as text in the reference (models.py:62)
        T.StructField("funding_period", T.StringType(), True),
        T.StructField("funding_time", T.TimestampType(), False),
        T.StructField("funding_rate", T.DoubleType(), True),
    ]
)

#: models.py:67-79 — derived analytics snapshot, key symbol. We follow the
#: runtime schema (funding_stats_etl.py:105-118 names the volume column
#: dollar_volume_24h; to_sql replace-mode makes the frame schema win).
FUNDING_STATS = T.StructType(
    [
        T.StructField("symbol", T.StringType(), False),
        T.StructField("dollar_volume_24h", T.DoubleType(), True),
        T.StructField("predicted_funding_rate", T.DoubleType(), True),
        T.StructField("funding_8h", T.DoubleType(), True),
        T.StructField("funding_24h", T.DoubleType(), True),
        T.StructField("funding_3d", T.DoubleType(), True),
        T.StructField("funding_7d", T.DoubleType(), True),
        T.StructField("funding_14d", T.DoubleType(), True),
        T.StructField("funding_30d", T.DoubleType(), True),
        T.StructField("funding_90d", T.DoubleType(), True),
    ]
)

REFERENCE_TABLES: dict[str, T.StructType] = {
    "kucoin_lending_rates": LENDING_RATES,
    "kucoin_active_futures": ACTIVE_FUTURES,
    "kucoin_active_spot_pairs": ACTIVE_SPOT_PAIRS,
    "kucoin_funding_rates": FUNDING_RATES,
    "kucoin_funding_stats": FUNDING_STATS,
}

# --------------------------------------------------------------------------
# Fixture tables (/root/testdata/sf*/; FIXTURES.md §A)
# --------------------------------------------------------------------------

FIXTURE_TABLES: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}
