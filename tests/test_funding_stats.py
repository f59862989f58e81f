"""Flagship funding-stats query (SURVEY.md §3.2) vs the DuckDB oracle,
plus unit pins on its guarded-window edge semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from funding_monitoring_spark.operators.rolling import (
    guarded_recent_means,
    latest_per_group,
)
from funding_monitoring_spark.pipeline.funding_stats import (
    funding_stats_oracle_sql,
    funding_stats_query,
)
from tests.conftest import assert_matches_oracle


def test_funding_stats_matches_oracle(spark, sf_dir, duck):
    df = funding_stats_query(spark, sf_dir)
    assert_matches_oracle(df, duck, funding_stats_oracle_sql())


def _ts(day: int, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour)


def _history(spark):
    # symbol A: 4 rows; symbol B: 2 rows (fewer than N=3 → guard fires)
    rows = [
        ("A", _ts(1), 1.0, 1),
        ("A", _ts(2), 2.0, 2),
        ("A", _ts(3), 3.0, 3),
        ("A", _ts(4), 4.0, 4),
        ("B", _ts(1), 10.0, 5),
        ("B", _ts(2), 20.0, 6),
    ]
    return spark.createDataFrame(rows, "symbol string, t timestamp, v double, id long")


def test_guarded_mean_guard_fires_below_n(spark):
    out = guarded_recent_means(
        _history(spark),
        group_cols=["symbol"],
        time_col="t",
        value_col="v",
        windows={"m3": 3},
        tiebreak_cols=["id"],
    ).collect()
    by_sym = {r["symbol"]: r["m3"] for r in out}
    # A: mean of the 3 newest (4,3,2) = 3.0; B: only 2 rows → NULL not
    # a shorter-window mean (funding_stats_etl.py:86-97 semantics)
    assert by_sym["A"] == 3.0
    assert by_sym["B"] is None


def test_guarded_mean_latest_and_scale(spark):
    out = guarded_recent_means(
        _history(spark),
        group_cols=["symbol"],
        time_col="t",
        value_col="v",
        windows={},
        tiebreak_cols=["id"],
        scale=3 * 365,
        latest_col="f8h",
    ).collect()
    by_sym = {r["symbol"]: r["f8h"] for r in out}
    assert by_sym["A"] == 4.0 * 3 * 365
    assert by_sym["B"] == 20.0 * 3 * 365


def test_guarded_mean_tiebreak_on_equal_times(spark):
    rows = [
        ("A", _ts(1), 1.0, 1),
        ("A", _ts(1), 2.0, 2),  # same ts, higher id → this is "newest"
    ]
    df = spark.createDataFrame(rows, "symbol string, t timestamp, v double, id long")
    out = guarded_recent_means(
        df, ["symbol"], "t", "v", windows={}, tiebreak_cols=["id"], latest_col="last"
    ).collect()
    assert out[0]["last"] == 2.0


def test_latest_per_group(spark):
    out = latest_per_group(
        _history(spark), ["symbol"], "t", ["v"], tiebreak_cols=["id"]
    ).collect()
    by_sym = {r["symbol"]: r["v"] for r in out}
    assert by_sym == {"A": 4.0, "B": 20.0}


def test_funding_stats_null_windows_present(spark, sf_dir):
    # sf0.001 has ~13 rows/symbol → funding_90d (N=270) must be NULL,
    # and every symbol row still present (no crash-on-empty like the
    # reference's row-0 index, SURVEY.md §3.2).
    df = funding_stats_query(spark, sf_dir)
    rows = df.collect()
    assert len(rows) > 0
    assert all(r["funding_90d"] is None for r in rows)
    assert all(r["funding_8h"] is not None for r in rows)
