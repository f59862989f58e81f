"""Paged-source reader: protocol mechanics the full-scan oracle can't
isolate — page count, the inclusive-cursor boundary duplicate, partial
backfill (stop_at), and the stuck-cursor guard."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from funding_monitoring_spark.sources.paged import (
    Page,
    read_paged,
    time_window_page_fetcher,
)

T0 = dt.datetime(2024, 1, 1)


def _table(spark, hours):
    rows = [(i, T0 + dt.timedelta(hours=h), float(i)) for i, h in enumerate(hours)]
    return spark.createDataFrame(rows, "event_id long, ts timestamp, value double")


def _counting(fetch):
    calls = []

    def wrapped(cursor):
        page = fetch(cursor)
        calls.append(cursor)
        return page

    return wrapped, calls


def test_multi_page_accumulate_equals_full_scan(spark):
    # 10 rows over 9 hours, 2h window -> ~5 pages
    df = _table(spark, range(10))
    fetch, calls = _counting(
        time_window_page_fetcher(df, "ts", dt.timedelta(hours=2))
    )
    out = read_paged(fetch, key_cols=["event_id"], order_cols=["ts"])
    assert sorted(r.event_id for r in out.collect()) == list(range(10))
    assert len(calls) >= 4  # genuinely iterative, not one big page


def test_boundary_row_served_twice_then_deduped(spark):
    df = _table(spark, [0, 2, 4])  # rows exactly at window edges
    fetch = time_window_page_fetcher(df, "ts", dt.timedelta(hours=2))
    raw = read_paged(fetch)  # no dedup: keep the protocol's duplicates
    deduped = read_paged(fetch, key_cols=["event_id"], order_cols=["ts"])
    assert raw.count() > 3  # the cursor row re-arrived at least once
    assert deduped.count() == 3


def test_stop_at_limits_backfill_depth(spark):
    df = _table(spark, range(10))
    fetch = time_window_page_fetcher(
        df, "ts", dt.timedelta(hours=2), stop_at=T0 + dt.timedelta(hours=5)
    )
    out = read_paged(fetch, key_cols=["event_id"], order_cols=["ts"])
    got = sorted(r.event_id for r in out.collect())
    # backfill stops once the cursor reaches the floor; everything at or
    # after hour 5 must be present, nothing is required below the floor
    assert set(range(5, 10)) <= set(got)
    assert min(got) >= 3  # never pages a full window past the floor


def test_stuck_cursor_trips_max_pages(spark):
    df = _table(spark, [0])

    def stuck(cursor):
        return Page(df=df, has_more=True, next_cursor=cursor)

    with pytest.raises(RuntimeError, match="max_pages"):
        read_paged(stuck, max_pages=5)
