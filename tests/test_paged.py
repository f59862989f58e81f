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


# -- REST transport adapter (sources/rest.py) ------------------------------


def _rest_fixture_pages():
    """Three recorded pages, newest-first, with the protocol's
    inclusive-cursor boundary duplicate: each page's oldest row is
    re-served at the top of the next page."""
    rows = [
        {"symbol": "XBTUSDTM", "timePoint": t, "value": 0.01 * t}
        for t in range(100, 90, -1)  # 100..91, newest first
    ]
    return [rows[0:4], rows[3:7], rows[6:10]]  # overlap at 97 and 94


def _fake_transport(calls):
    pages = _rest_fixture_pages()

    def transport(url, params):
        import json as _json

        calls.append(dict(params))
        if "endTime" not in params:
            idx = 0
        else:
            # the cursor is the previous page's oldest timePoint
            idx = {97: 1, 94: 2}[params["endTime"]]
        return _json.dumps(
            {
                "code": "200000",
                "data": {
                    "hasMore": idx < 2,
                    "dataList": pages[idx],
                },
            }
        ).encode()

    return transport


def _rest_cfg():
    from pyspark.sql import types as T

    from funding_monitoring_spark.sources.rest import RestPageConfig

    return RestPageConfig(
        url="https://api.example.test/funding-history",
        schema=T.StructType(
            [
                T.StructField("symbol", T.StringType()),
                T.StructField("timePoint", T.LongType()),
                T.StructField("value", T.DoubleType()),
            ]
        ),
        base_params={"symbol": "XBTUSDTM"},
    )


def test_rest_pager_full_protocol_exactly_once(spark):
    """The full live-protocol walk with an injected transport: three
    pages, boundary duplicates collapsed, every distinct row exactly
    once, cursor and base params threaded into each request."""
    from funding_monitoring_spark.sources.paged import read_paged
    from funding_monitoring_spark.sources.rest import rest_page_fetcher

    calls = []
    fetcher = rest_page_fetcher(spark, _rest_cfg(), _fake_transport(calls))
    out = read_paged(
        fetcher, key_cols=["symbol", "timePoint"], order_cols=["timePoint"]
    )
    got = sorted(r["timePoint"] for r in out.collect())
    assert got == list(range(91, 101))  # exactly once each
    assert len(calls) == 3
    assert all(c["symbol"] == "XBTUSDTM" for c in calls)
    assert "endTime" not in calls[0]
    assert calls[1]["endTime"] == 97 and calls[2]["endTime"] == 94


def test_rest_pager_default_transport_over_real_socket(spark):
    """The SAME protocol walk through default_transport against a real
    HTTP server (stdlib http.server on loopback serving the recorded
    pages): urlencoded params arrive on the wire, the cursor advances,
    boundary duplicates collapse — no fake transport anywhere."""
    import http.server
    import threading
    from urllib.parse import parse_qs, urlparse

    from funding_monitoring_spark.sources.paged import read_paged
    from funding_monitoring_spark.sources.rest import (
        default_transport,
        rest_page_fetcher,
    )

    pages = _rest_fixture_pages()
    seen = []

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            import json as _json

            q = {
                k: v[0] for k, v in parse_qs(urlparse(self.path).query).items()
            }
            seen.append(q)
            idx = (
                0
                if "endTime" not in q
                else {"97": 1, "94": 2}[q["endTime"]]
            )
            body = _json.dumps(
                {
                    "code": "200000",
                    "data": {"hasMore": idx < 2, "dataList": pages[idx]},
                }
            ).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # keep pytest output clean
            pass

    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        cfg = _rest_cfg()
        cfg.url = f"http://127.0.0.1:{server.server_address[1]}/funding"
        fetcher = rest_page_fetcher(spark, cfg, default_transport)
        out = read_paged(
            fetcher,
            key_cols=["symbol", "timePoint"],
            order_cols=["timePoint"],
        )
        got = sorted(r["timePoint"] for r in out.collect())
    finally:
        server.shutdown()
        server.server_close()
    assert got == list(range(91, 101))
    assert len(seen) == 3
    assert all(c["symbol"] == "XBTUSDTM" for c in seen)
    assert "endTime" not in seen[0]
    assert seen[1]["endTime"] == "97" and seen[2]["endTime"] == "94"


def test_rest_pager_malformed_payload_fails_loudly(spark):
    from funding_monitoring_spark.sources.rest import rest_page_fetcher

    def bad_transport(url, params):
        return b'{"code": "200000", "data": {}}'

    fetcher = rest_page_fetcher(spark, _rest_cfg(), bad_transport)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no rows"):
        fetcher(None)


def test_rest_pager_empty_last_page_terminates(spark):
    """An empty page with hasMore=true must still terminate (the flag
    is ANDed with row presence) instead of looping on a None cursor."""
    from funding_monitoring_spark.sources.rest import rest_page_fetcher

    def empty_transport(url, params):
        return (
            b'{"code": "200000", '
            b'"data": {"hasMore": true, "dataList": []}}'
        )

    page = rest_page_fetcher(spark, _rest_cfg(), empty_transport)(None)
    assert page.has_more is False and page.next_cursor is None
    assert page.df.count() == 0
