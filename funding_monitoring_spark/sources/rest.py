"""Live REST transport for the paged-source protocol — the adapter
seam the round-2 review called out as the one unmapped source surface.

The paging PROTOCOL (``read_paged``'s hasMore/endTime cursor walk,
sources/paged.py) is transport-agnostic; this module supplies the HTTP
half a live deployment needs: fetch a JSON page with an INJECTABLE
transport callable, dig the row list / continue flag out of the
payload by dotted path, shape rows into a DataFrame under an explicit
schema, and hand ``read_paged`` a standard ``PageFetcher``. Reference
protocol: scripts/funding_rates_etl.py:32-70 (``requests.get`` +
``hasMore``/``endTime``), scripts/active_futures_etl.py:15-20.

The default transport is stdlib urllib, exercised end-to-end against
a real loopback HTTP server in tests (the sandbox has no external
network); pagination, cursor advance, parameter threading,
boundary-duplicate dedup, and empty/short pages are additionally
tested with injected fake transports serving recorded payloads
(tests/test_paged.py). Swapping in requests/aiohttp changes one
callable.

Scale note: HTTP payloads necessarily land on the driver (that is the
reference's reality too); each page is bounded by the API's page size,
and the page frames are small createDataFrame batches that the
accumulated union keeps distributed. A backfill large enough to
matter writes pages straight to object storage and lets the batch
engine take over — this adapter is the polling-tick path, not a bulk
loader.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Mapping
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from funding_monitoring_spark.sources.paged import Page, PageFetcher

Transport = Callable[[str, Mapping[str, Any]], bytes]


def default_transport(url: str, params: Mapping[str, Any]) -> bytes:
    """stdlib GET: url?urlencode(params) → response bytes. Exercised
    over a real loopback socket in tests/test_paged.py (stdlib
    http.server serving recorded pages)."""
    from urllib.parse import urlencode
    from urllib.request import urlopen

    query = urlencode(dict(params))
    with urlopen(f"{url}?{query}" if query else url, timeout=30) as resp:
        return resp.read()


def _dig(payload: Any, dotted: str) -> Any:
    """Resolve a dotted path ('data.dataList') into a JSON payload;
    None when any hop is missing — a malformed page then fails loudly
    at the rows/flag checks rather than deep in createDataFrame."""
    cur = payload
    for hop in dotted.split("."):
        if not isinstance(cur, dict) or hop not in cur:
            return None
        cur = cur[hop]
    return cur


@dataclass
class RestPageConfig:
    """Where the protocol lives inside the HTTP payload.

    Defaults mirror the reference's funding-rate endpoint shape:
    rows at ``data.dataList``, continue flag at ``data.hasMore``,
    the oldest row's ``timePoint`` becomes the next ``endTime``."""

    url: str
    schema: T.StructType
    rows_path: str = "data.dataList"
    has_more_path: str = "data.hasMore"
    cursor_field: str = "timePoint"
    cursor_param: str = "endTime"
    base_params: dict[str, Any] = field(default_factory=dict)


def rest_page_fetcher(
    spark: SparkSession,
    cfg: RestPageConfig,
    transport: Transport = default_transport,
) -> PageFetcher:
    """A ``PageFetcher`` over a live hasMore/endTime REST endpoint —
    drive it with ``read_paged(fetcher, key_cols=..., order_cols=...)``
    and the inclusive-cursor boundary duplicates collapse exactly as
    with the fixture-backed pager."""

    def fetch(cursor: Any) -> Page:
        params = dict(cfg.base_params)
        if cursor is not None:
            params[cfg.cursor_param] = cursor
        payload = json.loads(transport(cfg.url, params).decode("utf-8"))
        rows = _dig(payload, cfg.rows_path)
        if rows is None:
            raise ValueError(
                f"rest_page_fetcher: no rows at {cfg.rows_path!r} in "
                f"payload from {cfg.url}"
            )
        has_more = bool(_dig(payload, cfg.has_more_path)) and bool(rows)
        df = spark.createDataFrame(rows, cfg.schema)
        next_cursor = (
            min(r[cfg.cursor_field] for r in rows) if rows else None
        )
        return Page(df=df, has_more=has_more, next_cursor=next_cursor)

    return fetch
