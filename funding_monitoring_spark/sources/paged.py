"""Iterative paged-source reads (SURVEY.md §2.1 S4 paging variant).

The reference's backfill protocol (funding_rates_etl.py:43-66,
commented-but-specified): fetch one page, read ``hasMore`` from the
payload, use the OLDEST row of the page as the next ``endTime``
cursor, append, repeat until ``hasMore`` is false, then dedupe —
the inclusive cursor re-fetches the boundary row, so accumulation
over-counts exactly at page edges.

Spark-first shape: each page is a lazily-declared DataFrame (for a
table-backed fetcher, a time-range filter that reaches the parquet
scan as a pushed-down predicate — the union of pages is a union of
partition-pruned scans, not N materialized collects). Only the paging
METADATA (has_more, next cursor) is resolved driver-side per page,
mirroring the reference reading the flag out of each HTTP response.
The accumulated result stays distributed end-to-end.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable, Sequence
from dataclasses import dataclass
from functools import reduce
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from funding_monitoring_spark.operators.upsert import dedupe_batch


@dataclass
class Page:
    """One fetched page: the rows, the continue flag, and the opaque
    cursor the next fetch should start from (the reference's
    ``endTime``)."""

    df: DataFrame
    has_more: bool
    next_cursor: Any


PageFetcher = Callable[[Any], Page]


def read_paged(
    fetch_page: PageFetcher,
    key_cols: Sequence[str] | None = None,
    order_cols: Sequence[str] | None = None,
    max_pages: int = 10_000,
) -> DataFrame:
    """Accumulate pages until ``has_more`` is false (reference while
    loop, funding_rates_etl.py:51-61): union every page's frame, then
    collapse the inclusive-cursor boundary duplicates on key_cols
    (max order_cols wins; boundary re-fetches are identical rows, so
    the winner is value-irrelevant — the dedupe only restores
    exactly-once multiplicity).

    max_pages is a fail-loud guard against a fetcher whose cursor
    fails to advance (the reference's unbounded loop trusts the API;
    a production backfill should not).
    """
    pages: list[DataFrame] = []
    cursor: Any = None
    has_more = True
    while has_more:
        if len(pages) >= max_pages:
            raise RuntimeError(
                f"read_paged: exceeded max_pages={max_pages}; "
                f"cursor stuck at {cursor!r}?"
            )
        page = fetch_page(cursor)
        pages.append(page.df)
        has_more, cursor = page.has_more, page.next_cursor
    out = reduce(DataFrame.unionByName, pages)
    if key_cols:
        out = dedupe_batch(out, key_cols, list(order_cols or key_cols))
    return out


def time_window_page_fetcher(
    table: DataFrame,
    ts_col: str,
    window: dt.timedelta,
    stop_at: dt.datetime | None = None,
) -> PageFetcher:
    """Fixture-backed pager over a time-ordered table, newest first —
    the shape of the reference's funding-rates API: page i covers
    ``[cursor - window, cursor]`` with INCLUSIVE bounds (the cursor row
    itself is re-served at the top of the next page, reproducing the
    protocol's boundary duplicate), cursor advances to the page's
    oldest covered instant, ``has_more`` while older data (above
    stop_at) remains.

    Cursor faithfulness: the next cursor is the OLDEST ROW's timestamp
    in the page (the reference reads it out of the payload's last
    element, funding_rates_etl.py:59), so the row(s) at the cursor are
    guaranteed re-served at the top of the next page — the protocol's
    boundary duplicate that read_paged's dedupe must remove. Resolving
    it costs one tiny min() aggregate per page (the payload-read
    analogue); a cursor that fails to advance (all page rows at one
    instant narrower than the window) trips read_paged's max_pages
    guard rather than looping silently.

    The table's (min, max) timestamps are resolved once up front — the
    analogue of the reference's "is the table empty / what's the
    latest row" bootstrap query (funding_rates_etl.py:44-48).
    """
    lo_hi = table.agg(
        F.min(ts_col).alias("lo"), F.max(ts_col).alias("hi")
    ).collect()[0]
    floor = lo_hi["lo"] if stop_at is None else max(lo_hi["lo"], stop_at)

    def fetch(cursor: Any) -> Page:
        hi = lo_hi["hi"] if cursor is None else cursor
        lo = hi - window
        df = table.filter(
            (F.col(ts_col) >= F.lit(lo)) & (F.col(ts_col) <= F.lit(hi))
        )
        oldest = df.agg(F.min(ts_col)).collect()[0][0]
        has_more = oldest is not None and oldest > floor
        return Page(df=df, has_more=has_more, next_cursor=oldest)

    return fetch
