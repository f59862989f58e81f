"""Query + oracle registry: the single source of truth mapping
SURVEY.md §2 operator IDs to (PySpark query, DuckDB oracle SQL) pairs.

Each entry is registered with @query(name, sql) where sql is the
ANSI-SQL twin DuckDB runs on the same parquet views. Column names are
aliased identically on both sides (the driver hashes values after
sorting columns by name). Entries whose semantics are not
SQL-expressible register with sql=None → rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, sql: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if sql is not None:
            _ORACLES[name] = sql
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (import = register)."""
    global _LOADED
    if _LOADED:
        return
    from funding_monitoring_spark import suites  # noqa: F401

    _LOADED = True
