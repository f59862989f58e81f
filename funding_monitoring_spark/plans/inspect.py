"""Physical-plan inspection: the feedback loop for scale tuning.

`.explain("formatted")` prints; these return strings/structures so
plan properties can be asserted programmatically — the engine's
plan-quality gates (tests/test_plans.py) are built on them. The
properties that matter at 100 TB: are filters pushed to the scan, is
the read schema pruned, do dims broadcast, how many exchanges does a
pipeline need.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "simple") -> str:
    """The query execution plan as a string (mode: simple | extended |
    formatted | codegen | cost)."""
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def _full_plan_string(df: DataFrame) -> str:
    """plan_string with scan metadata untruncated (PushedFilters /
    ReadSchema are cut at spark.sql.maxMetadataStringLength=100 by
    default, which hides columns from the audits below)."""
    conf = df.sparkSession.conf
    key = "spark.sql.maxMetadataStringLength"
    prev = conf.get(key)
    conf.set(key, "100000")
    try:
        # .alias() yields a fresh Dataset (the SubqueryAlias optimizes
        # away) so the plan — and the scan's metadata string, which is
        # memoized per physical plan — is rebuilt under the raised limit
        return plan_string(df.alias("__plan_audit"))
    finally:
        conf.set(key, prev)


def count_exchanges(df: DataFrame, kind: str = "hashpartitioning") -> int:
    """Number of shuffle exchanges of a given kind in the plan. The
    shuffle audit: every hashpartitioning exchange is a full
    repartition of its input — at 100 TB, count them and justify each."""
    return len(re.findall(rf"Exchange {kind}", plan_string(df)))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_string(df)


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters pushed into parquet scans (empty list = nothing pushed —
    a red flag for any selective query)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", _full_plan_string(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[set[str]]:
    """Column sets actually read by each scan (column-pruning audit:
    a scan reading all columns for a 2-column projection is wrong)."""
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", _full_plan_string(df)):
        out.append(set(re.findall(r"(\w+):", m.group(1))))
    return out
