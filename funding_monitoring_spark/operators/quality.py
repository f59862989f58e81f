"""Data contracts: declarative constraint checks with a violations
report.

The reference trusts its upstream blindly — a malformed KuCoin payload
lands in Postgres as-is (funding_rates_etl.py inserts whatever the
JSON parse yields). A 100 TB ingest can't: constraints are declared
once and validated per batch, and the report (rule, violation count,
pass flag) gates the pipeline. This is the Spark-first reduction of
the expectations pattern (dbt tests / Great Expectations):

- Row-predicate rules (not_null, range, accepted_values, custom
  predicate) FUSE INTO ONE SCAN — each becomes a conditional sum in a
  single agg, so checking 20 contracts costs one pass, not 20.
- ``unique`` needs its own aggregate (distinct keys ≠ row predicate):
  one hash-aggregate per declared key set, counting rows in excess of
  their key's first.
- ``foreign_key`` is a left-anti join against the dimension's key
  projection — broadcast when the dimension is small (Catalyst/AQE
  decides), the same shape as the semi-join universe operator.

Violation counts are exact, so the report is oracle-checkable; the
operator returns a DataFrame (never collects), letting callers join
it, store it per batch, or alert on ``passed = 0`` rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> dict:
    return {"rule": f"not_null({col})", "kind": "pred",
            "pred": F.col(col).isNull()}


def in_range(col: str, lo, hi) -> dict:
    """Violated when the value is NULL or outside [lo, hi] — a NULL
    silently passing a range check is the classic contract hole."""
    c = F.col(col)
    return {
        "rule": f"range({col},[{lo},{hi}])",
        "kind": "pred",
        "pred": c.isNull() | (c < F.lit(lo)) | (c > F.lit(hi)),
    }


def accepted_values(col: str, values: list) -> dict:
    c = F.col(col)
    return {
        "rule": f"accepted_values({col})",
        "kind": "pred",
        "pred": c.isNull() | ~c.isin(values),
    }


def predicate(name: str, violated_when: Column) -> dict:
    """Escape hatch: any boolean Column, true = violation."""
    return {"rule": name, "kind": "pred", "pred": violated_when}


def unique(cols: list[str]) -> dict:
    return {"rule": f"unique({','.join(cols)})", "kind": "unique",
            "cols": cols}


def foreign_key(
    cols: list[str], dim: DataFrame, dim_cols: list[str]
) -> dict:
    return {
        "rule": f"foreign_key({','.join(cols)})",
        "kind": "fk",
        "cols": cols,
        "dim": dim,
        "dim_cols": dim_cols,
    }


def check_constraints(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Validate ``df`` against ``rules``; returns one row per rule:
    (rule string, n_violations bigint, passed int), in the declared
    rule order via an explicit ordinal (the report is tiny — order is
    for humans; equality checks should sort).

    Cost model: all pred-kind rules share ONE scan (a single agg of
    conditional sums, map-side combined); each unique() adds one
    hash-aggregate on its key set; each foreign_key() adds one
    left-anti join (broadcastable dimension). NULL foreign keys count
    as violations — declare the column nullable via a custom
    predicate instead if NULLs are sanctioned."""
    spark = df.sparkSession
    if not rules:
        return spark.createDataFrame(
            [], "rule string, n_violations long, passed int"
        )
    # EVERY rule kind now folds into ONE scan of df (guide §2.4 —
    # the old shape paid one extra full pass per unique() and per
    # foreign_key()):
    # - fk: a left join against the dim's DISTINCT key projection is
    #   row-preserving, so "no match" becomes a NULL marker column
    #   and the orphan count one more conditional sum (NULL fact keys
    #   never match, exactly like the anti join);
    # - unique: violations = count(*) − countDistinct(struct(cols)).
    #   The struct wrapper is the null-safe form — a struct is never
    #   NULL even when its fields are, so all-NULL / partial-NULL key
    #   tuples count as distinct groups exactly as the old
    #   groupBy(*cols) did.
    joined = df
    aggs: list[Column] = []
    for i, r in enumerate(rules):
        if r["kind"] == "pred":
            aggs.append(
                F.sum(r["pred"].cast("long")).alias(f"__v{i}")
            )
        elif r["kind"] == "unique":
            aggs.append(
                (
                    F.count(F.lit(1))
                    - F.countDistinct(F.struct(*r["cols"]))
                ).alias(f"__v{i}")
            )
        elif r["kind"] == "fk":
            marker = f"__fk{i}"
            dim_keys = (
                r["dim"]
                .select(
                    *[
                        F.col(d).alias(c)
                        for c, d in zip(r["cols"], r["dim_cols"])
                    ]
                )
                .dropDuplicates()
                .withColumn(marker, F.lit(1))
            )
            joined = joined.join(dim_keys, on=r["cols"], how="left")
            aggs.append(
                F.sum(F.col(marker).isNull().cast("long")).alias(
                    f"__v{i}"
                )
            )
    fused = joined.agg(*aggs)
    structs = F.array(
        *[
            F.struct(
                F.lit(r["rule"]).alias("rule"),
                F.coalesce(F.col(f"__v{i}"), F.lit(0))
                .cast("long")
                .alias("n_violations"),
            )
            for i, r in enumerate(rules)
        ]
    )
    # inline() preserves the declared rule order within the single
    # output row — no ordinal sort needed
    return fused.select(F.inline(structs)).withColumn(
        "passed", (F.col("n_violations") == 0).cast("int")
    )
