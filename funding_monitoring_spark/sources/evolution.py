"""Schema-on-read for evolving stores.

A table written continuously for months accumulates GENERATIONS of
files: columns get added, ints get widened. Spark's parquet reader
handles the union shape (``mergeSchema``), but downstream operators
need one STABLE schema — this module reads the union and aligns it to
a caller-declared target: missing columns materialize as typed NULLs,
compatible type drift (int→long, float→double, …) casts explicitly,
and column order is pinned. Two enforcement levels: the parquet
reader (``read_evolving_parquet``) treats the declared target as the
caller's projection contract — columns outside it are pruned by the
scan, exactly like any explicit-schema read — while the
DataFrame-level aligner (``align_to_schema``) additionally REJECTS
unknown extra columns loudly by default (a silently dropped column
is how data quietly goes missing) unless ``allow_extra`` opts in to
pruning them. Both fail loudly on narrowing drift.

Scale notes: ``mergeSchema`` reconciles footers only (one metadata
pass, no data); the alignment projection is column pruning + casts in
the scan — no shuffle, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: widenings that are always value-preserving (never truncate):
#: every source value round-trips exactly (int < 2^31 fits a double's
#: 53-bit mantissa; float→double is an exact embedding). Keys are
#: Spark ``simpleString`` names — "tinyint"/"smallint"/"bigint", NOT
#: the DDL aliases byte/short/long (a property test caught int→long
#: being rejected because the table was keyed on the aliases).
_SAFE_WIDENINGS: dict[tuple[str, str], bool] = {
    ("tinyint", "smallint"): True,
    ("tinyint", "int"): True,
    ("tinyint", "bigint"): True,
    ("smallint", "int"): True,
    ("smallint", "bigint"): True,
    ("int", "bigint"): True,
    ("float", "double"): True,
    ("int", "double"): True,
    ("date", "timestamp"): True,
}

#: Spark-compatible widenings that can LOSE precision: long→double
#: silently rounds integers above 2^53 (large ids corrupt). The
#: vectorized parquet reader performs these without complaint, but
#: align_to_schema requires the explicit ``allow_lossy`` opt-in —
#: "schema surprises should fail the job, not corrupt the data"
#: includes this one.
_LOSSY_WIDENINGS: dict[tuple[str, str], bool] = {
    ("bigint", "double"): True,
}


def align_to_schema(
    df: DataFrame,
    target: T.StructType,
    allow_extra: bool = False,
    allow_lossy: bool = False,
) -> DataFrame:
    """Project df onto ``target``: add missing columns as typed
    NULLs, apply safe widening casts, pin column order. Raises on
    extra columns (unless allow_extra), on narrowing/incompatible
    type drift, and on precision-losing widenings like long→double
    (unless allow_lossy — doubles round integers above 2^53) —
    schema surprises should fail the job, not corrupt the data."""
    have = {f.name: f.dataType for f in df.schema.fields}
    want = {f.name: f.dataType for f in target.fields}
    extra = [c for c in have if c not in want]
    if extra and not allow_extra:
        raise ValueError(
            f"store has columns not in the target schema: {extra}; "
            "pass allow_extra=True to prune them deliberately"
        )
    cols = []
    for field in target.fields:
        name, want_t = field.name, field.dataType
        if name not in have:
            cols.append(F.lit(None).cast(want_t).alias(name))
            continue
        have_t = have[name]
        if have_t == want_t:
            cols.append(F.col(name))
            continue
        key = (have_t.simpleString(), want_t.simpleString())
        if _SAFE_WIDENINGS.get(key) or (
            allow_lossy and _LOSSY_WIDENINGS.get(key)
        ):
            cols.append(F.col(name).cast(want_t).alias(name))
            continue
        if _LOSSY_WIDENINGS.get(key):
            raise ValueError(
                f"column {name!r}: widening "
                f"{have_t.simpleString()}→{want_t.simpleString()} "
                "loses precision (doubles round above 2^53); pass "
                "allow_lossy=True to accept it deliberately"
            )
        raise ValueError(
            f"column {name!r}: stored type {have_t.simpleString()} "
            f"does not safely widen to {want_t.simpleString()}"
        )
    return df.select(*cols)


def read_evolving_parquet(
    spark: SparkSession,
    path: str,
    target: T.StructType,
) -> DataFrame:
    """Read a multi-generation parquet store at one STABLE schema by
    declaring ``target`` as the explicit read schema. Spark's parquet
    reader then does the per-file reconciliation: generation-1 files
    missing a later column scan with typed NULLs, safe physical
    widenings (INT32→long, FLOAT→double) convert in the vectorized
    reader, and NARROWING drift fails the scan loudly
    (PARQUET_COLUMN_DATA_TYPE_MISMATCH) instead of truncating.
    Columns outside the target are pruned by projection — the target
    IS the caller's declared contract. (``mergeSchema`` is the wrong
    tool here: it unions ADDED columns but refuses type drift
    outright, CANNOT_MERGE_SCHEMAS.)

    Caveat: the vectorized reader also performs long→double when the
    target declares it — a LOSSY conversion above 2^53 that this path
    cannot intercept (align_to_schema gates it behind allow_lossy);
    don't declare double targets over bigint id columns.

    Use align_to_schema for frames already loaded some other way —
    it applies the same policy at the DataFrame level, where unknown
    extras can also be rejected loudly."""
    return spark.read.schema(target).parquet(path)
