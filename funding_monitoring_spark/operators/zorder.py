"""Z-order (Morton) clustering for multi-dimensional data skipping.

Partition pruning (sources/layout.py) cuts one dimension; real
workloads filter on two. Sorting the write by a Z-VALUE — the bitwise
interleave of both key columns — makes every output file a small
rectangle in (x, y) space, so the parquet min/max footer statistics
prune files for predicates on EITHER column (the layout trick behind
lakehouse OPTIMIZE ZORDER BY; public technique, e.g. Morton 1966).

The interleave is the classic shift-or-mask bit spread — pure integer
column algebra (shiftleft / bitwiseAND / bitwiseOR), codegen'd, no
UDF, reproducible bit-for-bit in any engine (the differential oracle
recomputes it in SQL). Writing clustered data is then just

    df.repartitionByRange(n, z).sortWithinPartitions(z).write...

— a single range exchange; the files come out z-contiguous.
`tests/test_layout.py` measures the claim: per-file [min, max] spans
on BOTH dimensions shrink by an order of magnitude vs the unordered
layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (shift, mask) ladder spreading a 16-bit int's bits to even
#: positions of a 32-bit lane: x = (x | x<<s) & m, top-down
_SPREAD = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)
BITS = 16
_DIM_MASK = (1 << BITS) - 1


def spread_bits(col: Column) -> Column:
    """Spread the low 16 bits of ``col`` to even bit positions
    (b15..b0 → positions 30, 28, ..., 0)."""
    x = col.cast("bigint").bitwiseAND(F.lit(_DIM_MASK))
    for shift, mask in _SPREAD:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def z_value(x: Column, y: Column) -> Column:
    """Morton interleave of two 16-bit-bounded non-negative ints:
    x takes even bits, y odd. Inputs are masked to 16 bits (callers
    quantize/normalize first — e.g. ``pmod(key, 65536)`` or a
    bucketed timestamp)."""
    return spread_bits(x).bitwiseOR(F.shiftleft(spread_bits(y), 1))


def oracle_spread_sql(expr: str) -> str:
    """DuckDB twin of spread_bits — the same shift-or-mask ladder."""
    e = f"(({expr}) & {_DIM_MASK})"
    for shift, mask in _SPREAD:
        e = f"((({e} | ({e} << {shift})) & {mask}))"
    return e


def oracle_z_sql(x_expr: str, y_expr: str) -> str:
    return (
        f"({oracle_spread_sql(x_expr)} | "
        f"({oracle_spread_sql(y_expr)} << 1))"
    )


def write_zordered(
    df: DataFrame,
    path: str,
    x: Column,
    y: Column,
    n_files: int = 8,
) -> None:
    """Write ``df`` as ``n_files`` z-clustered parquet files: one
    range exchange on the z-value, sorted within partitions so each
    file covers a compact Morton-curve segment (= a small rectangle
    in (x, y), = tight min/max stats on both columns)."""
    if "__z" in df.columns:
        raise ValueError("write_zordered reserves the column name '__z'")
    z = z_value(x, y).alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
