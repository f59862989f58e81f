"""Physical table layout for scale: date partitioning and bucketing.

At 100 TB the two levers that remove whole categories of work are:

- **Partition pruning**: fact tables laid out as
  ``table/event_date=YYYY-MM-DD/*.parquet``. A time-range predicate
  then prunes directories BEFORE file listing — the dominant cost of
  the reference's 120-day lookback scan disappears at the catalog
  level (`PartitionFilters` in the scan, asserted in
  tests/test_layout.py).
- **Bucketing**: pre-shuffling both sides of a recurring equi-join
  into the same bucket layout (``bucketBy(n, key)``) makes the join
  exchange-free — each task reads matching buckets. This is the
  Spark analogue of the co-located joins the reference gets
  implicitly from Postgres-side indexes.

The fixture tables are single parquet files (TESTDATA.md); these
helpers produce the scaled layouts from them and are exercised by
tests, not by the oracle queries (same data, different physical plan).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_date_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str,
    partition_col: str = "event_date",
) -> None:
    """Materialize df partitioned by the date of ts_col. Readers that
    filter on ts_col should also filter on the partition column (or
    derive predicates with `date_bounds_filter`) to get pruning."""
    (
        df.withColumn(partition_col, F.to_date(F.col(ts_col)))
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(path)
    )


def date_bounds_filter(
    ts_lo: str | None, ts_hi: str | None, partition_col: str = "event_date"
):
    """Partition-level predicate matching a timestamp range: dates are
    day-granular, so [lo, hi] on timestamps widens to
    [date(lo), date(hi)] on the partition column — safe (never prunes
    a matching row) and prunable (pure partition-column predicate)."""
    preds = []
    if ts_lo is not None:
        preds.append(F.col(partition_col) >= F.to_date(F.lit(ts_lo)))
    if ts_hi is not None:
        preds.append(F.col(partition_col) <= F.to_date(F.lit(ts_hi)))
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


def write_bucketed_table(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 8,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Save df as a bucketed (and optionally sorted) managed table.
    Joining two tables bucketed the same way on the bucket columns
    plans with zero Exchange (see tests/test_layout.py)."""
    writer = df.write.mode("overwrite").bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
