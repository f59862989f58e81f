from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from funding_monitoring_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="fm_spark_tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Order-insensitive canonical form mirroring the external
    driver's canonicalizer: columns sorted by name, rows sorted on the
    RAW column values (the driver sorts before stringifying, so
    list/dict/ndarray cells crash there — they must crash here too;
    round 5 shipped two queries green locally that the driver rejected
    because the old normalize stringified list cells first)."""
    def cell(v):
        if isinstance(v, (list, tuple, dict)) or type(v).__name__ == "ndarray":
            raise TypeError(
                f"complex cell {type(v).__name__} is not "
                "driver-canonicalizable; serialize to a string column"
            )
        return "NULL" if pd.isna(v) else str(v)

    out = df[sorted(df.columns)].copy()
    if len(out) and len(out.columns):
        # raw-column sort first, exactly like the driver (unhashable
        # cells raise TypeError inside pandas' lexsort)
        out = out.sort_values(by=list(out.columns))
    for c in out.columns:
        out[c] = out[c].map(cell)
    return out.reset_index(drop=True)


def assert_matches_oracle(spark_df, duck_con, sql: str) -> None:
    got = normalize(spark_df.toPandas())
    want = normalize(duck_con.sql(sql).df())
    assert len(got) == len(want), f"row count {len(got)} != oracle {len(want)}"
    assert list(got.columns) == list(want.columns), (
        f"columns {list(got.columns)} != oracle {list(want.columns)}"
    )
    mismatch = (got != want).any(axis=1)
    if mismatch.any():
        idx = mismatch.idxmax()
        raise AssertionError(
            f"{int(mismatch.sum())} mismatched rows; first at {idx}:\n"
            f"spark : {got.loc[idx].to_dict()}\n"
            f"oracle: {want.loc[idx].to_dict()}"
        )
