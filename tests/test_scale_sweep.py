"""Opt-in scale sweep: the full differential-oracle suite at sf0.1
(10× the driver's sf0.01 correctness gate). This is what caught the
summation-order last-digit flips in the fact-table-scale money sums
(fixed via exact DECIMAL aggregation) — rounding policies that hold at
one scale can sit past double's significand at the next.

Skipped by default (adds ~10 min); run with:

    SPARK_GRAFT_SCALE_SWEEP=1 python -m pytest tests/test_scale_sweep.py -q
"""

from __future__ import annotations

import os

import duckdb
import pytest

from funding_monitoring_spark import registry
from tests.conftest import TABLES, assert_matches_oracle

SCALE_SF_DIR = os.environ.get(
    "SPARK_GRAFT_SCALE_SF_DIR", "/root/testdata/sf0.1"
)

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SCALE_SWEEP"),
    reason="scale sweep is opt-in (SPARK_GRAFT_SCALE_SWEEP=1)",
)

ALL = registry.queries()
ORACLES = registry.oracle_sql()


@pytest.fixture(scope="module")
def duck_scale():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SCALE_SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ALL))
def test_query_vs_oracle_at_scale(name, spark, duck_scale):
    df = ALL[name](spark, SCALE_SF_DIR)
    if name in ORACLES:
        assert_matches_oracle(df, duck_scale, ORACLES[name])
    else:
        assert df.count() >= 0
