"""Data-contract operator (operators/quality.py): exact violation
counts on crafted data, fused-scan plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from funding_monitoring_spark.operators.quality import (
    accepted_values,
    check_constraints,
    foreign_key,
    in_range,
    not_null,
    predicate,
    unique,
)


def _df(spark):
    rows = [
        (1, "a", 10.0, 100),
        (2, "a", -1.0, 100),   # range low
        (3, "b", 55.0, 101),   # range high
        (3, "b", 5.0, 999),    # dup id + orphan fk
        (None, "zz", None, 100),  # null id, bad value null, bad cat
    ]
    return spark.createDataFrame(
        rows, "id long, cat string, v double, fk long"
    )


def _dim(spark):
    return spark.createDataFrame(
        [(100,), (101,)], "k long"
    )


def test_counts_exact(spark):
    rules = [
        not_null("id"),
        in_range("v", 0.0, 50.0),
        accepted_values("cat", ["a", "b"]),
        unique(["id"]),
        foreign_key(["fk"], _dim(spark), ["k"]),
        predicate("v_over_20", F.col("v") > 20),
    ]
    got = {
        r["rule"]: (r["n_violations"], r["passed"])
        for r in check_constraints(_df(spark), rules).collect()
    }
    assert got == {
        "not_null(id)": (1, 0),
        # -1.0 low, 55.0 high, NULL counts too
        "range(v,[0.0,50.0])": (3, 0),
        "accepted_values(cat)": (1, 0),
        "unique(id)": (1, 0),  # id=3 twice -> 1 excess row
        "foreign_key(fk)": (1, 0),  # fk=999
        "v_over_20": (1, 0),  # only 55.0
    }


def test_all_passing_and_order(spark):
    rules = [
        not_null("cat"),
        accepted_values("cat", ["a", "b", "zz"]),
    ]
    rows = check_constraints(_df(spark), rules).collect()
    assert [r["rule"] for r in rows] == [
        "not_null(cat)",
        "accepted_values(cat)",
    ]
    assert all(r["n_violations"] == 0 and r["passed"] == 1 for r in rows)


def test_empty_rules(spark):
    out = check_constraints(_df(spark), [])
    assert out.count() == 0
    assert out.columns == ["rule", "n_violations", "passed"]


def test_pred_rules_fuse_into_one_scan(spark, sf_dir, tmp_path):
    """N row-predicate rules must cost ONE pass over the input: the
    physical plan for a pred-only contract over a parquet table
    contains exactly one FileScan."""
    from funding_monitoring_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    out = check_constraints(
        li,
        [
            not_null("l_orderkey"),
            in_range("l_discount", 0.0, 0.08),
            accepted_values("l_returnflag", ["A", "N"]),
            predicate("qty", F.col("l_quantity") > 30),
        ],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") + plan.count("Scan parquet") <= 2, plan
    # one scan total: both spellings refer to the same node
    assert (
        plan.count("FileScan") == 1 or plan.count("Scan parquet") == 1
    ), plan


def test_streaming_contracts_reject_non_additive_rules(spark, tmp_path):
    """unique()/foreign_key() counts are not additive across
    micro-batches — the streaming ledger must refuse them loudly."""
    import pytest

    from funding_monitoring_spark.streaming.pipelines import (
        streaming_contract_ledger,
    )

    with pytest.raises(ValueError, match="not additive"):
        streaming_contract_ledger(
            spark,
            str(tmp_path / "chunks"),
            "id long",
            str(tmp_path / "store"),
            str(tmp_path / "ckpt"),
            [unique(["id"])],
        )
