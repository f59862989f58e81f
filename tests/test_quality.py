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


# ---- property test: violation counts vs a pandas model ------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_VAL = st.one_of(st.none(), st.integers(-5, 60))
_CAT = st.one_of(st.none(), st.sampled_from(["a", "b", "zz"]))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), _CAT, _VAL),
        min_size=1,
        max_size=12,
    ),
    lo=st.integers(-2, 10),
    width=st.integers(0, 30),
)
def test_contract_counts_match_model(rows, lo, width, spark):
    """PROPERTY: for random data (NULLs included) and a random range
    rule, every violation count equals a direct Python recount —
    NULL handling (NULL fails not_null, range, accepted_values; NULL
    ids collide in unique()'s grouping) is where hand-written CASE
    logic usually drifts."""
    hi = lo + width
    df = spark.createDataFrame(
        [(i, *r) for i, r in enumerate(rows)],
        "rid long, id long, cat string, v long",
    )
    rules = [
        not_null("cat"),
        in_range("v", lo, hi),
        accepted_values("cat", ["a", "b"]),
        unique(["id"]),
    ]
    got = {
        r["rule"]: r["n_violations"]
        for r in check_constraints(df, rules).collect()
    }
    exp_not_null = sum(1 for _id, cat, _v in rows if cat is None)
    exp_range = sum(
        1 for _id, _cat, v in rows if v is None or v < lo or v > hi
    )
    exp_accept = sum(
        1 for _id, cat, _v in rows if cat is None or cat == "zz"
    )
    from collections import Counter

    id_counts = Counter(_id for _id, _cat, _v in rows)
    exp_unique = sum(n - 1 for n in id_counts.values())
    assert got["not_null(cat)"] == exp_not_null
    assert got[f"range(v,[{lo},{hi}])"] == exp_range
    assert got["accepted_values(cat)"] == exp_accept
    assert got["unique(id)"] == exp_unique


def test_gopher_report_rule_edges(spark):
    from funding_monitoring_spark.operators import textstats as X

    good = " ".join(
        ["the", "be", "of"] + ["word"] * 47
    )  # 50 words, mean len in [3,10], 3 stop hits, all alpha
    short = "the be word"  # fails word count only
    symbols = " ".join(["the", "be"] + ["#"] * 48)  # symbol-heavy
    longwords = " ".join(
        ["the", "be"] + ["x" * 20] * 48
    )  # mean word length > 10
    df = spark.createDataFrame(
        [(0, good), (1, short), (2, symbols), (3, longwords)],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", X.gopher_report("text").alias("g")
        ).select("doc_id", "g.*").collect()
    }
    assert rows[0]["pass_gopher"] == 1
    assert rows[0]["n_words"] == 50 and rows[0]["n_stop_hits"] == 3
    assert rows[1]["pass_word_count"] == 0
    assert rows[1]["pass_stop_words"] == 1  # the + be
    # '#' tokens: counted as words AND as symbols -> ratio ~0.96,
    # and they are non-alphabetic -> alpha fraction 2/50
    assert rows[2]["pass_symbol_ratio"] == 0
    assert rows[2]["pass_alpha_words"] == 0
    assert rows[3]["pass_mean_word_len"] == 0
    assert rows[3]["pass_gopher"] == 0
