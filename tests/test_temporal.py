"""Edge-semantics unit tests for operators/temporal.py on literal
fixtures: inclusive as-of bound, same-ts tiebreak, NULL when no
predecessor; exact gap boundary for sessionize; half-open window and
bucket-boundary crossings for interval_join."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from funding_monitoring_spark.operators import temporal as T


def ts(minute: int, second: int = 0, micro: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, second, micro)


def test_asof_inclusive_tiebreak_and_null(spark):
    quotes = spark.createDataFrame(
        [
            ("A", ts(10), 1.0, 1),
            ("A", ts(10), 2.0, 2),  # same instant, higher tiebreak wins
            ("A", ts(20), 3.0, 3),
            ("B", ts(30), 9.0, 4),
        ],
        "sym string, ts timestamp, value double, event_id int",
    )
    probes = spark.createDataFrame(
        [
            ("A", ts(10), 100),  # equal ts -> inclusive, tiebreak 2 wins
            ("A", ts(15), 101),  # between quotes -> 2.0
            ("A", ts(25), 102),  # after last -> 3.0
            ("B", ts(5), 103),   # before any quote -> NULL
            ("C", ts(40), 104),  # key with no quotes -> NULL
        ],
        "sym string, ts timestamp, probe_id int",
    )
    out = T.asof_join_backward(
        probes, quotes, keys=["sym"], ts_col="ts",
        payload={"value": "asof_value"}, ref_tiebreak="event_id",
    )
    got = {r["probe_id"]: (r["asof_value"], r["asof_ts"]) for r in out.collect()}
    assert got[100] == (2.0, ts(10))
    assert got[101] == (2.0, ts(10))
    assert got[102] == (3.0, ts(20))
    assert got[103] == (None, None)
    assert got[104] == (None, None)
    assert len(got) == 5  # one output row per probe row, no dups


def test_sessionize_exact_gap_boundary(spark):
    # gap = 60s: diff == 60s continues the session (strictly-greater rule)
    rows = [
        ("A", ts(0), 1),
        ("A", ts(1), 2),           # +60s  -> same session
        ("A", ts(2, 0, 1), 3),     # +60.000001s -> new session
        ("A", ts(3), 4),           # +59.999999s -> same session
        ("B", ts(0), 5),
    ]
    df = spark.createDataFrame(rows, "sym string, ts timestamp, event_id int")
    out = T.sessionize(df, ["sym"], "ts", gap_seconds=60, tiebreak="event_id")
    got = {r["event_id"]: r["session_id"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}


def test_interval_join_halfopen_and_bucket_crossing(spark):
    # window = 60s, so buckets are minute-aligned; pairs that cross a
    # bucket boundary must still match via the exploded b-1 key.
    left = spark.createDataFrame(
        [("A", ts(0, 30), 1)],  # 00:30 -> window [00:30, 01:30)
        "sym string, l_ts timestamp, l_id int",
    )
    right = spark.createDataFrame(
        [
            ("A", ts(0, 30), 10),      # == left ts -> included
            ("A", ts(0, 59), 11),      # same bucket -> included
            ("A", ts(1, 10), 12),      # next bucket, inside window
            ("A", ts(1, 30), 13),      # == left ts + window -> excluded
            ("A", ts(0, 29), 14),      # before left ts -> excluded
            ("B", ts(0, 45), 15),      # other key -> excluded
        ],
        "sym string, r_ts timestamp, r_id int",
    )
    out = T.interval_join(
        left, right, keys=["sym"], left_ts="l_ts", right_ts="r_ts",
        window_seconds=60,
    )
    got = sorted(r["r_id"] for r in out.collect())
    assert got == [10, 11, 12]


def test_interval_join_no_duplicate_pairs(spark):
    # a dense right side: every qualifying pair appears exactly once
    left = spark.createDataFrame(
        [("A", ts(m), m) for m in range(5)],
        "sym string, l_ts timestamp, l_id int",
    )
    right = spark.createDataFrame(
        [("A", ts(m, 30), 100 + m) for m in range(5)],
        "sym string, r_ts timestamp, r_id int",
    )
    out = T.interval_join(
        left, right, keys=["sym"], left_ts="l_ts", right_ts="r_ts",
        window_seconds=120,
    )
    pairs = [(r["l_id"], r["r_id"]) for r in out.collect()]
    assert len(pairs) == len(set(pairs))
    # l at minute m matches r at m.5 and (m+1).5
    expected = {
        (m, 100 + n) for m in range(5) for n in range(5)
        if 0 <= (n * 60 + 30) - m * 60 < 120
    }
    assert set(pairs) == expected


def test_asof_is_single_shuffle(spark):
    """Plan shape: the as-of join shuffles once on the key — no
    cartesian/range explosion, no extra exchange after the union."""
    quotes = spark.createDataFrame(
        [("A", ts(1), 1.0, 1)], "sym string, ts timestamp, value double, event_id int"
    )
    probes = spark.createDataFrame(
        [("A", ts(2), 7)], "sym string, ts timestamp, probe_id int"
    )
    out = T.asof_join_backward(
        probes, quotes, keys=["sym"], ts_col="ts",
        payload={"value": "asof_value"}, ref_tiebreak="event_id",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the union-marker formulation needs exactly one hash shuffle (on
    # the key) — tie-resolution rides the same sort, not a second one
    assert plan.count("Exchange hashpartitioning") == 1
