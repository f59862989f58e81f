"""Property-based check (SURVEY.md §5 item 5): the guarded last-N
rolling mean equals a direct reference computation for random group
sizes, values, and window widths — exercising the F5 guard boundary
(group == N, group < N, group > N) far beyond the fixture data.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from funding_monitoring_spark.operators.rolling import guarded_recent_means

T0 = dt.datetime(2024, 1, 1)

#: groups: 1-4 groups × 0-7 rows each, values in a small float range
_groups = st.dictionaries(
    st.sampled_from(["g1", "g2", "g3", "g4"]),
    st.lists(
        st.floats(
            min_value=-10, max_value=10, allow_nan=False, width=32
        ),
        min_size=1,
        max_size=7,
    ),
    min_size=1,
    max_size=4,
)


def _reference(rows, windows, scale):
    """Plain-Python oracle: newest-first by (time, id) desc."""
    by_group: dict[str, list[tuple]] = {}
    for g, t, v, i in rows:
        by_group.setdefault(g, []).append((t, i, v))
    out = {}
    for g, items in by_group.items():
        items.sort(key=lambda x: (x[0], x[1]), reverse=True)
        vals = [v for _, _, v in items]
        res = {}
        for name, n in windows.items():
            if len(vals) >= n:
                res[name] = round(sum(vals[:n]) / n * scale, 6)
            else:
                res[name] = None
        out[g] = res
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(groups=_groups, n_window=st.integers(min_value=1, max_value=6))
def test_guarded_means_match_reference(spark, groups, n_window):
    windows = {"m": n_window}
    rows = []
    i = 0
    for g, vals in groups.items():
        for v in vals:
            rows.append((g, T0 + dt.timedelta(minutes=i), float(v), i))
            i += 1
    df = spark.createDataFrame(
        rows, "symbol string, funding_time timestamp, rate double, event_id long"
    )
    got = {
        r["symbol"]: r["m"]
        for r in guarded_recent_means(
            df,
            group_cols=["symbol"],
            time_col="funding_time",
            value_col="rate",
            windows=windows,
            tiebreak_cols=["event_id"],
            scale=3.0,
            round_digits=6,
        ).collect()
    }
    want = _reference(rows, windows, 3.0)
    assert set(got) == set(want)
    for g in want:
        a, b = got[g], want[g]["m"]
        if b is None:
            assert a is None, (g, a, b)
        else:
            assert a is not None and abs(a - b) <= 1e-9, (g, a, b)


def test_null_inside_window_poisons_mean(spark):
    """A NULL among the N newest values must yield NULL (pandas
    rolling(n).mean() min_periods semantics), even when the group has
    >= N total rows — the guard counts non-null values INSIDE the
    window, not group size (ADVICE r1)."""
    rows = [
        # g1: 3 rows, newest (t=3) is NULL → window of 2 newest has 1
        # non-null → NULL; window of 3 also NULL
        ("g1", T0 + dt.timedelta(hours=1), 1.0, 1),
        ("g1", T0 + dt.timedelta(hours=2), 2.0, 2),
        ("g1", T0 + dt.timedelta(hours=3), None, 3),
        # g2: NULL is OLDER than the window → mean of 2 newest is fine
        ("g2", T0 + dt.timedelta(hours=1), None, 4),
        ("g2", T0 + dt.timedelta(hours=2), 4.0, 5),
        ("g2", T0 + dt.timedelta(hours=3), 6.0, 6),
    ]
    df = spark.createDataFrame(
        rows, "g string, t timestamp, v double, i long"
    )
    out = guarded_recent_means(
        df,
        group_cols=["g"],
        time_col="t",
        value_col="v",
        windows={"m2": 2, "m3": 3},
        tiebreak_cols=["i"],
        round_digits=6,
    )
    got = {r["g"]: (r["m2"], r["m3"]) for r in out.collect()}
    assert got["g1"] == (None, None)
    assert got["g2"] == (5.0, None)


def test_upsert_property_random_batches(spark):
    """Property check for the K1/K2 merge (SURVEY §7 'What's hard'
    #1): folding random micro-batches through dedupe_batch + ordered
    upsert must equal a plain dict replay that keeps, per key, the
    row with the highest (order, arrival) — including intra-batch
    duplicates, cross-batch revisions, stale re-emissions (lower
    order arriving later), and ties (incoming wins). Also asserts
    idempotence: re-applying the final batch changes nothing."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from funding_monitoring_spark.operators.upsert import (
        dedupe_batch,
        upsert,
    )

    # unique (key, order) per batch: order keys are unique event ids
    # at every call site (PK uniqueness in the reference — SURVEY §7
    # "What's hard" #2), and max_by ties would otherwise be
    # legitimately arbitrary
    batch = st.dictionaries(
        st.tuples(st.integers(0, 4), st.integers(0, 9)),
        st.integers(0, 99),
        min_size=1,
        max_size=6,
    ).map(lambda d: [(k, o, v) for (k, o), v in d.items()])
    batches = st.lists(batch, min_size=1, max_size=5)

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(batches)
    def check(bs):
        store = None
        expected = {}
        for batch_rows in bs:
            batch = dedupe_batch(
                spark.createDataFrame(
                    batch_rows, "k int, o int, v int"
                ),
                ["k"],
                ["o"],
            )
            store = (
                batch
                if store is None
                else upsert(store, batch, ["k"], order_cols=["o"])
            )
            # dict replay: within a batch max (o, v) wins (v breaks
            # order ties deterministically, mirroring max_by over the
            # full struct being unique per (k,o) after dedupe —
            # emulate by folding rows in sorted order); across
            # batches the incoming row wins on order ties
            best = {}
            for k, o, v in sorted(batch_rows):
                if k not in best or o >= best[k][0]:
                    best[k] = (o, v)
            for k, (o, v) in best.items():
                if k not in expected or o >= expected[k][0]:
                    expected[k] = (o, v)
        got = {r.k: (r.o, r.v) for r in store.collect()}
        assert got == expected
        # idempotence: replaying the LAST batch is a no-op
        last = dedupe_batch(
            spark.createDataFrame(bs[-1], "k int, o int, v int"),
            ["k"],
            ["o"],
        )
        again = {
            r.k: (r.o, r.v)
            for r in upsert(store, last, ["k"], order_cols=["o"]).collect()
        }
        assert again == expected

    check()
