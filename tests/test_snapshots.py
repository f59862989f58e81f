"""Snapshot store: commits, time travel, rollback, expiry, file
skipping (sources/snapshots.py)."""

from __future__ import annotations

import os

import pytest

from funding_monitoring_spark.sources.snapshots import (
    commit_snapshot,
    expire_snapshots,
    latest_version,
    list_versions,
    read_snapshot,
    rollback_snapshot,
    snapshot_files,
    snapshot_log,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def store(tmp_path):
    return str(tmp_path / "snapstore")


def _frame(spark, ids):
    return spark.createDataFrame(
        [(i, f"v{i}") for i in ids], "id long, payload string"
    )


def test_append_time_travel(spark, store):
    v1 = commit_snapshot(_frame(spark, range(0, 5)), store)
    v2 = commit_snapshot(_frame(spark, range(5, 8)), store)
    assert (v1, v2) == (1, 2)
    assert _rows(read_snapshot(spark, store, version=1)) == _rows(
        _frame(spark, range(0, 5))
    )
    assert _rows(read_snapshot(spark, store)) == _rows(
        _frame(spark, range(0, 8))
    )
    log = snapshot_log(store)
    assert [e["version"] for e in log] == [1, 2]
    assert log[1]["parent"] == 1
    assert log[1]["n_files"] > log[0]["n_files"]


def test_overwrite_keeps_history(spark, store):
    commit_snapshot(_frame(spark, range(0, 5)), store)
    commit_snapshot(
        _frame(spark, range(100, 103)), store, mode="overwrite"
    )
    assert _rows(read_snapshot(spark, store)) == _rows(
        _frame(spark, range(100, 103))
    )
    # old version still byte-identical readable (zero-copy history)
    assert _rows(read_snapshot(spark, store, version=1)) == _rows(
        _frame(spark, range(0, 5))
    )


def test_rollback_rolls_forward(spark, store):
    commit_snapshot(_frame(spark, range(0, 5)), store)
    commit_snapshot(
        _frame(spark, range(100, 103)), store, mode="overwrite"
    )
    v3 = rollback_snapshot(store, to_version=1)
    assert v3 == 3
    assert _rows(read_snapshot(spark, store)) == _rows(
        _frame(spark, range(0, 5))
    )
    # the bad version stays inspectable — undo never deletes
    assert _rows(read_snapshot(spark, store, version=2)) == _rows(
        _frame(spark, range(100, 103))
    )
    assert snapshot_log(store)[-1]["operation"] == "rollback"


def test_concurrent_claim_retries(spark, store):
    commit_snapshot(_frame(spark, [1]), store)
    # simulate a racing writer that already claimed v2
    import json

    mdir = os.path.join(store, "_manifests")
    with open(os.path.join(mdir, f"v{2:09d}.json"), "w") as fh:
        json.dump(
            {"version": 2, "operation": "append", "parent": 1,
             "files": []},
            fh,
        )
    v = commit_snapshot(_frame(spark, [2]), store, mode="overwrite")
    assert v == 3
    assert latest_version(store) == 3


def test_concurrent_append_merges_winner_files(spark, store, monkeypatch):
    """The lost-update race: a writer that loses the version claim must
    rebuild its APPEND file list from the new latest manifest, or the
    winner's just-committed files silently vanish from the newest
    snapshot (the optimistic-concurrency contract is about data, not
    just version numbering)."""
    import json

    commit_snapshot(_frame(spark, [1]), store)
    real_link = os.link
    fired = []

    def racing_link(src, dst, *a, **kw):
        if not fired:
            fired.append(True)
            # winner claims v2 with its own file AFTER the loser read
            # parent=1 but BEFORE the loser's link — the exact window
            with open(
                os.path.join(store, "_manifests", f"v{2:09d}.json"), "w"
            ) as fh:
                json.dump(
                    {
                        "version": 2,
                        "operation": "append",
                        "parent": 1,
                        "files": [
                            {"path": "data/winner/part-0.parquet",
                             "bytes": 1}
                        ],
                    },
                    fh,
                )
        return real_link(src, dst, *a, **kw)

    monkeypatch.setattr(os, "link", racing_link)
    v = commit_snapshot(_frame(spark, [2]), store, mode="append")
    assert v == 3
    files = {f["path"] for f in __import__("json").load(
        open(os.path.join(store, "_manifests", f"v{3:09d}.json"))
    )["files"]}
    # the loser's retry merged the winner's file list, not its stale one
    assert "data/winner/part-0.parquet" in files
    assert len(files) > 2  # v1's files + winner's + the loser's own


def test_expire_reclaims_unreferenced_only(spark, store):
    commit_snapshot(_frame(spark, range(0, 5)), store, n_files=2)
    commit_snapshot(_frame(spark, range(5, 8)), store, n_files=2)
    commit_snapshot(
        _frame(spark, range(8, 10)), store, mode="overwrite", n_files=2
    )
    latest_before = _rows(read_snapshot(spark, store))
    report = expire_snapshots(store, keep_last=1)
    assert report["manifests_removed"] == 2
    # v1+v2's four files are unreferenced by v3 → reclaimed
    assert report["files_removed"] == 4
    assert report["bytes_removed"] > 0
    assert list_versions(store) == [3]
    assert _rows(read_snapshot(spark, store)) == latest_before


def test_expire_never_breaks_retained_appends(spark, store):
    commit_snapshot(_frame(spark, range(0, 5)), store, n_files=2)
    commit_snapshot(_frame(spark, range(5, 8)), store, n_files=2)
    # keep_last=1 retains v2, which REFERENCES v1's files (append):
    # nothing may be deleted
    report = expire_snapshots(store, keep_last=1)
    assert report["files_removed"] == 0
    assert _rows(read_snapshot(spark, store)) == _rows(
        _frame(spark, range(0, 8))
    )


def test_incremental_changes(spark, store):
    from funding_monitoring_spark.sources.snapshots import (
        read_snapshot_changes,
    )

    commit_snapshot(_frame(spark, range(0, 5)), store)
    commit_snapshot(_frame(spark, range(5, 8)), store)
    commit_snapshot(_frame(spark, range(8, 10)), store)
    got = read_snapshot_changes(spark, store, from_version=1)
    assert _rows(got) == _rows(_frame(spark, range(5, 10)))
    got = read_snapshot_changes(spark, store, 1, to_version=2)
    assert _rows(got) == _rows(_frame(spark, range(5, 8)))


def test_incremental_changes_rejects_non_append(spark, store):
    from funding_monitoring_spark.sources.snapshots import (
        read_snapshot_changes,
    )

    commit_snapshot(_frame(spark, range(0, 5)), store)
    commit_snapshot(
        _frame(spark, range(5, 8)), store, mode="overwrite"
    )
    with pytest.raises(ValueError, match="not append"):
        read_snapshot_changes(spark, store, from_version=1)
    # a range that stops BEFORE the overwrite is still valid
    commit_snapshot(_frame(spark, range(8, 10)), store)
    got = read_snapshot_changes(spark, store, 2, to_version=3)
    assert _rows(got) == _rows(_frame(spark, range(8, 10)))


def test_commit_writer_idempotent_under_redelivery(spark, store):
    from funding_monitoring_spark.sources.snapshots import (
        snapshot_commit_writer,
    )

    write = snapshot_commit_writer(store)
    write(_frame(spark, range(0, 5)), 0)
    write(_frame(spark, range(0, 5)), 0)  # redelivered batch: no-op
    write(_frame(spark, range(5, 8)), 1)
    write(_frame(spark, range(5, 8)), 1)
    assert list_versions(store) == [1, 2]
    assert _rows(read_snapshot(spark, store)) == _rows(
        _frame(spark, range(0, 8))
    )


def test_commit_writer_skips_empty_batches(spark, store):
    from funding_monitoring_spark.sources.snapshots import (
        snapshot_commit_writer,
    )

    write = snapshot_commit_writer(store)
    write(_frame(spark, range(0, 3)), 0)
    write(_frame(spark, []), 1)
    write(_frame(spark, [7]), 2)
    assert list_versions(store) == [1, 2]
    assert _rows(read_snapshot(spark, store)) == _rows(
        _frame(spark, [0, 1, 2, 7])
    )


def test_file_skipping_superset_and_exact(spark, store):
    df = _frame(spark, range(0, 1000)).repartitionByRange(8, "id")
    commit_snapshot(df, store, stats_cols=["id"])
    all_files = snapshot_files(store)
    pruned = snapshot_files(store, between=("id", 100, 160))
    assert 0 < len(pruned) < len(all_files)
    got = read_snapshot(spark, store, between=("id", 100, 160))
    assert _rows(got) == _rows(_frame(spark, range(100, 161)))


def test_file_skipping_without_stats_keeps_all(spark, store):
    commit_snapshot(_frame(spark, range(0, 100)), store, n_files=4)
    # no stats recorded → skipping must conservatively keep all files
    assert len(
        snapshot_files(store, between=("id", 5, 6))
    ) == len(snapshot_files(store))
    got = read_snapshot(spark, store, between=("id", 5, 6))
    assert _rows(got) == _rows(_frame(spark, [5, 6]))


# ---- property test: random histories vs a pure-Python model -------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

#: command alphabet: ("append", ids) | ("overwrite", ids) |
#: ("rollback",) targets a random earlier version | ("expire", keep)
_CMD = st.one_of(
    st.tuples(st.just("append"), st.lists(st.integers(0, 99),
                                          min_size=1, max_size=4)),
    st.tuples(st.just("overwrite"), st.lists(st.integers(0, 99),
                                             min_size=1, max_size=4)),
    st.tuples(st.just("rollback")),
    st.tuples(st.just("expire"), st.integers(1, 3)),
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(cmds=st.lists(_CMD, min_size=1, max_size=5),
       data=st.data())
def test_snapshot_history_matches_model(
    cmds, data, spark, tmp_path_factory
):
    """PROPERTY: for any command sequence (append / overwrite /
    rollback-to-random-earlier / expire), every RETAINED version's
    content equals a pure-Python model's, and expire never breaks a
    retained version. Exercises the interactions the crafted tests
    can't enumerate (rollback over rollback, expire after overwrite
    chains, appends on a rolled-back base)."""
    from funding_monitoring_spark.sources.snapshots import (
        commit_snapshot,
        expire_snapshots,
        list_versions,
        read_snapshot,
        rollback_snapshot,
    )

    store = str(tmp_path_factory.mktemp("snapprop") / "store")
    model: dict[int, list[int]] = {}  # version -> multiset of ids
    latest: list[int] = []
    for cmd in cmds:
        if cmd[0] == "append":
            latest = latest + cmd[1]
            v = commit_snapshot(_frame(spark, cmd[1]), store)
            model[v] = list(latest)
        elif cmd[0] == "overwrite":
            latest = list(cmd[1])
            v = commit_snapshot(
                _frame(spark, cmd[1]), store, mode="overwrite"
            )
            model[v] = list(latest)
        elif cmd[0] == "rollback":
            if not model:
                continue
            target = data.draw(
                st.sampled_from(sorted(model)), label="rollback_to"
            )
            latest = list(model[target])
            v = rollback_snapshot(store, to_version=target)
            model[v] = list(latest)
        else:  # expire
            if not model:
                continue
            keep = cmd[1]
            expire_snapshots(store, keep_last=keep)
            for gone in sorted(model)[:-keep]:
                model.pop(gone)
    assert list_versions(store) == sorted(model)
    for v, ids in model.items():
        got = sorted(r["id"] for r in
                     read_snapshot(spark, store, version=v).collect())
        assert got == sorted(ids), (v, got, ids)


def test_optimize_zorder_prunes_both_dims_content_identical(
    spark, store
):
    """optimize_snapshot: content identical, old version retained,
    and the z-clustered manifest stats prune files on EITHER
    dimension (the pre-optimize commit carries no stats, so skipping
    conservatively kept everything)."""
    from funding_monitoring_spark.sources.snapshots import (
        optimize_snapshot,
    )

    rows = [(i, (i * 37) % 100, (i * 61) % 100) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    commit_snapshot(df, store, n_files=4)
    assert len(
        snapshot_files(store, between=("x", 10, 20))
    ) == len(snapshot_files(store))  # no stats yet -> keep all
    before = _rows(read_snapshot(spark, store))
    v = optimize_snapshot(spark, store, "x", "y", n_files=8)
    assert v == 2
    assert _rows(read_snapshot(spark, store)) == before
    assert _rows(read_snapshot(spark, store, version=1)) == before
    total = len(snapshot_files(store))
    px = len(snapshot_files(store, between=("x", 10, 20)))
    py = len(snapshot_files(store, between=("y", 10, 20)))
    assert 0 < px < total, (px, total)
    assert 0 < py < total, (py, total)
    got = read_snapshot(spark, store, between=("x", 10, 20))
    assert _rows(got) == sorted(
        (i, x, y) for i, x, y in rows if 10 <= x <= 20
    )


def test_conjunctive_skipping_rectangle_prunes_more(spark, store):
    """A rectangle predicate (two ANDed between conjuncts) over a
    z-ordered store must prune at least as hard as either dimension
    alone, and the read stays exact."""
    from funding_monitoring_spark.sources.snapshots import (
        optimize_snapshot,
    )

    rows = [(i, (i * 37) % 100, (i * 61) % 100) for i in range(2000)]
    commit_snapshot(
        spark.createDataFrame(rows, "id long, x long, y long"),
        store,
        n_files=4,
    )
    optimize_snapshot(spark, store, "x", "y", n_files=8)
    px = len(snapshot_files(store, between=("x", 10, 30)))
    rect = [("x", 10, 30), ("y", 40, 60)]
    pxy = len(snapshot_files(store, between=rect))
    assert pxy <= px
    got = _rows(read_snapshot(spark, store, between=rect))
    assert got == sorted(
        (i, x, y)
        for i, x, y in rows
        if 10 <= x <= 30 and 40 <= y <= 60
    )


def test_py_key_hash_mirrors_spark(spark):
    """_py_key_hash must reproduce operators/sampling.key_hash exactly
    (including negative keys) — a drift would make bloom probes check
    the wrong bits and silently skip files holding real rows."""
    from pyspark.sql import functions as F

    from funding_monitoring_spark.operators.sampling import key_hash
    from funding_monitoring_spark.sources.snapshots import _py_key_hash

    vals = [-(2**40), -7, -1, 0, 1, 42, 2**31, 2**40 + 13]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    for seed in (0, 1, 3):
        got = [
            r.h
            for r in df.select(
                key_hash(F.col("v"), seed=seed).alias("h")
            ).collect()
        ]
        want = [_py_key_hash(v, seed) for v in vals]
        assert got == want, (seed, got, want)


def test_bloom_equality_pruning_exact_and_strict(spark, store):
    """Bloom file skipping: with the write clustered on the key, an
    equality probe reads a strict subset of files yet the filtered
    rows are exactly the plain filter's (superset + row predicate)."""
    from pyspark.sql import functions as F

    from funding_monitoring_spark.sources.snapshots import (
        commit_snapshot,
        read_snapshot,
        snapshot_files,
    )

    df = spark.createDataFrame(
        [(i, i % 40, f"p{i}") for i in range(2000)],
        "id long, k long, payload string",
    )
    commit_snapshot(
        df.repartition(8, "k"), store, bloom_cols=["k"]
    )
    total = snapshot_files(store)
    pruned = snapshot_files(store, equals=("k", 7))
    assert 0 < len(pruned) < len(total), (len(pruned), len(total))
    got = sorted(
        r.id for r in read_snapshot(spark, store, equals=("k", 7)).collect()
    )
    assert got == [i for i in range(2000) if i % 40 == 7]
    # absent key: every file's bloom excludes it
    assert snapshot_files(store, equals=("k", 41)) == []
    # files without a bloom for the column are conservatively kept
    assert len(snapshot_files(store, equals=("id", 7))) == len(total)


def test_snapshot_row_count_is_metadata_only(spark, store):
    from funding_monitoring_spark.sources.snapshots import (
        snapshot_row_count,
    )

    commit_snapshot(_frame(spark, range(0, 5)), store, n_files=2)
    commit_snapshot(_frame(spark, range(5, 8)), store, n_files=2)
    assert snapshot_row_count(store, 1) == 5
    assert snapshot_row_count(store) == 8
    # rows come from the manifest: deleting the data files must not
    # change the answer (that is the point)
    import shutil

    shutil.rmtree(os.path.join(store, "data"))
    assert snapshot_row_count(store) == 8
    # a hand-written manifest entry without row counts raises loudly
    import json

    mpath = os.path.join(store, "_manifests", f"v{2:09d}.json")
    m = json.load(open(mpath))
    del m["files"][0]["rows"]
    json.dump(m, open(mpath, "w"))
    with pytest.raises(ValueError, match="predates row counts"):
        snapshot_row_count(store, 2)


def test_total_bloom_prune_returns_empty_frame(spark, store):
    """A point lookup for a key absent from the store: per-file
    blooms correctly eliminate every file — that's an empty result
    with the store schema, not an error."""
    from funding_monitoring_spark.sources.snapshots import (
        commit_snapshot,
        read_snapshot,
        snapshot_files,
    )

    df = spark.createDataFrame(
        [(i, i % 10, f"p{i}") for i in range(200)],
        "id long, k long, payload string",
    )
    commit_snapshot(df.repartition(4, "k"), store, bloom_cols=["k"])
    assert snapshot_files(store, equals=("k", 999)) == []
    out = read_snapshot(spark, store, equals=("k", 999))
    assert out.count() == 0
    assert out.columns == ["id", "k", "payload"]


def test_py_xxhash64_matches_spark(spark):
    """The driver-side XXH64 probe mirror must equal Spark's
    xxhash64 bit-for-bit across lengths covering every code path
    (empty, <4, <8, 4-byte tail, 8-byte lanes, >=32 stripe loop,
    multi-byte UTF-8)."""
    from pyspark.sql import functions as F

    from funding_monitoring_spark.sources.snapshots import _py_xxhash64

    vals = ["", "a", "abc", "abcd", "x" * 7, "y" * 8, "z" * 31,
            "w" * 32, "long-string-" * 10, "unicode-éß漢字"]
    rows = {
        r.s: r.h
        for r in spark.createDataFrame([(v,) for v in vals], "s string")
        .select("s", F.xxhash64("s").alias("h"))
        .collect()
    }
    for v in vals:
        assert rows[v] == _py_xxhash64(v.encode("utf-8")), v


def test_bloom_string_key_pruning_exact_and_strict(spark, store):
    """String-key blooms: a fingerprint point lookup reads a strict
    subset of files and returns exactly the plain filter's rows; an
    absent fingerprint prunes every file (empty result, not error)."""
    from pyspark.sql import functions as F

    from funding_monitoring_spark.sources.snapshots import (
        commit_snapshot,
        read_snapshot,
        snapshot_files,
    )

    df = spark.createDataFrame(
        [(i, f"fp-{i % 40:03d}", f"p{i}") for i in range(2000)],
        "id long, fp string, payload string",
    )
    commit_snapshot(df.repartition(8, "fp"), store, bloom_cols=["fp"])
    total = snapshot_files(store)
    pruned = snapshot_files(store, equals=("fp", "fp-007"))
    assert 0 < len(pruned) < len(total), (len(pruned), len(total))
    got = sorted(
        r.id
        for r in read_snapshot(
            spark, store, equals=("fp", "fp-007")
        ).collect()
    )
    assert got == [i for i in range(2000) if i % 40 == 7]
    assert snapshot_files(store, equals=("fp", "fp-999")) == []
    out = read_snapshot(spark, store, equals=("fp", "fp-999"))
    assert out.count() == 0 and out.columns == ["id", "fp", "payload"]
