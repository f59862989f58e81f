"""edit_distance_join must be EXACTLY the cross-join query: blocking
(prefix filter + short fallback) affects data movement, never the
answer. These tests compare against a pure-Python DP brute force on
adversarial corpora — a tiny alphabet pushing everything into the
short block, and a mutated-clone corpus exercising the long/prefix
path — plus the hot-bucket guard."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from funding_monitoring_spark.operators.fuzzyjoin import (
    edit_distance_join,
    qgram_set,
)


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (ca != cb),
                )
            )
        prev = cur
    return prev[-1]


def _brute(rows, d):
    out = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            (ia, ga, sa), (ib, gb, sb) = rows[i], rows[j]
            if ga != gb:
                continue
            lo, hi = (ia, ib) if ia < ib else (ib, ia)
            dist = _lev(sa, sb)
            if dist <= d:
                out.add((ga, lo, hi, dist))
    return out


def _run(spark, rows, d, q=3):
    df = spark.createDataFrame(rows, "id long, g string, s string")
    got = {
        (r.g, r.id_a, r.id_b, r.dist)
        for r in edit_distance_join(
            df.repartition(5), "id", "g", "s", d, q=q
        ).collect()
    }
    assert got == _brute(rows, d)


def test_fuzzy_join_short_block_tiny_alphabet(spark):
    """Alphabet {a, b}: distinct 3-gram sets max out at 8 <= d*q, so
    nearly every string lands in the short fallback — the regime where
    plain prefix filtering silently loses pairs."""
    rng = random.Random(6)
    rows = [
        (
            i,
            "g" + str(i % 2),
            "".join(rng.choice("ab") for _ in range(rng.randint(3, 10))),
        )
        for i in range(160)
    ]
    _run(spark, rows, d=2)


def test_fuzzy_join_mutated_clones_long_path(spark):
    """Mutated clones of a few base strings over a 6-letter alphabet:
    long gram sets (prefix path), real matches at known distances,
    and cross-group isolation."""
    rng = random.Random(7)
    bases = [
        "".join(rng.choice("abcdef") for _ in range(20))
        for _ in range(12)
    ]
    rows = []
    for i in range(150):
        s = list(rng.choice(bases))
        for _ in range(rng.randint(0, 3)):
            op = rng.choice("sid")
            pos = rng.randrange(len(s))
            if op == "s":
                s[pos] = rng.choice("abcdef")
            elif op == "i":
                s.insert(pos, rng.choice("abcdef"))
            elif len(s) > 1:
                del s[pos]
        rows.append((i, "g" + str(i % 2), "".join(s)))
    _run(spark, rows, d=2)


def test_fuzzy_join_mixed_short_and_long(spark):
    """Short and long strings in one group: short-vs-long pairs must
    come out of the prefix join (the short set IS its own prefix)."""
    rows = [
        (1, "g", "ab"),
        (2, "g", "abc"),
        (3, "g", "abcdefghijklmnop"),
        (4, "g", "abcdefghijklmnoX"),
        (5, "g", "abcdefghijklmn"),
        (6, "g", ""),
        (7, "g", "a"),
    ]
    _run(spark, rows, d=2)


def test_fuzzy_join_hot_bucket_guard(spark):
    """A genuinely degenerate corpus (everyone shares every gram AND
    the same length class) must still trip the max_bucket guard, not
    silently build a quadratic candidate set."""
    rows = [(i, "g", "aaaaaaaaaaaaaaaa") for i in range(50)]
    df = spark.createDataFrame(rows, "id long, g string, s string")
    with pytest.raises(ValueError, match="max_bucket"):
        edit_distance_join(df, "id", "g", "s", 2, q=3, max_bucket=10)


def test_fuzzy_join_hot_bucket_length_diverse_degrades(spark):
    """A hot (group, gram) bucket whose rows are length-diverse must
    NOT raise: secondary length-class blocking bounds the candidates
    and the answer stays exactly the brute force. (Before round 7 this
    fixture raised — one viral title cluster would kill a 100 TB job
    even though its lengths spread the work fine.)"""
    rng = random.Random(11)
    rows = []
    for i in range(60):
        # every string carries the marker gram "qqq" → one hot bucket;
        # lengths 10..50 spread across many length classes
        n = rng.randint(10, 50)
        body = "".join(
            rng.choice("abcdefghijklmnop") for _ in range(n)
        )
        pos = rng.randrange(len(body) + 1)
        rows.append((i, "g", body[:pos] + "qqq" + body[pos:]))
    df = spark.createDataFrame(rows, "id long, g string, s string")
    got = {
        (r.g, r.id_a, r.id_b, r.dist)
        for r in edit_distance_join(
            df.repartition(5), "id", "g", "s", 2, q=3, max_bucket=8
        ).collect()
    }
    assert got == _brute(rows, 2)


def test_fuzzy_join_short_chain_length_blocked(spark):
    """Shorts (< d*q+1 grams) of DIVERSE lengths: the fallback's
    length blocking must keep exactly the |len diff| <= d pairs —
    a chain corpus where adjacency in length is adjacency in
    distance."""
    rows = [(k, "g", "xyz" + "a" * k) for k in range(40)]
    got_rows = spark.createDataFrame(rows, "id long, g string, s string")
    got = {
        (r.g, r.id_a, r.id_b, r.dist)
        for r in edit_distance_join(
            got_rows.repartition(5), "id", "g", "s", 2, q=3, max_bucket=5
        ).collect()
    }
    assert got == _brute(rows, 2)
    assert got  # the chain has real pairs — not vacuous


def test_fuzzy_join_short_fallback_guard(spark):
    """A group flooded with same-length shorts whose gram sets are
    DISJOINT (prefix buckets all cold) must trip the short-fallback
    guard — before round 7 this went quadratic with no loud failure."""
    alpha = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    rows = [
        (i, "g", alpha[4 * i : 4 * i + 4]) for i in range(12)
    ]  # 12 length-4 strings, disjoint grams
    df = spark.createDataFrame(rows, "id long, g string, s string")
    with pytest.raises(ValueError, match="short-string fallback"):
        edit_distance_join(df, "id", "g", "s", 2, q=3, max_bucket=10)


def test_qgram_set_edges(spark):
    df = spark.createDataFrame(
        [("abcd",), ("ab",), ("",)], "s string"
    ).select(qgram_set(F.col("s"), 3).alias("g"))
    got = [r.g for r in df.collect()]
    assert got == [["abc", "bcd"], ["ab"], [""]]


def test_cluster_edges_same_components_as_pairs(spark):
    """edit_distance_cluster_edges is a SPANNING edge set of the pair
    graph: connected components over it must equal components over
    the full pair set, on a corpus with viral exact-duplicate groups,
    fuzzy chains across them, and singletons — while materializing
    far fewer edges than the C(k,2) pair form."""
    from funding_monitoring_spark.operators.components import (
        connected_components,
    )
    from funding_monitoring_spark.operators.fuzzyjoin import (
        edit_distance_cluster_edges,
    )

    rows = []
    # viral group: 30 exact copies + a distance-2 mutant chained in
    rows += [(i, "g", "funding rates monitor") for i in range(30)]
    rows += [(100, "g", "funding rates monitorXY")]
    # second viral group, NOT within distance of the first
    rows += [(200 + i, "g", "totally different title") for i in range(20)]
    # fuzzy chain bridging nothing: a~b~c each within d, ends 4 apart
    rows += [(300, "g", "abcdefgh"), (301, "g", "abcdefgXY"),
             (302, "g", "abcdeXYZW")]
    # other group key: same strings must NOT join across groups
    rows += [(400, "h", "funding rates monitor")]
    # singleton
    rows += [(500, "g", "zzzz unique zzzz")]
    df = spark.createDataFrame(rows, "id long, g string, s string")

    def comps(edges_df):
        cc = connected_components(edges_df, src="id_a", dst="id_b")
        return {
            tuple(sorted(g))
            for g in cc.groupBy("cluster_id")
            .agg(F.collect_set("id").alias("m"))
            .select("m")
            .toPandas()["m"]
        }

    d = 3
    pair_df = edit_distance_join(df, "id", "g", "s", d, q=3)
    star_df = edit_distance_cluster_edges(df, "id", "g", "s", d, q=3)
    assert comps(star_df) == comps(pair_df)
    # the star form materializes O(members) rows for the viral
    # groups, the pair form O(members^2)
    n_pairs = pair_df.count()
    n_star = star_df.count()
    assert n_pairs > 30 * 29 / 2  # the viral group alone
    assert n_star < n_pairs / 3
    # star edges are real rows of the output contract: dist 0 on
    # member edges, verified distance on representative pairs
    dists = {r.dist for r in star_df.collect()}
    assert 0 in dists and max(dists) <= d


def test_edit_distance_clusters_matches_edge_form(spark):
    """Quotient-graph membership (CC over representatives only) must
    equal dedup_cluster_assignment over the full star edge set,
    including NULL-string singletons and transitive bridges."""
    from funding_monitoring_spark.operators.components import (
        dedup_cluster_assignment,
    )
    from funding_monitoring_spark.operators.fuzzyjoin import (
        edit_distance_cluster_edges,
        edit_distance_clusters,
    )

    rows = [
        (1, "g", "alpha bravo"),
        (2, "g", "alpha bravo"),   # exact dup of 1
        (3, "g", "alpha bravp"),   # dist 1 from the group
        (4, "g", "alpha bsavq"),   # dist 2 from 3, 3 from 1: bridge
        (5, "g", "zzzz qqqq ffff"), # far
        (6, "h", "alpha bravo"),   # same string, other group
        (7, "g", None),            # no fuzzy identity: singleton
    ]
    df = spark.createDataFrame(rows, "id long, g string, s string")
    quotient = {
        (r.id, r.cluster_id, r.is_canonical)
        for r in edit_distance_clusters(df, "id", "g", "s", 2).collect()
    }
    edge_form = {
        (r.id, r.cluster_id, r.is_canonical)
        for r in dedup_cluster_assignment(
            df.select("id"),
            edit_distance_cluster_edges(df, "id", "g", "s", 2),
            id_col="id", src="id_a", dst="id_b",
        ).collect()
    }
    assert quotient == edge_form == {
        (1, 1, True), (2, 1, False), (3, 1, False), (4, 1, False),
        (5, 5, True), (6, 6, True), (7, 7, True),
    }


# -- Damerau-Levenshtein (true / unrestricted) ----------------------------


def _dl_brute(a: str, b: str, memo=None) -> int:
    """Reference unrestricted DL via exhaustive recursion with memo —
    deliberately a DIFFERENT formulation (delete/insert/substitute
    on suffixes plus a first-character swap branch) than the
    Lowrance-Wagner matrix under test."""
    if memo is None:
        memo = {}
    key = (a, b)
    if key in memo:
        return memo[key]
    if not a:
        return len(b)
    if not b:
        return len(a)
    best = min(
        _dl_brute(a[1:], b, memo) + 1,
        _dl_brute(a, b[1:], memo) + 1,
        _dl_brute(a[1:], b[1:], memo) + (a[0] != b[0]),
    )
    # unrestricted transposition: a[0] pairs with some later b[j]
    # and b[0] with some later a[i]; everything between is
    # deleted/inserted around one unit-cost swap
    for i in range(1, len(a)):
        for j in range(1, len(b)):
            if a[i] == b[0] and a[0] == b[j]:
                cost = (
                    (i - 1)
                    + 1
                    + (j - 1)
                    + _dl_brute(a[i + 1 :], b[j + 1 :], memo)
                )
                best = min(best, cost)
    memo[key] = best
    return best


def test_damerau_levenshtein_known_cases():
    from funding_monitoring_spark.operators.fuzzyjoin import (
        damerau_levenshtein,
    )

    assert damerau_levenshtein("CA", "ABC") == 2  # NOT the OSA 3
    assert damerau_levenshtein("ab", "ba") == 1
    assert damerau_levenshtein("teh", "the") == 1
    assert damerau_levenshtein("", "abc") == 3
    assert damerau_levenshtein("abc", "") == 3
    assert damerau_levenshtein("abc", "abc") == 0
    assert damerau_levenshtein("ac", "cba") == 2


def test_damerau_levenshtein_matches_duckdb():
    """Pin the Lowrance-Wagner matrix to DuckDB's independent
    unrestricted implementation on random small-alphabet strings
    (tiny alphabets force transposition-rich optimal paths)."""
    import duckdb

    from funding_monitoring_spark.operators.fuzzyjoin import (
        damerau_levenshtein,
    )

    rng = random.Random(41)
    con = duckdb.connect()
    for _ in range(300):
        a = "".join(
            rng.choice("abc") for _ in range(rng.randint(0, 8))
        )
        b = "".join(
            rng.choice("abc") for _ in range(rng.randint(0, 8))
        )
        want = con.execute(
            "SELECT damerau_levenshtein(?, ?)", [a, b]
        ).fetchone()[0]
        assert damerau_levenshtein(a, b) == want, (a, b)


def test_damerau_levenshtein_matches_recursive_brute():
    """And to the exhaustive recursive formulation — two independent
    checks on the same matrix."""
    from funding_monitoring_spark.operators.fuzzyjoin import (
        damerau_levenshtein,
    )

    rng = random.Random(43)
    for _ in range(120):
        a = "".join(
            rng.choice("ab") for _ in range(rng.randint(0, 6))
        )
        b = "".join(
            rng.choice("ab") for _ in range(rng.randint(0, 6))
        )
        assert damerau_levenshtein(a, b) == _dl_brute(a, b), (a, b)


def _dl_pairs_brute(rows, d):
    from funding_monitoring_spark.operators.fuzzyjoin import (
        damerau_levenshtein,
    )

    out = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            (ia, ga, sa), (ib, gb, sb) = rows[i], rows[j]
            if ga != gb:
                continue
            lo, hi = (ia, ib) if ia < ib else (ib, ia)
            dist = damerau_levenshtein(sa, sb)
            if dist <= d:
                out.add((ga, lo, hi, dist))
    return out


def test_damerau_join_equals_brute_force(spark):
    """damerau_join must be EXACTLY the cross-join answer on a corpus
    of mutated clones where the mutations are transposition-heavy —
    pairs at DL d but Levenshtein d+1 MUST appear (the metric's whole
    point) and the widened d*(q+1)+1 prefix budget must not lose
    them."""
    from funding_monitoring_spark.operators.fuzzyjoin import (
        damerau_join,
    )

    rng = random.Random(47)
    alpha = "abcdefghij"
    rows = []
    rid = 0
    for c in range(12):
        seed = "".join(rng.choice(alpha) for _ in range(rng.randint(8, 20)))
        rows.append((rid, "g", seed))
        rid += 1
        for _ in range(rng.randint(1, 3)):
            s = list(seed)
            for _ in range(rng.randint(1, 2)):
                op = rng.choice("tsid")
                if op == "t" and len(s) >= 2:
                    k = rng.randrange(len(s) - 1)
                    s[k], s[k + 1] = s[k + 1], s[k]
                elif op == "s" and s:
                    k = rng.randrange(len(s))
                    s[k] = rng.choice(alpha)
                elif op == "i":
                    k = rng.randrange(len(s) + 1)
                    s.insert(k, rng.choice(alpha))
                elif op == "d" and s:
                    del s[rng.randrange(len(s))]
            rows.append((rid, "g", "".join(s)))
            rid += 1
    d = 2
    df = spark.createDataFrame(rows, "id long, g string, s string")
    got = {
        (r.g, r.id_a, r.id_b, r.dist)
        for r in damerau_join(
            df.repartition(5), "id", "g", "s", d, q=3
        ).collect()
    }
    want = _dl_pairs_brute(rows, d)
    assert got == want
    # the fixture must exercise the metric: at least one pair whose
    # DL is within d but whose Levenshtein is not
    assert any(
        _lev(rows[lo][2], rows[hi][2]) > dist
        for (_, lo, hi, dist) in want
    ), "fixture produced no transposition-advantaged pair"
