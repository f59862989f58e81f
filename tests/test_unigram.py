"""operators/unigram.py: the Viterbi core is pinned to brute-force
segmentation enumeration (optimal cost + the shortest-piece tie
rule), and the distributed trainer to an independent dict-based EM
replay on a tiny corpus."""

from __future__ import annotations

import itertools
import random

import pytest

from funding_monitoring_spark.operators.unigram import (
    MAX_PIECE,
    cost_of,
    unigram_lm_train,
    viterbi_segment,
    word_substrings,
)


def _all_segmentations(word, vocab, max_piece=MAX_PIECE):
    if not word:
        yield []
        return
    for l in range(1, min(max_piece, len(word)) + 1):
        if word[:l] in vocab:
            for rest in _all_segmentations(
                word[l:], vocab, max_piece
            ):
                yield [word[:l]] + rest


def test_viterbi_optimal_cost_random():
    rng = random.Random(83)
    for _ in range(40):
        word = "".join(
            rng.choice("ab") for _ in range(rng.randint(1, 9))
        )
        costs = {"a": 10, "b": 20}
        for p in set(
            word[i:j]
            for i in range(len(word))
            for j in range(i + 2, min(i + MAX_PIECE, len(word)) + 1)
        ):
            if rng.random() < 0.6:
                costs[p] = rng.randint(1, 60)
        got = viterbi_segment(word, costs)
        assert "".join(got) == word
        best = min(
            sum(costs[p] for p in seg)
            for seg in _all_segmentations(word, costs)
        )
        assert sum(costs[p] for p in got) == best


def test_viterbi_tie_prefers_shortest_piece_backward():
    # "aa": a+a costs 10, aa costs 10 — tie; backward step at pos 2
    # must take the 1-char piece
    assert viterbi_segment("aa", {"a": 5, "aa": 10}) == ["a", "a"]


def test_viterbi_unsegmentable_raises():
    with pytest.raises(ValueError, match="cannot be segmented"):
        viterbi_segment("abc", {"a": 1, "b": 1})


def test_word_substrings():
    assert sorted(set(word_substrings("abc", 2))) == [
        "a",
        "ab",
        "b",
        "bc",
        "c",
    ]


def test_cost_of_is_half_up():
    import math

    # a ratio whose -ln lands near .5 at the integer scale is hard to
    # construct exactly; instead pin the formula shape
    assert cost_of(1, 1) == 0
    x = -math.log(3 / 7) * 1_000_000
    assert cost_of(3, 7) == int(math.floor(x + 0.5))


def test_train_matches_dict_replay(spark):
    """The distributed trainer must equal an independent dict-based
    replay of the same fixed EM on a tiny corpus (vocab selection,
    init costs, both E-steps, Laplace M-step)."""
    from collections import Counter

    rows = [
        (1, "aba bab aba cc"),
        (2, "aba cc cc dd"),
        (3, "bab dd aba"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.piece: (r.cost, r.n_used)
        for r in unigram_lm_train(
            docs, vocab_multi=3, max_piece=3
        ).collect()
    }

    words = Counter(
        w for _, t in rows for w in t.split()
    )
    cand = Counter()
    for w, wc in words.items():
        for i in range(len(w)):
            for l in range(1, min(3, len(w) - i) + 1):
                cand[w[i : i + l]] += wc
    singles = {p: c for p, c in cand.items() if len(p) == 1}
    multis = dict(
        sorted(
            ((p, c) for p, c in cand.items() if len(p) > 1),
            key=lambda kv: (-kv[1], kv[0]),
        )[:3]
    )
    vocab = {**singles, **multis}
    total0 = sum(vocab.values())
    costs0 = {p: cost_of(c, total0) for p, c in vocab.items()}

    def estep(costs):
        c = Counter()
        for w, wc in words.items():
            for piece in viterbi_segment(w, costs, 3):
                c[piece] += wc
        return c

    c1 = estep(costs0)
    total1 = sum(c1.values()) + len(costs0)
    costs1 = {
        p: cost_of(c1.get(p, 0) + 1, total1) for p in costs0
    }
    c2 = estep(costs1)
    want = {
        p: (costs1[p], c2.get(p, 0)) for p in costs0
    }
    assert got == want
