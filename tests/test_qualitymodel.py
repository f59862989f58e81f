"""Learned quality classifier (operators/qualitymodel.py): feature
densification edges, training determinism, separable-corpus learning,
and loud refusals."""

import pytest
from pyspark.sql import functions as F

from funding_monitoring_spark.operators.qualitymodel import (
    classifier_report,
    hashed_features,
    quality_classifier_scores,
    train_quality_classifier,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_feature_shape_and_edges(spark):
    df = _docs(
        spark,
        [(1, "a b c a"), (2, ""), (3, "   "), (4, "x " * 60)],
    )
    got = {
        r.doc_id: r
        for r in hashed_features(
            df, dims=8, label_min_tokens=50
        ).collect()
    }
    assert all(len(r.x) == 10 for r in got.values())
    # bias slot is 1.0 for every doc, length slot = n_tokens/100
    for did, r in got.items():
        assert r.x[9] == 1.0
        assert r.x[8] == pytest.approx(r.n_tokens / 100.0)
    # token frequencies sum to 1 for non-empty docs, 0 for empty
    assert sum(got[1].x[:8]) == pytest.approx(1.0)
    assert sum(got[2].x[:8]) == 0.0 and got[2].n_tokens == 0
    assert sum(got[3].x[:8]) == 0.0  # whitespace-only
    # label is the length prior
    assert got[1].y == 0.0 and got[4].y == 1.0


def test_training_is_deterministic(spark):
    df = _docs(
        spark,
        [(i, ("w%d " % (i % 7)) * (10 + 5 * (i % 9))) for i in range(40)],
    )
    feats = hashed_features(df, dims=8, label_min_tokens=30)
    w1 = train_quality_classifier(feats, dims=8, steps=6, lr=4.0)
    w2 = train_quality_classifier(feats, dims=8, steps=6, lr=4.0)
    assert w1 == w2
    assert any(v != 0.0 for v in w1)  # it moved


def test_separable_corpus_learns(spark):
    # long docs (>=50 tokens) vs short docs — separable on the
    # length slot; the classifier must beat the majority class
    rows = [(i, "tok " * 80) for i in range(20)] + [
        (100 + i, "tok " * 10) for i in range(20)
    ]
    df = _docs(spark, rows)
    feats = hashed_features(df, dims=8, label_min_tokens=50)
    w = train_quality_classifier(feats, dims=8, steps=20, lr=8.0)
    rep = classifier_report(feats, w).collect()[0]
    assert rep.n_docs == 40 and rep.n_positive == 20
    assert rep.accuracy == 1.0
    scores = quality_classifier_scores(feats, w)
    assert scores.filter(
        F.col("predicted") != F.col("label")
    ).count() == 0


def test_empty_corpus_refuses(spark):
    df = _docs(spark, []).filter(F.lit(False))
    feats = hashed_features(df, dims=8)
    with pytest.raises(ValueError, match="empty"):
        train_quality_classifier(feats, dims=8, steps=1)
