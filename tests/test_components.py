"""Connected-components unit semantics: transitive closure, chain
diameter, singleton handling, non-convergence guard."""

from __future__ import annotations

import pytest

from funding_monitoring_spark.operators.components import (
    connected_components,
    dedup_cluster_assignment,
)


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a long, id_b long")


def test_transitive_closure(spark):
    # A~B, B~C, plus D~E: two clusters through transitivity
    comp = connected_components(_pairs(spark, [(1, 2), (2, 3), (10, 11)]))
    got = {r["id"]: r["cluster_id"] for r in comp.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_chain_converges(spark):
    # path graph 0-1-2-...-9: diameter 9 — needs several propagation
    # rounds, well within the default cap
    comp = connected_components(_pairs(spark, [(i, i + 1) for i in range(9)]))
    labels = {r["cluster_id"] for r in comp.collect()}
    assert labels == {0}


def test_non_convergence_raises(spark):
    with pytest.raises(RuntimeError, match="no convergence"):
        connected_components(
            _pairs(spark, [(i, i + 1) for i in range(9)]), max_iter=2
        )


def test_assignment_covers_singletons(spark):
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(6)], "doc_id long, text string"
    )
    out = dedup_cluster_assignment(docs, _pairs(spark, [(0, 1), (1, 4)]))
    rows = {r["doc_id"]: (r["cluster_id"], r["is_canonical"]) for r in out.collect()}
    assert rows[0] == (0, True) and rows[1] == (0, False) and rows[4] == (0, False)
    # untouched docs are their own canonical singletons
    assert rows[2] == (2, True) and rows[3] == (3, True) and rows[5] == (5, True)
    # exactly one canonical per cluster
    assert sum(1 for c, canon in rows.values() if canon) == 4
