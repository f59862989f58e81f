"""Mergeable frequency sketches: Misra-Gries candidate generation
with exact verification — the two-pass pattern that finds corpus-scale
frequent items WITHOUT shuffling the full distinct-item space.

The exact `topk.heavy_hitters` plan shuffles one row per distinct
(group, item) per task; fine when the item space fits a shuffle, fatal
when it is (say) every token of a 100 TB corpus. The classic fix
(Misra & Gries 1982) is a bounded per-partition summary:

  pass 1 — each partition keeps at most ``capacity`` counters via the
  MG decrement rule. Pigeonhole guarantee: any item with GLOBAL
  frequency > N/capacity survives in at least one partition summary,
  so the union of summaries (≤ capacity × partitions tiny rows) is a
  SUPERSET of every true frequent item.
  pass 2 — exact recount of the candidate set only (broadcast
  semi-join into the scan), then the threshold filter.

The result is EXACT — identical to the single-pass SQL
``HAVING count > N/capacity`` — which is why the differential oracle
can be the plain exact query: the sketch affects how much data moves,
never the answer. Candidate SETS are partitioning-dependent;
the verified OUTPUT is deterministic (any superset verifies to the
same rows).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _mg_partition(capacity: int):
    """Misra-Gries over an iterator of pandas batches holding an
    ``item`` column; emits the partition's surviving candidates."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        counters: dict = {}
        n = 0
        for pdf in batches:
            for item in pdf["item"]:
                n += 1
                if item in counters:
                    counters[item] += 1
                elif len(counters) < capacity:
                    counters[item] = 1
                else:
                    # decrement-all; drop zeros (the MG step)
                    dead = []
                    for k in counters:
                        counters[k] -= 1
                        if counters[k] == 0:
                            dead.append(k)
                    for k in dead:
                        del counters[k]
        # one NULL-item row carries the partition's total count, so
        # the global N comes out of THIS pass — no second scan for it
        yield pd.DataFrame(
            {
                "item": list(counters.keys()) + [None],
                "part_n": [0] * len(counters) + [n],
            }
        )

    return run


def frequent_items_exact_2pass(
    df: DataFrame,
    item: Column,
    capacity: int = 100,
) -> DataFrame:
    """All items with frequency strictly greater than N/``capacity``
    (N = total item count), found with the MG candidate pass + exact
    verify. Returns (item, n) — exact counts, deterministic.

    Scan profile — exactly two passes over the data, the design
    minimum: pass 1 (one scan) emits ≤ capacity+1 rows per partition,
    carrying both the candidates and the partition row counts (so the
    global N needs no separate counting scan); pass 2 (the other scan)
    aggregates only rows whose item is in the (broadcast, checkpointed)
    candidate set. The full distinct-item space never shuffles.

    NULL items are excluded from counting (a NULL row would collide
    with the summary's NULL-item partition-count sentinel, and
    "frequency of NULL" is not a meaningful heavy hitter).

    Contract: items are counted by their STRING rendering — the MG
    summary's Arrow schema is pinned to ``item string``, so the item
    column is cast to string up front (a bigint user_id and the
    string '42' are the same item). The cast happens once in the
    scan projection; both passes and the semi-join key use the same
    casted column, so no implicit cast can diverge at the Arrow or
    join boundary."""
    if capacity < 2:
        raise ValueError(
            "capacity must be >= 2 (capacity=1 makes the threshold "
            "N — nothing can exceed it — and degenerates the summary)"
        )
    items = df.select(item.cast("string").alias("item")).filter(
        F.col("item").isNotNull()
    )
    # checkpoint the tiny summary: it feeds BOTH the candidate set and
    # the total, and without it each consumer would re-run the MG scan
    summary = items.mapInPandas(
        _mg_partition(capacity), schema="item string, part_n long"
    ).localCheckpoint(eager=True)
    candidates = (
        summary.filter(F.col("item").isNotNull())
        .select("item")
        .distinct()
    )
    total = summary.agg(F.sum("part_n").alias("_n"))
    return (
        items.join(F.broadcast(candidates), "item", "left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n") * capacity > F.col("_n"))
        .drop("_n")
    )


# ---------------------------------------------------------------------------
# Count-Min sketch: mergeable point-frequency estimates
# ---------------------------------------------------------------------------
#
# Misra-Gries (above) answers "which items are frequent"; Count-Min
# (Cormode & Muthukrishnan 2005) answers "how frequent is THIS item"
# for any item, from a fixed d x w grid of counters. The sketch is a
# pure groupBy over derived (row, bucket) keys, so Spark's partial
# aggregation IS the sketch merge: every partition combines its local
# grid map-side and the shuffle moves at most d*w rows per partition
# regardless of corpus size — the full distinct-token space never
# shuffles (the same property the MG pass has, but answering point
# queries instead of a threshold scan).
#
# Guarantees (classic): estimate >= true count always (counters only
# ever overcount), and estimate <= true + e/w * N with probability
# >= 1 - (1/e)^d per query. Both engines recompute the grid with
# exact integer arithmetic (the LCG row hashes from
# operators/sampling.py over the polynomial string fingerprint from
# operators/textstats.py), so the differential oracle checks the
# ESTIMATES bit-for-bit, not just the exact counts.

CM_DEPTH = 4
CM_WIDTH = 1024


def cm_bucket(fp: Column, row: int, width: int = CM_WIDTH) -> Column:
    """Bucket of a fingerprint in sketch row ``row``: the seeded LCG
    mix (deterministic, cross-engine) reduced mod the grid width."""
    from funding_monitoring_spark.operators.sampling import key_hash

    return F.pmod(key_hash(fp, seed=row), F.lit(width))


def cm_sketch(
    items: DataFrame,
    fp: Column,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """Build the d x w counter grid over one pass: each item row
    explodes to its ``depth`` (row, bucket) cells, and a single
    groupBy counts them. Output: (cm_row, cm_bucket, n) — at most
    depth*width rows total, broadcastable to any consumer.

    NULL fingerprints are excluded from counting (same contract as
    frequent_items_exact_2pass: "frequency of NULL" is not a
    meaningful point query, and a NULL fp hashes to NULL cells that
    no probe can ever match)."""
    cells = F.posexplode(
        F.array(*[cm_bucket(fp, j, width) for j in range(depth)])
    )
    return (
        items.filter(fp.isNotNull())
        .select(cells.alias("cm_row", "cm_bucket"))
        .groupBy("cm_row", "cm_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cm_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    fp: Column,
    key_cols: list[str],
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """Point estimates for a query set: min over the query item's
    ``depth`` cells. The grid is tiny (<= depth*width rows) so it
    broadcasts; the query side never shuffles. Returns the query
    columns plus ``cm_n``. Cells no query item hashes into are
    irrelevant; cells that exist in the grid but hold only OTHER
    items' counts are exactly the overcount the min tracks.

    A NULL query fingerprint FAILS THE JOB (row-level raise inside
    the bucket projection — no extra scan): NULL buckets match no
    cell, and coalescing the miss to 0 would return a confident zero
    where the documented "estimate >= true count" guarantee cannot
    hold. Filter NULLs out first if they are expected."""
    checked = F.when(fp.isNotNull(), fp).otherwise(
        F.raise_error(
            F.lit(
                "cm_estimate: NULL query fingerprint — the estimate "
                "is undefined for NULL keys; filter them out first"
            )
        )
    )
    probes = queries.select(
        *key_cols,
        F.posexplode(
            F.array(
                *[cm_bucket(checked, j, width) for j in range(depth)]
            )
        ).alias("cm_row", "cm_bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["cm_row", "cm_bucket"], "left")
        .groupBy(*key_cols)
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("cm_n"))
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) sketch: mergeable distinct counts that can
# INTERSECT
# ---------------------------------------------------------------------------
#
# HLL (Spark's approx_count_distinct) unions cheaply but cannot
# estimate |A ∩ B|; the KMV sketch (Bar-Yossef et al. 2002; Beyer et
# al. 2007 for the unbiased estimator and set operations) keeps the k
# smallest distinct hash values per set, and because min-k of a union
# is computable from the per-set min-k arrays, union/intersection/
# Jaccard all come out of the sketches alone. That's the tool for
# "how much does the training corpus overlap the eval set" at 100 TB,
# where the exact distinct-intersection groupBy is the cost ceiling.
#
# Estimators (k-th smallest hash h_k over a domain of size M):
#   distinct(A)  ≈ (k-1) * M / h_k          (exact when |A| < k)
#   K(A ∪ B)     = first k of sorted merge of K(A), K(B)
#   ρ            = |K(A∪B) ∩ K(A) ∩ K(B)| / k
#   |A ∩ B|      ≈ ρ * distinct-estimate(A ∪ B),  Jaccard ≈ ρ
#
# Everything is exact integer/IEEE arithmetic over the deterministic
# polynomial fingerprints, so the differential oracle recomputes the
# ESTIMATES bit-for-bit — approximation error is an oracle-tracked
# number, never an invisible hazard.

KMV_K = 256
KMV_FANOUT = 64


def kmv_min_k(
    df: DataFrame,
    value: Column,
    group: Column,
    k: int = KMV_K,
    fanout: int = KMV_FANOUT,
) -> DataFrame:
    """Per-group k smallest DISTINCT values as a sorted array column
    ``kmv``, via a two-level tree aggregation: level 1 reduces each
    (group, value mod fanout) bucket to at most k values (collect_set
    state is bounded by the bucket's distinct count, and the shuffle
    carries at most fanout*k rows per group), level 2 merges the
    bucket arrays. A value lands in exactly one bucket, so the merged
    arrays are duplicate-free by construction."""
    lvl1 = (
        df.select(group.alias("g"), value.alias("v"))
        .groupBy("g", F.pmod(F.col("v"), F.lit(fanout)).alias("_b"))
        .agg(F.slice(F.array_sort(F.collect_set("v")), 1, k).alias("_arr"))
    )
    return lvl1.groupBy("g").agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("_arr"))), 1, k
        ).alias("kmv")
    )


def kmv_distinct_estimate(
    kmv: Column, domain: int, k: int = KMV_K
) -> Column:
    """Unbiased distinct-count estimate from a min-k array: exact size
    while the sketch is not full (the set fit entirely), else
    (k-1)*M / h_k. (k-1)*M stays below 2^53, so the double literal is
    exact and the single IEEE division is bit-identical cross-engine."""
    return F.when(
        F.size(kmv) < k, F.size(kmv).cast("double")
    ).otherwise(
        F.lit(float((k - 1) * domain)) / F.element_at(kmv, k)
    )
