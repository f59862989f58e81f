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
        for pdf in batches:
            for item in pdf["item"]:
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
        yield pd.DataFrame({"item": list(counters.keys())})

    return run


def frequent_items_exact_2pass(
    df: DataFrame,
    item: Column,
    capacity: int = 100,
) -> DataFrame:
    """All items with frequency strictly greater than N/``capacity``
    (N = total item count), found with the MG candidate pass + exact
    verify. Returns (item, n) — exact counts, deterministic.

    Shuffle profile: pass 1 moves ≤ capacity rows per partition;
    pass 2 aggregates only rows whose item is in the (broadcast)
    candidate set. The full distinct-item space never shuffles."""
    items = df.select(item.alias("item"))
    candidates = items.mapInPandas(
        _mg_partition(capacity), schema="item string"
    ).distinct()
    total = items.agg(F.count(F.lit(1)).alias("_n"))
    return (
        items.join(F.broadcast(candidates), "item", "left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n") * capacity > F.col("_n"))
        .drop("_n")
    )
