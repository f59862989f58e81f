"""Runtime bloom join filter: scan-stage pre-filtering of a big fact
table against a bloom built from the (small) build side's join keys.

The shuffle a selective join pays is proportional to the PROBE side's
full row count, even when only a sliver of it can ever match — at
100 TB that sliver-vs-table gap is the single biggest join cost. The
classic engine fix (Bloom-joins in distributed query processing;
Spark's own runtime row-group filtering implements the same idea
inside AQE) is: hash the build side's keys into a small bit array,
ship the bits to every scan task, and drop probe rows whose key
provably isn't on the build side BEFORE they reach the exchange.

This module is that technique as an explicit, composable operator:

- the bit array is built from the build side's keys with the repo's
  deterministic LCG (operators/sampling.key_hash), collected as at
  most ``bits`` distinct positions (bounded by construction — the
  build side of a selective join is broadcast-sized by assumption);
- the probe-side predicate is pure scan-stage column algebra
  (element_at into a 63-bit-word literal array + shiftright/AND), so
  Catalyst evaluates it inside WholeStageCodegen next to the scan —
  no UDF, no extra shuffle, and Parquet still sees its own pushdowns;
- false positives pass the filter and die in the real join, so the
  composition `bloom_prefilter(fact) JOIN dim` is EXACTLY
  `fact JOIN dim` — which is why the differential oracle can be the
  plain join.

Word layout is 63 bits per array element so every word fits a
non-negative Spark bigint literal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from funding_monitoring_spark.operators.sampling import key_hash

BLOOM_JOIN_BITS = 4096
BLOOM_JOIN_K = 4
_WORD_BITS = 63


def bloom_mask_words(
    keys: DataFrame,
    key: Column,
    bits: int = BLOOM_JOIN_BITS,
    k: int = BLOOM_JOIN_K,
) -> list[int]:
    """Build the bit array from the build side's keys; returns
    ceil(bits/63) non-negative ints, each < 2^63. One distinct over
    at most ``bits`` positions comes back to the driver — bounded by
    the bloom size, not the build side's row count. NULL keys are
    dropped before hashing, mirroring bloom_prefilter's NULL-drop
    contract (a NULL join key cannot match an equi-join)."""
    pos_rows = (
        keys.filter(key.isNotNull())
        .select(
            F.explode(
                F.array(
                    *[
                        F.pmod(key_hash(key, seed=j), F.lit(bits))
                        for j in range(k)
                    ]
                )
            ).alias("p")
        )
        .distinct()
        .collect()
    )
    words = [0] * (-(-bits // _WORD_BITS))
    for r in pos_rows:
        p = int(r.p)
        words[p // _WORD_BITS] |= 1 << (p % _WORD_BITS)
    return words


def bloom_prefilter(
    probe: DataFrame,
    key: Column,
    mask_words: list[int],
    bits: int = BLOOM_JOIN_BITS,
    k: int = BLOOM_JOIN_K,
) -> DataFrame:
    """Keep probe rows whose key MIGHT be in the bloom (all k bits
    set). Scan-stage only: literal word array + element_at +
    shiftright — whole-stage-codegen'd next to the scan, upstream of
    any exchange. NULL keys are dropped (a NULL join key cannot match
    an equi-join anyway)."""
    words = F.array(*[F.lit(w).cast("bigint") for w in mask_words])
    cond = key.isNotNull()
    for j in range(k):
        p = F.pmod(key_hash(key, seed=j), F.lit(bits))
        word = F.element_at(
            words, (p / F.lit(_WORD_BITS)).cast("int") + F.lit(1)
        )
        bit = F.call_function(
            "shiftright", word, (p % F.lit(_WORD_BITS)).cast("int")
        ).bitwiseAND(F.lit(1))
        cond = cond & (bit == F.lit(1))
    return probe.filter(cond)
