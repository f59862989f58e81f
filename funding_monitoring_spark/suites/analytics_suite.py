"""Round-4 analytics extensions, two families:

Monitoring — the questions a rates monitor asks after trailing means
(the reference stops at funding_rates_etl.py:60-75 and full-replace
snapshots, active_futures_etl.py:95-118): rolling z-score and robust
median/MAD anomaly scoring, tick-over-tick snapshot diffing, exact
heavy hitters, the cross-series correlation matrix and rolling hedge
ratios, OLS trends, strict-order funnels with latency quantiles,
triangle counting on the capped co-occurrence graph, the
hour→day→month rollup cascade, the missing-ticks heartbeat report,
and a shuffle-risk skew profiler.

Training-data (north-star surface, BASELINE.json): fixed-size group
sampling, mixture planning, the BPE pair-count primitive and full
tokenizer training, Misra-Gries two-pass frequent items, per-source
KL drift, quality-threshold ablation, unigram log-prob scoring,
vocabulary coverage curves, Morton z-values, and distributed
power-iteration PCA over the embedding covariance.

Every query has a DuckDB oracle; cross-engine float discipline
follows the verify-skill gotchas (grid-aware rounding, exact decimal
means, -0.0 canonicalization, bit-identical division instead of
rounding where inputs are already engine-exact).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from funding_monitoring_spark.operators.anomaly import (
    flag_anomalies,
    rolling_zscore,
)
from funding_monitoring_spark.operators.diffs import snapshot_diff
from funding_monitoring_spark.operators.sampling import (
    fixed_size_group_sample,
    oracle_hash_expr,
)
from funding_monitoring_spark.operators.textstats import char_pairs
from funding_monitoring_spark.operators.topk import heavy_hitters
from funding_monitoring_spark.registry import query
from funding_monitoring_spark.operators.cachescope import (
    scoped_persist,
)
from funding_monitoring_spark.sources.tables import load_table

ANOMALY_ORACLE = """
    WITH scored AS (
        SELECT event_id, event_type,
               COUNT(value) OVER w AS baseline_n,
               ROUND(AVG(value) OVER w, 6) AS baseline_avg,
               CASE WHEN COUNT(value) OVER w >= 10
                         AND STDDEV_SAMP(value) OVER w > 0
                    THEN ROUND((value - AVG(value) OVER w)
                               / STDDEV_SAMP(value) OVER w, 4) + 0.0
               END AS zscore
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, event_type, baseline_n, baseline_avg, zscore,
           COALESCE(CAST(ABS(zscore) > 2.0 AS INT), 0) AS is_anomaly
    FROM scored
"""


@query("funding_rate_anomaly", ANOMALY_ORACLE)
def q_funding_rate_anomaly(spark, sf_dir):
    """Rolling z-score alerting over the rate stream (events.value as
    the rate, event_type as the symbol): each observation scored
    against its own trailing-20 baseline, alert when |z| > 2. One
    shuffle on the symbol key, all four window aggregates in a single
    Window operator (plan-gated, tests/test_plans.py). The alert flag
    is derived from the ROUNDED score on both engines, so the decision
    boundary is engine-stable."""
    events = load_table(spark, sf_dir, "events")
    scored = rolling_zscore(
        events,
        ["event_type"],
        [F.col("ts"), F.col("event_id")],
        "value",
        n=20,
        min_obs=10,
    )
    return flag_anomalies(scored).select(
        "event_id",
        "event_type",
        "baseline_n",
        "baseline_avg",
        "zscore",
        "is_anomaly",
    )


SNAPSHOT_DIFF_ORACLE = """
    WITH old_t AS (
        SELECT event_id, value FROM events WHERE event_id % 11 <> 3
    ),
    new_t AS (
        SELECT event_id,
               CASE WHEN event_id % 5 = 0 THEN value + 1.5
                    ELSE value END AS value
        FROM events WHERE event_id % 11 <> 7
    )
    SELECT COALESCE(o.event_id, n.event_id) AS event_id,
           o.value AS old_value,
           n.value AS new_value,
           CASE WHEN o.event_id IS NULL THEN 'added'
                WHEN n.event_id IS NULL THEN 'removed'
                WHEN o.value IS NOT DISTINCT FROM n.value
                     THEN 'unchanged'
                ELSE 'changed' END AS diff_status
    FROM old_t o FULL OUTER JOIN new_t n ON o.event_id = n.event_id
"""


@query("snapshot_diff_ticks", SNAPSHOT_DIFF_ORACLE)
def q_snapshot_diff_ticks(spark, sf_dir):
    """What changed between two ticks of a full-replace snapshot
    (operators/diffs.py): the old tick is missing keys ≡3 (mod 11)
    (added later), the new tick is missing keys ≡7 (removed), and
    keys ≡0 (mod 5) moved by exactly +1.5 (changed — an FP-exact
    delta, so the diff itself needs no rounding). Single full-outer
    hash join on the key, row-local CASE classification."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    old = ev.filter(F.col("event_id") % 11 != 3)
    new = ev.filter(F.col("event_id") % 11 != 7).withColumn(
        "value",
        F.when(
            F.col("event_id") % 5 == 0, F.col("value") + 1.5
        ).otherwise(F.col("value")),
    )
    return snapshot_diff(old, new, ["event_id"], ["value"])


HEAVY_HITTERS_ORACLE = """
    WITH counts AS (
        SELECT event_type, user_id, COUNT(*) AS n
        FROM events GROUP BY event_type, user_id
    ),
    ranked AS (
        SELECT event_type, user_id, n,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY n DESC, user_id ASC) AS rnk
        FROM counts
    )
    SELECT event_type, user_id, n, rnk FROM ranked WHERE rnk <= 10
"""


@query("heavy_hitter_users", HEAVY_HITTERS_ORACLE)
def q_heavy_hitter_users(spark, sf_dir):
    """Exact top-10 most active users per event type
    (operators/topk.py heavy_hitters): map-side partial counting means
    the shuffle carries one row per distinct (type, user) pair per
    task — the scale-safe frequency plan (plan-gated for partial
    aggregation, tests/test_plans.py)."""
    events = load_table(spark, sf_dir, "events")
    return heavy_hitters(
        events, ["event_type"], ["user_id"], k=10, count_col="n"
    ).withColumnRenamed("rank", "rnk")


CORRELATION_ORACLE = """
    WITH per AS (
        SELECT date_trunc('hour', ts) AS h, event_type,
               ROUND(SUM(value), 6) AS s
        FROM events GROUP BY 1, 2
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           ROUND(CORR(a.s, b.s), 6) + 0.0 AS corr_r,
           COUNT(*) AS n_buckets
    FROM per a JOIN per b ON a.h = b.h
    WHERE a.event_type < b.event_type
    GROUP BY a.event_type, b.event_type
"""


@query("event_type_correlation", CORRELATION_ORACLE)
def q_event_type_correlation(spark, sf_dir):
    """Pairwise Pearson correlation between the hourly value-sums of
    every pair of event types — the cross-series co-movement matrix a
    rates monitor runs across symbols. Shape: one groupBy shuffle to
    the (hour, type) grain, a self-equi-join on the hour bucket
    (both sides share the grain — at scale the hourly table is tiny
    relative to raw events; the heavy lifting happened in the first
    map-side-combined aggregate), then corr() per pair. Bucket sums
    are rounded before corr on BOTH engines so the correlation inputs
    are bit-identical."""
    events = load_table(spark, sf_dir, "events")
    # checkpoint the hourly grain: it feeds BOTH sides of the
    # self-join, and Catalyst does not reuse the aliased subplans —
    # without this the raw table scans twice (measured)
    per = (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("h"), "event_type"
        )
        .agg(F.round(F.sum("value"), 6).alias("s"))
        .localCheckpoint(eager=True)
    )
    a = per.alias("a")
    b = per.alias("b")
    return (
        a.join(b, F.col("a.h") == F.col("b.h"))
        .filter(F.col("a.event_type") < F.col("b.event_type"))
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(
            (F.round(F.corr(F.col("a.s"), F.col("b.s")), 6) + F.lit(0.0))
            .alias("corr_r"),
            F.count(F.lit(1)).alias("n_buckets"),
        )
    )


_RESERVOIR_SEED = 7
RESERVOIR_ORACLE = f"""
    WITH ranked AS (
        SELECT doc_id, source, n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY ({oracle_hash_expr("doc_id", _RESERVOIR_SEED)})
                            ASC, doc_id ASC) AS sample_rank
        FROM documents
    )
    SELECT doc_id, source, n_chars, sample_rank
    FROM ranked WHERE sample_rank <= 10
"""


@query("reservoir_sample_by_source", RESERVOIR_ORACLE)
def q_reservoir_sample_by_source(spark, sf_dir):
    """Exactly-10-per-source uniform document sample
    (operators/sampling.py fixed_size_group_sample): hash-order
    row_number gives reservoir-sampling semantics as a pure function
    of the keys — re-runs and other engines select the SAME rows (the
    oracle re-derives membership from the identical integer hash).
    One shuffle on source, no randomness, no state."""
    docs = load_table(spark, sf_dir, "documents")
    return fixed_size_group_sample(
        docs, "source", "doc_id", k=10, seed=_RESERVOIR_SEED
    ).select("doc_id", "source", "n_chars", "sample_rank")


#: per-source mixture weights for the plan below; sources not named
#: take the default. Arbitrary by design — the OPERATOR is the point.
MIXTURE_WEIGHTS = {"src0": 0.2, "src1": 0.15, "src2": 0.1}
MIXTURE_DEFAULT_W = 0.03
MIXTURE_CHAR_BUDGET = 50_000

_w_sql = " ".join(
    f"WHEN source = '{s}' THEN {w}" for s, w in sorted(MIXTURE_WEIGHTS.items())
)
#: weights cast to DOUBLE in the oracle — DuckDB types bare 0.2 as
#: DECIMAL, whose string repr ("0.200000") would diverge from Spark's
#: double even when values agree.
MIXTURE_ORACLE = f"""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(CASE {_w_sql} ELSE {MIXTURE_DEFAULT_W} END AS DOUBLE)
               AS weight,
           ROUND(LEAST(CAST(1.0 AS DOUBLE),
                 {MIXTURE_CHAR_BUDGET} *
                 CAST(CASE {_w_sql} ELSE {MIXTURE_DEFAULT_W} END AS DOUBLE)
                 / CAST(SUM(n_chars) AS BIGINT)), 6) AS keep_fraction
    FROM documents GROUP BY source
"""


@query("dataset_mixture_plan", MIXTURE_ORACLE)
def q_dataset_mixture_plan(spark, sf_dir):
    """Training-mix planning: given target per-source weights and a
    global character budget, derive each source's keep-fraction
    (min(1, budget·w / chars)) from one aggregate over the corpus.
    The output drives stratified_sample (operators/sampling.py) as the
    execution step; planning is a single map-side-combined groupBy —
    no second pass over the data."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.lit(MIXTURE_DEFAULT_W)
    for s, wt in sorted(MIXTURE_WEIGHTS.items()):
        w = F.when(F.col("source") == s, F.lit(wt)).otherwise(w)
    agg = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
    return agg.select(
        "source",
        "n_docs",
        "total_chars",
        w.alias("weight"),
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(MIXTURE_CHAR_BUDGET) * w / F.col("total_chars"),
            ),
            6,
        ).alias("keep_fraction"),
    )


def _bpe_train_oracle(k: int) -> str:
    """Unrolled DuckDB CTE chain replicating bpe_train's K merge
    steps (operators/bpe.py): the same double-space `replace` algebra,
    step by step — state_i is the corpus after i merges, best_i the
    step's argmax pair. Engine-exact: every intermediate is integer
    counts and byte-identical strings. Every CTE is MATERIALIZED:
    each state_i is referenced several times by the next step, so
    DuckDB's default inlining re-expands the chain exponentially in K
    (K=20 exhausts file handles before it exhausts time)."""
    ctes = [
        """state0 AS MATERIALIZED (
        SELECT '  ' || array_to_string(
                   list_transform(range(1, length(word) + 1),
                                  i -> substr(word, i, 1)), '  ')
               || '  ' AS s
        FROM (SELECT unnest(regexp_extract_all(
                  lower(substr(text, 1, 200)), '\\S+')) AS word
              FROM documents)
    )"""
    ]
    for i in range(1, k + 1):
        p = i - 1
        ctes.append(f"""pairs{i} AS MATERIALIZED (
        SELECT unnest(list_transform(range(1, len(toks)),
                      j -> toks[j] || ' ' || toks[j + 1])) AS p
        FROM (SELECT list_filter(string_split(s, '  '),
                                 x -> x <> '') AS toks
              FROM state{p})
    )""")
        ctes.append(f"""best{i} AS MATERIALIZED (
        SELECT split_part(p, ' ', 1) AS a,
               split_part(p, ' ', 2) AS b,
               COUNT(*) AS n
        FROM pairs{i} GROUP BY p
        ORDER BY n DESC, a ASC, b ASC LIMIT 1
    )""")
        ctes.append(f"""state{i} AS MATERIALIZED (
        SELECT replace(s,
            ' ' || (SELECT a FROM best{i}) || '  '
                || (SELECT b FROM best{i}) || ' ',
            ' ' || (SELECT a FROM best{i})
                || (SELECT b FROM best{i}) || ' ') AS s
        FROM state{p}
    )""")
    selects = "\n    UNION ALL ".join(
        f"SELECT {i} AS step, a AS pair_a, b AS pair_b, "
        f"a || b AS merged, n FROM best{i}"
        for i in range(1, k + 1)
    )
    return "WITH " + ",\n    ".join(ctes) + "\n    " + selects


_BPE_MERGES = 20


@query("bpe_train_merges", _bpe_train_oracle(_BPE_MERGES))
def q_bpe_train_merges(spark, sf_dir):
    """Full BPE tokenizer training, 20 merges over the corpus via the
    BATCHED trainer (operators/bpe.py bpe_train_batched): per round,
    one map-side-combined pair count selects a provably
    sequential-equivalent prefix of merges (contiguous rank order,
    pairwise symbol-disjoint, merged strings outside the vocab,
    counts strictly above the first excluded pair) and one fold
    projection applies them all — the fixed per-step job overhead
    that capped usable K amortizes by the batch size (measured ~1.9×
    at K=20/sf0.01; the unbatched loop stays available as bpe_train).
    The oracle unrolls the SEQUENTIAL algebra as a DuckDB CTE chain —
    exactly the point: batch selection is exactness-preserving, so
    the sequential oracle keeps checking it. Also property-tested
    against a pure-Python BPE reference
    (tests/test_analytics_ops.py)."""
    from funding_monitoring_spark.operators.bpe import bpe_train_batched

    docs = load_table(spark, sf_dir, "documents")
    return bpe_train_batched(docs, n_merges=_BPE_MERGES)


BPE_ORACLE = """
    WITH t AS (
        SELECT lower(substr(text, 1, 200)) AS t FROM documents
    ),
    p AS (
        SELECT unnest(list_transform(range(1, length(t)),
                                     i -> substr(t, i, 2))) AS pair
        FROM t WHERE length(t) >= 2
    )
    SELECT pair, COUNT(*) AS n FROM p
    GROUP BY pair ORDER BY n DESC, pair ASC LIMIT 30
"""


@query("bpe_pair_counts", BPE_ORACLE)
def q_bpe_pair_counts(spark, sf_dir):
    """The inner job of BPE tokenizer training: count adjacent
    character pairs across the corpus, global top-30. Training is a
    driver-side loop of exactly this job (count pairs → merge the max
    → repeat); the per-row fan-out is built-in higher-order functions
    (operators/textstats.py char_pairs — sequence→transform→substr,
    whole-stage codegen, no Python), bounded at 200 chars/doc, and
    the count is a map-side-combined aggregate. Global top-k uses
    TakeOrderedAndProject (per-partition heap + driver merge, no full
    sort) under a total order, so LIMIT is deterministic."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = docs.select(
        F.explode(char_pairs("text", max_chars=200)).alias("pair")
    )
    counts = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("n"))
    return counts.orderBy(F.desc("n"), F.asc("pair")).limit(30)


OHLC_ORACLE = """
    WITH r AS (
        SELECT event_type AS symbol, date_trunc('hour', ts) AS bar_ts,
               value,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type, date_trunc('hour', ts)
                   ORDER BY ts, event_id) AS rn_open,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type, date_trunc('hour', ts)
                   ORDER BY ts DESC, event_id DESC) AS rn_close
        FROM events
    )
    SELECT symbol, bar_ts,
           MAX(CASE WHEN rn_open = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_close = 1 THEN value END) AS close,
           COUNT(*) AS n_ticks
    FROM r GROUP BY symbol, bar_ts
"""


@query("ohlc_bars", OHLC_ORACLE)
def q_ohlc_bars(spark, sf_dir):
    """Hourly OHLC candlestick bars per symbol — THE time-series
    downsampling every rates/market monitor ships. One shuffle on
    (symbol, bar): open/close are min_by/max_by over the total
    (ts, event_id) order, high/low/count plain aggregates — all five
    in a single hash aggregate, no window, no self-join. Values pass
    through untouched (no arithmetic), so the compare is exact."""
    events = load_table(spark, sf_dir, "events")
    ordk = F.struct(F.col("ts"), F.col("event_id"))
    return events.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("hour", F.col("ts")).alias("bar_ts"),
    ).agg(
        F.min_by("value", ordk).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", ordk).alias("close"),
        F.count(F.lit(1)).alias("n_ticks"),
    )


COHORT_ORACLE = """
    WITH activity AS (
        SELECT user_id,
               CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
               CAST(MIN(date_trunc('week', ts)) OVER (
                   PARTITION BY user_id) AS TIMESTAMP) AS cohort_week
        FROM events
    )
    SELECT cohort_week, week,
           CAST(date_diff('day', cohort_week, week) / 7 AS INT)
               AS week_offset,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
    FROM activity GROUP BY cohort_week, week
"""


@query("cohort_retention", COHORT_ORACLE)
def q_cohort_retention(spark, sf_dir):
    """Weekly cohort-retention matrix: users grouped by first-active
    week, counted distinct in every later week. Two shuffles total —
    one window pass keyed on user_id for the cohort assignment, one
    grouped distinct-count on (cohort, week); the cohort column rides
    along instead of joining a first-seen table back (half the
    shuffles of the textbook two-table formulation)."""
    events = load_table(spark, sf_dir, "events")
    week = F.date_trunc("week", F.col("ts"))
    w = Window.partitionBy("user_id")
    activity = events.select(
        "user_id",
        week.alias("week"),
        F.min(week).over(w).alias("cohort_week"),
    )
    return activity.groupBy("cohort_week", "week").agg(
        (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
        .cast("int")
        .alias("week_offset"),
        F.countDistinct("user_id").alias("n_active"),
    )


FUNNEL_ORACLE = """
    WITH t1 AS (
        SELECT user_id, MIN(ts) AS t FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    t2 AS (
        SELECT e.user_id, MIN(e.ts) AS t
        FROM events e JOIN t1 ON e.user_id = t1.user_id
        WHERE e.event_type = 'click' AND e.ts > t1.t
        GROUP BY e.user_id
    ),
    t3 AS (
        SELECT e.user_id, MIN(e.ts) AS t
        FROM events e JOIN t2 ON e.user_id = t2.user_id
        WHERE e.event_type = 'purchase' AND e.ts > t2.t
        GROUP BY e.user_id
    )
    SELECT 1 AS stage, 'view' AS event_type,
           CAST((SELECT COUNT(*) FROM t1) AS BIGINT) AS n_users
    UNION ALL
    SELECT 2, 'click', CAST((SELECT COUNT(*) FROM t2) AS BIGINT)
    UNION ALL
    SELECT 3, 'purchase', CAST((SELECT COUNT(*) FROM t3) AS BIGINT)
"""


def _funnel_stage_times(events):
    """(t1, t2, t3): each user's strict-order stage-entry times,
    shared by the funnel count and latency queries. Every stage is
    checkpointed: stage k feeds BOTH stage k+1 and the final output,
    and stage k+1's lineage would otherwise re-derive the whole chain
    (the raw table scanned 6-8× instead of once per stage —
    measured)."""

    def stage(prev, etype):
        e = events.filter(F.col("event_type") == etype).select(
            "user_id", "ts"
        )
        if prev is not None:
            e = e.join(prev, "user_id").filter(
                F.col("ts") > F.col("t")
            ).select("user_id", "ts")
        return (
            e.groupBy("user_id")
            .agg(F.min("ts").alias("t"))
            .localCheckpoint(eager=True)
        )

    t1 = stage(None, "view")
    t2 = stage(t1, "click")
    t3 = stage(t2, "purchase")
    return t1, t2, t3


@query("event_funnel", FUNNEL_ORACLE)
def q_event_funnel(spark, sf_dir):
    """Strict-order funnel (view → later click → later purchase):
    stage k's entry time is the first qualifying event AFTER the
    user's stage-(k-1) time. Each stage is one grouped min + one
    equi-join on user_id — the joins chain on the same key, so a
    user-bucketed layout runs the whole funnel exchange-free; stages
    checkpoint so the chain scans the feed once per stage, not
    once per DOWNSTREAM consumer. Output is the 3-row stage count
    table."""
    events = load_table(spark, sf_dir, "events")
    t1, t2, t3 = _funnel_stage_times(events)
    rows = []
    for i, (name, t) in enumerate(
        [("view", t1), ("click", t2), ("purchase", t3)], start=1
    ):
        rows.append(
            t.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(i).alias("stage"),
                F.lit(name).alias("event_type"),
                "n_users",
            )
        )
    return rows[0].unionAll(rows[1]).unionAll(rows[2])


#: per-bucket user cap for the co-occurrence projection — bounds the
#: quadratic pair fan-out (cap C → ≤ C(C-1)/2 pairs per bucket)
_TRI_CAP = 10
_TRI_SEED = 11

TRIANGLE_ORACLE = f"""
    WITH bucket_users AS (
        SELECT DISTINCT date_trunc('hour', ts) AS h, event_type,
               user_id
        FROM events
    ),
    capped AS (
        SELECT h, event_type, user_id FROM (
            SELECT h, event_type, user_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY h, event_type
                       ORDER BY ({oracle_hash_expr("user_id", _TRI_SEED)})
                                ASC, user_id ASC) AS rn
            FROM bucket_users
        ) WHERE rn <= {_TRI_CAP}
    ),
    edges AS (
        SELECT DISTINCT a.user_id AS src, b.user_id AS dst
        FROM capped a
        JOIN capped b ON a.h = b.h AND a.event_type = b.event_type
                      AND a.user_id < b.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM edges) AS BIGINT) AS n_edges,
           CAST((SELECT COUNT(*) FROM (
               SELECT 1
               FROM edges ab
               JOIN edges bc ON ab.dst = bc.src
               JOIN edges ac ON ac.src = ab.src AND ac.dst = bc.dst
           )) AS BIGINT) AS n_triangles
"""


@query("triangle_count", TRIANGLE_ORACLE)
def q_triangle_count(spark, sf_dir):
    """Triangle counting on the user co-occurrence graph (users active
    in the same hour+type bucket). The two scale decisions: (1) the
    quadratic co-occurrence projection is CAPPED at 10 deterministic
    hash-ranked users per bucket, so per-bucket fan-out is bounded at
    45 pairs no matter how hot the bucket; (2) edges are oriented
    src < dst, so each triangle is counted exactly once by the
    two-join path+closure plan (the standard distributed formulation;
    production swaps id-order for degree-order to shrink the skewed
    high-degree join side)."""
    from funding_monitoring_spark.operators.cachescope import (
        scoped_persist,
    )
    from funding_monitoring_spark.operators.sampling import key_hash

    events = load_table(spark, sf_dir, "events")
    bucket_users = events.select(
        F.date_trunc("hour", F.col("ts")).alias("h"),
        "event_type",
        "user_id",
    ).distinct()
    w = Window.partitionBy("h", "event_type").orderBy(
        key_hash(F.col("user_id"), _TRI_SEED).asc(), F.col("user_id").asc()
    )
    # The capped per-bucket user lists are BOUNDED (<= _TRI_CAP rows),
    # so the quadratic co-occurrence projection is generated as array
    # algebra in one groupBy instead of a capped⋈capped self-join
    # (guide §2.4 — the groupBy reuses the window's (h, event_type)
    # partitioning, so pair generation adds ZERO exchanges where the
    # join shape paid two join-side shuffles plus a checkpoint).
    # The pair orientation (src < dst by user id) and the trailing
    # distinct are unchanged.
    capped = (
        bucket_users.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TRI_CAP)
    )
    users = F.col("users")
    pair_structs = F.flatten(
        F.transform(
            users,
            lambda a, i: F.transform(
                F.slice(users, i + 2, _TRI_CAP),
                lambda b: F.struct(
                    F.least(a, b).alias("src"),
                    F.greatest(a, b).alias("dst"),
                ),
            ),
        )
    )
    # edges persist (NOT localCheckpoint): the frame is slim and the
    # preserved size statistics let the two triangle-join probes and
    # the closure join plan as BroadcastHashJoins instead of
    # SortMergeJoins (the r11 persist-vs-checkpoint plan lesson)
    edges = scoped_persist(
        capped.groupBy("h", "event_type")
        .agg(F.collect_list("user_id").alias("users"))
        .select(F.explode(pair_structs).alias("p"))
        .select("p.src", "p.dst")
        .distinct()
    )
    ab = edges.alias("ab")
    bc = edges.alias("bc")
    ac = edges.alias("ac")
    triangles = ab.join(
        bc, F.col("ab.dst") == F.col("bc.src")
    ).join(
        ac,
        (F.col("ac.src") == F.col("ab.src"))
        & (F.col("ac.dst") == F.col("bc.dst")),
    )
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    n_tri = triangles.agg(F.count(F.lit(1)).alias("n_triangles"))
    return n_edges.crossJoin(F.broadcast(n_tri))


from funding_monitoring_spark.operators.zorder import (  # noqa: E402
    oracle_z_sql,
    z_value,
)

ZORDER_ORACLE = f"""
    SELECT event_id,
           {oracle_z_sql("user_id % 65536", "event_id % 65536")} AS zval
    FROM events
"""


@query("zorder_cluster_keys", ZORDER_ORACLE)
def q_zorder_cluster_keys(spark, sf_dir):
    """Morton z-values for two-dimensional clustering
    (operators/zorder.py): the bitwise interleave of (user_id,
    event_id) — pure shift/mask column algebra, codegen'd, no UDF,
    recomputed bit-for-bit by the SQL oracle. Writing sorted by this
    key gives every parquet file tight min/max stats on BOTH columns
    (measured in tests/test_layout.py: an order-of-magnitude span
    shrink vs the unordered layout)."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        z_value(
            F.pmod(F.col("user_id"), F.lit(65536)),
            F.pmod(F.col("event_id"), F.lit(65536)),
        ).alias("zval"),
    )


FREQ_SKETCH_ORACLE = """
    WITH toks AS (
        SELECT unnest(regexp_extract_all(lower(text), '\\S+')) AS item
        FROM documents
    ),
    tot AS (SELECT COUNT(*) AS tn FROM toks)
    SELECT item, CAST(COUNT(*) AS BIGINT) AS n
    FROM toks GROUP BY item
    HAVING COUNT(*) * 100 > (SELECT tn FROM tot)
"""


@query("frequent_tokens_sketch", FREQ_SKETCH_ORACLE)
def q_frequent_tokens_sketch(spark, sf_dir):
    """Corpus-frequent tokens (freq > N/100) via Misra-Gries candidate
    generation + exact verify (operators/sketches.py): pass 1 keeps a
    bounded 100-counter summary per partition (the pigeonhole
    guarantee makes the union a superset of every true frequent item),
    pass 2 recounts ONLY the broadcast candidate set. The full
    distinct-token space never shuffles — at 100 TB that's the whole
    ballgame — and the answer is EXACT, which is why the oracle is the
    plain single-pass HAVING query."""
    from funding_monitoring_spark.operators.sketches import (
        frequent_items_exact_2pass,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit(r"(\S+)"), 1
            )
        ).alias("item")
    )
    return frequent_items_exact_2pass(toks, F.col("item"), capacity=100)


ROLLING_BETA_ORACLE = """
    WITH per AS (
        SELECT date_trunc('hour', ts) AS h, event_type,
               ROUND(SUM(value), 6) AS s
        FROM events GROUP BY 1, 2
    ),
    pairs AS (
        SELECT a.event_type AS ta, b.event_type AS tb, a.h,
               a.s AS sa, b.s AS sb
        FROM per a JOIN per b ON a.h = b.h
        WHERE a.event_type < b.event_type
    )
    SELECT ta AS type_a, tb AS type_b, h,
           CASE WHEN COUNT(sb) OVER w >= 12
                     AND VAR_SAMP(sb) OVER w > 0
                THEN ROUND(COVAR_SAMP(sa, sb) OVER w
                           / VAR_SAMP(sb) OVER w, 4) + 0.0
           END AS beta,
           COUNT(sb) OVER w AS n_obs
    FROM pairs
    WINDOW w AS (PARTITION BY ta, tb ORDER BY h
                 ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
"""


@query("rolling_beta", ROLLING_BETA_ORACLE)
def q_rolling_beta(spark, sf_dir):
    """Rolling 24-bucket hedge ratio (regression slope
    cov(a,b)/var(b)) for every symbol pair's hourly sums — the
    cross-series risk statistic next to the correlation matrix. The
    window partitions on the PAIR key, so all 10 series windows
    compute in one exchange; inputs are the round-6 bucket sums on
    both engines, the guard (≥12 obs, positive variance) gates the
    division, and the slope is rounded at 4."""
    events = load_table(spark, sf_dir, "events")
    # checkpointed for the same single-scan reason as the correlation
    per = (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("h"), "event_type"
        )
        .agg(F.round(F.sum("value"), 6).alias("s"))
        .localCheckpoint(eager=True)
    )
    a = per.alias("a")
    b = per.alias("b")
    pairs = (
        a.join(b, F.col("a.h") == F.col("b.h"))
        .filter(F.col("a.event_type") < F.col("b.event_type"))
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
            F.col("a.h").alias("h"),
            F.col("a.s").alias("sa"),
            F.col("b.s").alias("sb"),
        )
    )
    w = (
        Window.partitionBy("type_a", "type_b")
        .orderBy("h")
        .rowsBetween(-23, 0)
    )
    cnt = F.count("sb").over(w)
    var = F.var_samp("sb").over(w)
    # + 0.0 canonicalizes IEEE -0.0 (ROUND of a tiny negative slope
    # yields -0.0 whose string repr differs between engines)
    beta = F.when(
        (cnt >= 12) & (var > 0),
        F.round(F.covar_samp("sa", "sb").over(w) / var, 4) + F.lit(0.0),
    )
    return pairs.select(
        "type_a",
        "type_b",
        "h",
        beta.alias("beta"),
        cnt.alias("n_obs"),
    )


KL_ORACLE = """
    WITH toks AS (
        SELECT source,
               unnest(regexp_extract_all(lower(text), '\\S+')) AS t
        FROM documents
    ),
    sc AS (SELECT source, t, COUNT(*) AS ns FROM toks GROUP BY 1, 2),
    stot AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS sn
             FROM toks GROUP BY source),
    cc AS (SELECT t, COUNT(*) AS nc FROM toks GROUP BY t),
    ctot AS (SELECT CAST(COUNT(*) AS BIGINT) AS cn FROM toks)
    SELECT sc.source,
           ROUND(SUM(
               (CAST(ns AS DOUBLE) / sn)
               * ln((CAST(ns AS DOUBLE) / sn)
                    / (CAST(nc AS DOUBLE) / cn))), 6) AS kl_divergence,
           CAST(COUNT(*) AS BIGINT) AS n_terms
    FROM sc
    JOIN stot ON stot.source = sc.source
    JOIN cc ON cc.t = sc.t
    CROSS JOIN ctot
    GROUP BY sc.source
"""


@query("source_divergence_kl", KL_ORACLE)
def q_source_divergence_kl(spark, sf_dir):
    """Per-source corpus drift: KL(source token distribution ‖ corpus
    distribution). Tokens absent from a source contribute zero, so the
    sum runs over the source's own vocabulary only — no smoothing
    needed (the corpus marginal can't be zero where the source isn't).
    Every probability is a single integer division (bit-identical on
    both engines); only the final sum is rounded. Shape: two
    map-side-combined counts joined on token — the corpus-count side
    is the reused aggregate, not a second scan of raw text."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit(r"(\S+)"), 1
            )
        ).alias("t"),
    )
    # ONE tokenize pass (guide §2.4): sc is persisted and the three
    # coarser counts derive from it by re-aggregation (Σns per source
    # / per token / overall ≡ counting the raw token stream) — the
    # old shape re-tokenized the corpus for each of the four counts.
    sc = scoped_persist(
        toks.groupBy("source", "t").agg(F.count(F.lit(1)).alias("ns"))
    )
    stot = sc.groupBy("source").agg(F.sum("ns").alias("sn"))
    cc = sc.groupBy("t").agg(F.sum("ns").alias("nc"))
    ctot = sc.agg(F.sum("ns").alias("cn"))
    ps = F.col("ns").cast("double") / F.col("sn")
    pc = F.col("nc").cast("double") / F.col("cn")
    return (
        sc.join(stot, "source")
        .join(cc, "t")
        .crossJoin(F.broadcast(ctot))
        .groupBy("source")
        .agg(
            F.round(F.sum(ps * F.log(ps / pc)), 6).alias("kl_divergence"),
            F.count(F.lit(1)).alias("n_terms"),
        )
    )


ROLLUP_CASCADE_ORACLE = """
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               ROUND(SUM(value), 6) AS s, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    daily AS (
        SELECT event_type, date_trunc('day', h) AS d,
               ROUND(SUM(s), 6) AS s, SUM(n) AS n
        FROM hourly GROUP BY 1, 2
    )
    SELECT event_type, date_trunc('month', d) AS month,
           ROUND(SUM(s), 6) AS sum_value,
           CAST(SUM(n) AS BIGINT) AS n_events
    FROM daily GROUP BY 1, 2
"""


@query("rollup_cascade", ROLLUP_CASCADE_ORACLE)
def q_rollup_cascade(spark, sf_dir):
    """Incremental rollup hierarchy hour → day → month: each grain
    re-aggregates the one below it instead of rescanning raw events —
    the materialized-rollup maintenance pattern (a day's update
    touches 24 hourly rows, not the raw feed). Each level rounds its
    sums identically on both engines, so the cascade is bit-stable;
    the oracle runs the SAME cascade, making the check exact."""
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(
        F.round(F.sum("value"), 6).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    daily = hourly.groupBy(
        "event_type", F.date_trunc("day", F.col("h")).alias("d")
    ).agg(F.round(F.sum("s"), 6).alias("s"), F.sum("n").alias("n"))
    return daily.groupBy(
        "event_type", F.date_trunc("month", F.col("d")).alias("month")
    ).agg(
        F.round(F.sum("s"), 6).alias("sum_value"),
        F.sum("n").alias("n_events"),
    )


#: ablation thresholds over the quality score — one pass, not K
_ABLATION_STEPS = (0.2, 0.4, 0.6, 0.8)

ABLATION_ORACLE = f"""
    WITH scored AS (
        SELECT n_chars,
               0.25 * LEAST(1.0, length(text) / 500.0)
               + 0.75 * (1.0 - LEAST(1.0,
                     5.0 * length(regexp_replace(text,
                         '[^.,;:!?''"()\\-]', '', 'g'))
                     / GREATEST(length(text), 1))) AS q
        FROM documents
    )
    SELECT t.thr,
           CAST(SUM(CASE WHEN q >= t.thr THEN 1 ELSE 0 END) AS BIGINT)
               AS n_docs,
           CAST(SUM(CASE WHEN q >= t.thr THEN n_chars ELSE 0 END)
               AS BIGINT) AS n_chars
    FROM scored
    CROSS JOIN (VALUES {", ".join(f"({t})" for t in _ABLATION_STEPS)})
        AS t(thr)
    GROUP BY t.thr
"""


@query("quality_filter_ablation", ABLATION_ORACLE)
def q_quality_filter_ablation(spark, sf_dir):
    """Curation ablation table: surviving docs/chars at each quality
    threshold, computed in ONE scan — the thresholds broadcast as a
    4-row literal frame cross-joined into conditional sums, instead of
    K filtered re-scans. The score here is a deterministic
    length+punctuation blend (exact integer/ratio algebra shared with
    the oracle); production swaps in any scorer with the same shape."""
    docs = load_table(spark, sf_dir, "documents")
    punct = F.regexp_count(F.col("text"), F.lit(r"[.,;:!?'\"()\-]"))
    q = 0.25 * F.least(
        F.lit(1.0), F.length("text") / F.lit(500.0)
    ) + 0.75 * (
        F.lit(1.0)
        - F.least(
            F.lit(1.0),
            F.lit(5.0) * punct / F.greatest(F.length("text"), F.lit(1)),
        )
    )
    scored = docs.select("n_chars", q.alias("q"))
    thr = spark.createDataFrame(
        [(t,) for t in _ABLATION_STEPS], "thr double"
    )
    return (
        scored.crossJoin(F.broadcast(thr))
        .groupBy("thr")
        .agg(
            F.sum(
                F.when(F.col("q") >= F.col("thr"), 1).otherwise(0)
            ).alias("n_docs"),
            F.sum(
                F.when(
                    F.col("q") >= F.col("thr"), F.col("n_chars")
                ).otherwise(0)
            ).alias("n_chars"),
        )
    )


LOGPROB_ORACLE = """
    WITH toks AS (
        SELECT doc_id,
               unnest(regexp_extract_all(lower(text), '\\S+')) AS t
        FROM documents
    ),
    cc AS (SELECT t, COUNT(*) AS nc FROM toks GROUP BY t),
    ctot AS (SELECT CAST(COUNT(*) AS BIGINT) AS cn FROM toks)
    SELECT toks.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(-SUM(ln(CAST(nc AS DOUBLE) / cn)) / COUNT(*), 6)
               AS avg_neg_logprob
    FROM toks JOIN cc ON cc.t = toks.t CROSS JOIN ctot
    GROUP BY toks.doc_id
"""


@query("unigram_logprob_score", LOGPROB_ORACLE)
def q_unigram_logprob_score(spark, sf_dir):
    """Perplexity-proxy curation signal: each document's mean negative
    log-probability under the corpus unigram LM (its own corpus — a
    self-scoring pass, the cheap stand-in for an external LM filter).
    High scores = improbable token mixes = noise candidates. Shape:
    one token count (map-side combined), broadcast-joined back to the
    token stream, summed per doc — the corpus never re-scans and the
    per-token probability is one exact integer division."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit(r"(\S+)"), 1
            )
        ).alias("t"),
    )
    # the count table feeds both the total and the scoring join —
    # checkpoint it, and derive the total FROM it (sum of counts),
    # so the query is exactly two scans: count pass + scoring pass
    cc = (
        toks.groupBy("t")
        .agg(F.count(F.lit(1)).alias("nc"))
        .localCheckpoint(eager=True)
    )
    ctot = cc.agg(F.sum("nc").alias("cn"))
    p = F.col("nc").cast("double") / F.col("cn")
    return (
        toks.join(F.broadcast(cc), "t")
        .crossJoin(F.broadcast(ctot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                -F.sum(F.log(p)) / F.count(F.lit(1)), 6
            ).alias("avg_neg_logprob"),
        )
    )


FUNNEL_LATENCY_ORACLE = """
    WITH t1 AS (
        SELECT user_id, MIN(ts) AS t FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    t2 AS (
        SELECT e.user_id, MIN(e.ts) AS t
        FROM events e JOIN t1 ON e.user_id = t1.user_id
        WHERE e.event_type = 'click' AND e.ts > t1.t
        GROUP BY e.user_id
    ),
    t3 AS (
        SELECT e.user_id, MIN(e.ts) AS t
        FROM events e JOIN t2 ON e.user_id = t2.user_id
        WHERE e.event_type = 'purchase' AND e.ts > t2.t
        GROUP BY e.user_id
    ),
    lat AS (
        SELECT 'view_to_click' AS hop,
               (epoch_us(t2.t) - epoch_us(t1.t)) / 1000000.0 AS sec
        FROM t2 JOIN t1 ON t1.user_id = t2.user_id
        UNION ALL
        SELECT 'click_to_purchase',
               (epoch_us(t3.t) - epoch_us(t2.t)) / 1000000.0
        FROM t3 JOIN t2 ON t2.user_id = t3.user_id
    )
    SELECT hop, CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(quantile_cont(sec, 0.5), 6) AS p50_sec,
           ROUND(quantile_cont(sec, 0.9), 6) AS p90_sec
    FROM lat GROUP BY hop
"""


@query("funnel_latency_quantiles", FUNNEL_LATENCY_ORACLE)
def q_funnel_latency_quantiles(spark, sf_dir):
    """Time-to-convert distribution per funnel hop: exact interpolated
    p50/p90 of the first-view→first-qualifying-click and
    click→purchase latencies. Latencies are integer-µs differences
    scaled once (bit-identical on both engines); both engines use the
    same linear-interpolation percentile definition (Spark
    `percentile` ≡ DuckDB `quantile_cont`). Shares the checkpointed
    stage chain with the funnel count query."""
    events = load_table(spark, sf_dir, "events")
    t1, t2, t3 = _funnel_stage_times(events)

    def hop(a, b, name):
        return (
            b.withColumnRenamed("t", "tb")
            .join(a.withColumnRenamed("t", "ta"), "user_id")
            .select(
                F.lit(name).alias("hop"),
                (
                    (F.unix_micros("tb") - F.unix_micros("ta"))
                    / F.lit(1_000_000.0)
                ).alias("sec"),
            )
        )
    lat = hop(t1, t2, "view_to_click").unionAll(
        hop(t2, t3, "click_to_purchase")
    )
    return lat.groupBy("hop").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(F.percentile("sec", F.lit(0.5)), 6).alias("p50_sec"),
        F.round(F.percentile("sec", F.lit(0.9)), 6).alias("p90_sec"),
    )


_COVERAGE_RANKS = (10, 50, 100, 500, 1000)

VOCAB_COVERAGE_ORACLE = f"""
    WITH toks AS (
        SELECT unnest(regexp_extract_all(lower(text), '\\S+')) AS t
        FROM documents
    ),
    ranked AS (
        SELECT COUNT(*) AS n,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, t ASC) AS r
        FROM toks GROUP BY t
    ),
    cum AS (
        SELECT r,
               SUM(n) OVER (ORDER BY r
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS c,
               (SELECT CAST(SUM(n) AS BIGINT) FROM ranked) AS total
        FROM ranked
    )
    SELECT s.rank_cap,
           ROUND(MAX(CASE WHEN r <= s.rank_cap THEN c ELSE 0 END)
                 / CAST(MAX(total) AS DOUBLE), 6) AS coverage
    FROM cum
    CROSS JOIN (VALUES {", ".join(f"({r})" for r in _COVERAGE_RANKS)})
        AS s(rank_cap)
    GROUP BY s.rank_cap
"""


@query("vocab_coverage_curve", VOCAB_COVERAGE_ORACLE)
def q_vocab_coverage_curve(spark, sf_dir):
    """Vocabulary-size economics: what fraction of corpus tokens the
    top-N vocabulary covers, at five N steps — the curve that picks a
    tokenizer's vocab size (and the <unk> rate its cap implies). One
    token count, a dim-side rank+cumsum over the (small,
    post-aggregation) vocab, and the N steps evaluated with
    conditional MAX over the cumulative counts — no per-step re-scan
    of anything."""
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit(r"(\S+)"), 1
            )
        ).alias("t")
    )
    # checkpointed: the ranked vocab feeds both the cumsum and the
    # corpus total — one raw scan, not one per consumer
    ranked = (
        toks.groupBy("t")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "n",
            F.row_number()
            .over(W.orderBy(F.desc("n"), F.asc("t")))
            .alias("r"),
        )
        .localCheckpoint(eager=True)
    )
    cum = ranked.select(
        "r",
        F.sum("n")
        .over(
            W.orderBy("r").rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        .alias("c"),
    ).crossJoin(
        F.broadcast(ranked.agg(F.sum("n").alias("total")))
    )
    steps = spark.createDataFrame(
        [(r,) for r in _COVERAGE_RANKS], "rank_cap int"
    )
    return (
        cum.crossJoin(F.broadcast(steps))
        .groupBy("rank_cap")
        .agg(
            F.round(
                F.max(
                    F.when(F.col("r") <= F.col("rank_cap"), F.col("c"))
                    .otherwise(0)
                )
                / F.max("total").cast("double"),
                6,
            ).alias("coverage")
        )
    )


#: expected tick cadence for the heartbeat report (hourly grid)
_TICK_SECONDS = 3600

MISSING_TICKS_ORACLE = f"""
    WITH obs AS (
        SELECT DISTINCT event_type,
               make_timestamp((epoch_us(ts) // {_TICK_SECONDS * 1_000_000})
                              * {_TICK_SECONDS * 1_000_000}) AS bucket
        FROM events
    ),
    spans AS (
        SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi
        FROM obs GROUP BY event_type
    ),
    spine AS (
        SELECT event_type,
               unnest(generate_series(lo, hi,
                                      INTERVAL {_TICK_SECONDS} SECOND))
                   AS bucket
        FROM spans
    ),
    flagged AS (
        SELECT s.event_type, s.bucket,
               CAST(o.bucket IS NULL AS INT) AS is_gap,
               ROW_NUMBER() OVER (PARTITION BY s.event_type
                                  ORDER BY s.bucket)
               - ROW_NUMBER() OVER (PARTITION BY s.event_type,
                                    CAST(o.bucket IS NULL AS INT)
                                    ORDER BY s.bucket) AS island
        FROM spine s
        LEFT JOIN obs o ON o.event_type = s.event_type
                        AND o.bucket = s.bucket
    ),
    runs AS (
        SELECT event_type, island, COUNT(*) AS run_len
        FROM flagged WHERE is_gap = 1
        GROUP BY event_type, island
    )
    SELECT f.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_expected,
           CAST(SUM(is_gap) AS BIGINT) AS n_missing,
           CAST(COALESCE((SELECT MAX(run_len) FROM runs r
                          WHERE r.event_type = f.event_type), 0)
                AS BIGINT) AS longest_outage
    FROM flagged f GROUP BY f.event_type
"""


@query("missing_ticks_report", MISSING_TICKS_ORACLE)
def q_missing_ticks_report(spark, sf_dir):
    """Heartbeat monitoring: per symbol, how many expected ticks never
    arrived and the longest consecutive outage — THE liveness question
    for a feed the reference polls on a fixed cadence. Expected grid =
    the per-key spine (bounded sequence+explode, as in gap fill);
    outage runs found with the gaps-and-islands double-row_number
    trick, all on the same symbol partitioning — one spine join and
    two same-key window passes, no self-join."""
    from pyspark.sql.window import Window as W

    events = load_table(spark, sf_dir, "events")
    us = _TICK_SECONDS * 1_000_000
    bucket = F.timestamp_seconds(
        F.floor(F.unix_micros(F.col("ts")) / us) * _TICK_SECONDS
    )
    obs = (
        events.select(
            "event_type", bucket.alias("bucket")
        ).distinct()
    ).localCheckpoint(eager=True)
    spans = obs.groupBy("event_type").agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    spine = spans.select(
        "event_type",
        F.explode(
            F.sequence(
                F.col("lo"),
                F.col("hi"),
                F.expr(f"INTERVAL {_TICK_SECONDS} SECONDS"),
            )
        ).alias("bucket"),
    )
    flagged = (
        spine.join(
            obs.withColumn("seen", F.lit(1)),
            ["event_type", "bucket"],
            "left",
        )
        .withColumn("is_gap", F.col("seen").isNull().cast("int"))
        .drop("seen")
    )
    w_all = W.partitionBy("event_type").orderBy("bucket")
    w_grp = W.partitionBy("event_type", "is_gap").orderBy("bucket")
    flagged = flagged.withColumn(
        "island", F.row_number().over(w_all) - F.row_number().over(w_grp)
    )
    runs = (
        flagged.filter(F.col("is_gap") == 1)
        .groupBy("event_type", "island")
        .agg(F.count(F.lit(1)).alias("run_len"))
        .groupBy("event_type")
        .agg(F.max("run_len").alias("longest_outage"))
    )
    totals = flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_expected"),
        F.sum("is_gap").alias("n_missing"),
    )
    return totals.join(runs, "event_type", "left").select(
        "event_type",
        "n_expected",
        "n_missing",
        F.coalesce(F.col("longest_outage"), F.lit(0))
        .cast("long")
        .alias("longest_outage"),
    )


MAD_ORACLE = """
    WITH framed AS (
        SELECT event_id, event_type, value,
               COALESCE(list(value) OVER w, CAST([] AS DOUBLE[])) AS arr
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    ),
    m1 AS (
        SELECT *, len(arr) AS n, list_sort(arr) AS srt FROM framed
    ),
    m2 AS (
        SELECT *,
               CASE WHEN n = 0 THEN NULL
                    WHEN n % 2 = 1 THEN srt[CAST((n + 1) / 2 AS INT)]
                    ELSE (srt[CAST(n / 2 AS INT)]
                          + srt[CAST(n / 2 + 1 AS INT)]) / 2
               END AS med
        FROM m1
    ),
    m3 AS (
        SELECT *,
               list_sort(list_transform(arr, x -> abs(x - med)))
                   AS dsrt
        FROM m2
    ),
    m4 AS (
        SELECT *,
               CASE WHEN n = 0 THEN NULL
                    WHEN n % 2 = 1 THEN dsrt[CAST((n + 1) / 2 AS INT)]
                    ELSE (dsrt[CAST(n / 2 AS INT)]
                          + dsrt[CAST(n / 2 + 1 AS INT)]) / 2
               END AS mad
        FROM m3
    )
    SELECT event_id, event_type,
           CAST(n AS BIGINT) AS baseline_n,
           med AS baseline_median,
           CASE WHEN n >= 10 AND mad > 0
                THEN 0.6745 * (value - med) / mad
           END AS mad_score
    FROM m4
"""


@query("robust_anomaly_mad", MAD_ORACLE)
def q_robust_anomaly_mad(spark, sf_dir):
    """Robust twin of funding_rate_anomaly (operators/anomaly.py
    rolling_mad_score): score each observation against the trailing
    frame's MEDIAN and MAD rather than mean/stddev — a prior spike in
    the baseline inflates a stddev and masks the next one, but barely
    moves a median. The frame materializes once per row as a bounded
    20-element array (collect_list over the window frame) and
    median/MAD are pure array HOFs on it — still one exchange, one
    sort, no Python; every intermediate double is bit-identical to the
    oracle's list algebra, so only the final score is rounded."""
    from funding_monitoring_spark.operators.anomaly import (
        rolling_mad_score,
    )

    events = load_table(spark, sf_dir, "events")
    return rolling_mad_score(
        events,
        ["event_type"],
        [F.col("ts"), F.col("event_id")],
        "value",
        n=20,
        min_obs=10,
    ).select(
        "event_id",
        "event_type",
        "baseline_n",
        "baseline_median",
        "mad_score",
    )


from funding_monitoring_spark.operators.pca import (  # noqa: E402
    oracle_top_component_sql,
    top_component,
)
from funding_monitoring_spark.suites.olap_suite import (  # noqa: E402
    EMBEDDING_COV_SQL,
)


@query(
    "embedding_top_component",
    oracle_top_component_sql(EMBEDDING_COV_SQL, n_iter=4),
)
def q_embedding_top_component(spark, sf_dir):
    """Distributed power-iteration PCA (operators/pca.py): the
    corpus's top principal direction from the covariance table —
    matrix·vector as equi-join + groupBy per iteration, norm as a
    1-row broadcast, the matrix never collected. The data-scale half
    (covariance) is the Arrow outer-product partial aggregate; the
    eigensolve stays declarative so the SAME plan serves matrices too
    large to collect. Oracle unrolls the identical four iterations
    over the identical round-6 covariance."""
    from funding_monitoring_spark.operators.vectorops import (
        embedding_covariance,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cov = embedding_covariance(emb)
    return top_component(spark, cov, n_iter=4)


TREND_ORACLE = """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(regr_slope(value, epoch_us(ts) / 3600000000.0), 6)
               + 0.0 AS slope_per_hour,
           ROUND(regr_intercept(value, epoch_us(ts) / 3600000000.0), 6)
               + 0.0 AS intercept,
           ROUND(regr_r2(value, epoch_us(ts) / 3600000000.0), 6)
               AS r2
    FROM events GROUP BY event_type
"""


@query("trend_regression", TREND_ORACLE)
def q_trend_regression(spark, sf_dir):
    """Per-symbol linear trend: OLS slope/intercept/R² of the rate
    against time (hours), via the built-in regression aggregates —
    single-pass sufficient statistics with map-side partials, the
    degenerate-but-ubiquitous 1-feature case of distributed OLS (the
    d-feature generalization is the normal-equation aggregate, whose
    matrix half is operators/vectorops.embedding_covariance). Time is
    integer-µs scaled once so both engines regress identical
    doubles."""
    events = load_table(spark, sf_dir, "events")
    x = F.unix_micros(F.col("ts")) / F.lit(3_600_000_000.0)
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        (F.round(F.regr_slope(F.col("value"), x), 6) + F.lit(0.0))
        .alias("slope_per_hour"),
        (F.round(F.regr_intercept(F.col("value"), x), 6) + F.lit(0.0))
        .alias("intercept"),
        F.round(F.regr_r2(F.col("value"), x), 6).alias("r2"),
    )


SKEW_DIAG_ORACLE = """
    WITH per_key AS (
        SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total,
                   CAST(COUNT(*) AS BIGINT) AS n_keys
            FROM per_key)
    SELECT (SELECT n_keys FROM tot) AS n_keys,
           (SELECT total FROM tot) AS n_rows,
           CAST(MAX(n) AS BIGINT) AS max_key_rows,
           ROUND(MAX(n) / CAST((SELECT total FROM tot) AS DOUBLE), 6)
               AS top_key_share,
           ROUND(quantile_cont(n, 0.5), 6) AS p50_key_rows,
           ROUND(quantile_cont(n, 0.99), 6) AS p99_key_rows,
           ROUND(MAX(n) / quantile_cont(n, 0.5), 6) AS skew_ratio
    FROM per_key
"""


@query("skew_diagnostics", SKEW_DIAG_ORACLE)
def q_skew_diagnostics(spark, sf_dir):
    """Shuffle-risk profile of a prospective join/group key: distinct
    keys, hottest key's row count and share, p50/p99 group sizes, and
    the max/median skew ratio — the numbers that decide BETWEEN the
    plain, salted (operators/skew.py), and broadcast strategies before
    a 100 TB shuffle is committed. One map-side-combined count plus a
    single-row summary; the profile costs one scan of the key column
    only."""
    events = load_table(spark, sf_dir, "events")
    per_key = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_key_rows"),
        F.round(
            F.max("n") / F.sum("n").cast("double"), 6
        ).alias("top_key_share"),
        F.round(F.percentile("n", F.lit(0.5)), 6).alias("p50_key_rows"),
        F.round(F.percentile("n", F.lit(0.99)), 6).alias(
            "p99_key_rows"
        ),
        F.round(
            F.max("n") / F.percentile("n", F.lit(0.5)), 6
        ).alias("skew_ratio"),
    )


PROFILE_ORACLE = """
    SELECT 'event_id' AS col, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) - COUNT(event_id) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct,
           CAST(MIN(event_id) AS VARCHAR) AS min_repr,
           CAST(MAX(event_id) AS VARCHAR) AS max_repr
    FROM events
    UNION ALL
    SELECT 'user_id', COUNT(*), COUNT(*) - COUNT(user_id),
           COUNT(DISTINCT user_id),
           CAST(MIN(user_id) AS VARCHAR), CAST(MAX(user_id) AS VARCHAR)
    FROM events
    UNION ALL
    SELECT 'event_type', COUNT(*), COUNT(*) - COUNT(event_type),
           COUNT(DISTINCT event_type),
           MIN(event_type), MAX(event_type)
    FROM events
"""


@query("table_profile", PROFILE_ORACLE)
def q_table_profile(spark, sf_dir):
    """Data-profiling report (the Deequ-profile analogue to the
    expectation_audit CHECKS): per column — row count, nulls, distinct
    count, min/max as canonical strings. All columns profile in ONE
    pass per projection via the multi-aggregate; the long-form output
    unions the per-column rows. At 100 TB the exact distinct counts
    swap for approx_count_distinct; the report shape is unchanged."""
    events = load_table(spark, sf_dir, "events")

    # Deliberately one aggregate pass PER column, not one fused agg:
    # parquet column pruning means each union branch scans only its
    # own column (total bytes ≈ one 3-column scan), while the fused
    # multi-countDistinct plans an Expand that pushes 4x the row mass
    # through partial aggregation — measured 2.3x slower at sf0.1
    # (r13 A/B, OPTIMIZATION_r13.md batch 11).
    def profile(col):
        # min/max in the column's OWN order, stringified AFTER (a
        # pre-cast would make numeric min/max lexicographic)
        return events.agg(
            F.lit(col).alias("col"),
            F.count(F.lit(1)).alias("n"),
            (F.count(F.lit(1)) - F.count(col)).alias("n_null"),
            F.countDistinct(col).alias("n_distinct"),
            F.min(col).cast("string").alias("min_repr"),
            F.max(col).cast("string").alias("max_repr"),
        )

    return (
        profile("event_id")
        .unionAll(profile("user_id"))
        .unionAll(profile("event_type"))
    )


KS_ORACLE = """
    WITH vals AS (
        SELECT value, CASE WHEN event_type = 'click' THEN 1 ELSE 0 END
                   AS s1,
               CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS s2
        FROM events WHERE event_type IN ('click', 'view')
    ),
    tot AS (SELECT CAST(SUM(s1) AS BIGINT) AS n1,
                   CAST(SUM(s2) AS BIGINT) AS n2 FROM vals),
    pervalue AS (
        SELECT value, SUM(s1) AS d1, SUM(s2) AS d2
        FROM vals GROUP BY value
    ),
    cum AS (
        SELECT SUM(d1) OVER w AS c1, SUM(d2) OVER w AS c2
        FROM pervalue
        WINDOW w AS (ORDER BY value
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT (SELECT n1 FROM tot) AS n1,
           (SELECT n2 FROM tot) AS n2,
           MAX(ABS(CAST(c1 AS DOUBLE) / (SELECT n1 FROM tot)
                   - CAST(c2 AS DOUBLE) / (SELECT n2 FROM tot)))
               AS ks_d
    FROM cum
"""


@query("ks_two_sample", KS_ORACLE)
def q_ks_two_sample(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov statistic between the click and
    view value distributions — distribution-drift detection with zero
    binning decisions. D = max |F̂₁ − F̂₂| evaluated AFTER each
    distinct value: indicator counts are pre-aggregated per distinct
    value, then cumsummed in value order, so rows tied on value are
    folded into one deviation candidate and the result is fully
    deterministic (a ROWS frame over raw rows would expose arbitrary
    intra-tie ordering and could overestimate D). Every candidate is
    an exact integer ratio, so D needs no rounding — identical
    doubles on both engines. The per-value groupBy also shrinks the
    global-order window to |distinct values| rows; at scale the same
    statistic computes over a range-partitioned sort."""
    events = load_table(spark, sf_dir, "events")
    vals = events.filter(
        F.col("event_type").isin("click", "view")
    ).select(
        "value",
        (F.col("event_type") == "click").cast("int").alias("s1"),
        (F.col("event_type") == "view").cast("int").alias("s2"),
    )
    tot = vals.agg(
        F.sum("s1").alias("n1"), F.sum("s2").alias("n2")
    )
    per_value = vals.groupBy("value").agg(
        F.sum("s1").alias("d1"), F.sum("s2").alias("d2")
    )
    w = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = per_value.select(
        F.sum("d1").over(w).alias("c1"),
        F.sum("d2").over(w).alias("c2"),
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.max(
                F.abs(
                    F.col("c1").cast("double") / F.col("n1")
                    - F.col("c2").cast("double") / F.col("n2")
                )
            ).alias("ks_d"),
            F.first("n1").alias("n1"),
            F.first("n2").alias("n2"),
        )
        .select("n1", "n2", "ks_d")
    )


CHURN_ORACLE = """
    WITH weekly AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
        FROM events
    ),
    max_w AS (SELECT MAX(week) AS mw FROM weekly)
    SELECT a.week,
           CAST(COUNT(*) AS BIGINT) AS n_active,
           CAST(SUM(CASE WHEN b.user_id IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_churned,
           ROUND(SUM(CASE WHEN b.user_id IS NULL THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS churn_rate
    FROM weekly a
    LEFT JOIN weekly b ON b.user_id = a.user_id
                       AND b.week = a.week + INTERVAL 7 DAY
    WHERE a.week < (SELECT mw FROM max_w)
    GROUP BY a.week
"""


@query("weekly_churn", CHURN_ORACLE)
def q_weekly_churn(spark, sf_dir):
    """Week-over-week churn: users active in week w with no activity
    in w+1 (the final observed week is excluded — its churn is not
    yet knowable). One distinct projection to the (user, week) grain,
    one self LEFT join shifted by 7 days (same user key — bucketed
    layout runs it exchange-free), integer ratios rounded at 6."""
    events = load_table(spark, sf_dir, "events")
    weekly = (
        events.select(
            "user_id", F.date_trunc("week", F.col("ts")).alias("week")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    max_w = weekly.agg(F.max("week").alias("mw"))
    a = weekly.alias("a")
    b = weekly.alias("b")
    joined = a.join(
        b,
        (F.col("b.user_id") == F.col("a.user_id"))
        & (
            F.col("b.week")
            == F.col("a.week") + F.expr("INTERVAL 7 DAYS")
        ),
        "left",
    )
    churned = F.col("b.user_id").isNull().cast("int")
    return (
        joined.crossJoin(F.broadcast(max_w))
        .filter(F.col("a.week") < F.col("mw"))
        .groupBy(F.col("a.week").alias("week"))
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.sum(churned).alias("n_churned"),
            F.round(
                F.sum(churned) / F.count(F.lit(1)).cast("double"), 6
            ).alias("churn_rate"),
        )
    )


_ATTR_WINDOW = 3600  # credit clicks within the hour before a purchase

ATTRIBUTION_ORACLE = f"""
    WITH clicks AS (
        SELECT user_id, ts AS click_ts FROM events
        WHERE event_type = 'click'
    ),
    purchases AS (
        SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
               value
        FROM events WHERE event_type = 'purchase'
    ),
    touches AS (
        SELECT p.purchase_id, p.value, c.click_ts,
               COUNT(*) OVER (PARTITION BY p.purchase_id) AS n_touches
        FROM purchases p
        -- bounds mirror interval_join exactly: strict lower (click >
        -- purchase - W, from purchase < click + W), strict upper from
        -- the explicit click < purchase filter
        JOIN clicks c ON c.user_id = p.user_id
                      AND c.click_ts > p.purchase_ts
                                       - INTERVAL {_ATTR_WINDOW} SECOND
                      AND c.click_ts < p.purchase_ts
    )
    SELECT make_timestamp((epoch_us(click_ts) // 3600000000)
                          * 3600000000) AS touch_hour,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           ROUND(SUM(value / n_touches), 6) AS credited_value
    FROM touches
    GROUP BY 1
"""


@query("multi_touch_attribution", ATTRIBUTION_ORACLE)
def q_multi_touch_attribution(spark, sf_dir):
    """Linear multi-touch attribution: each purchase's value splits
    evenly across the user's clicks in the prior hour, credit rolled
    up by touch hour. Composes the bucketed interval join
    (operators/temporal.py — candidate pairs meet in an equi-join on
    (user, time-bucket), never a theta join) with a per-purchase
    window count for the 1/n split. The split weight is one exact
    division per pair; only the credited sum rounds."""
    from funding_monitoring_spark.operators.temporal import interval_join

    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    purchases = events.filter(
        F.col("event_type") == "purchase"
    ).select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        "value",
    )
    # interval_join matches left.ts <= right.ts < left.ts + window:
    # left = clicks (window start), right = purchases — a click is a
    # touch for purchases in the hour AFTER it; the strict/inclusive
    # ends mirror the oracle (click_ts >= p - W AND click_ts < p)
    pairs = interval_join(
        clicks,
        purchases,
        keys=["user_id"],
        left_ts="click_ts",
        right_ts="purchase_ts",
        window_seconds=_ATTR_WINDOW,
    ).filter(F.col("click_ts") < F.col("purchase_ts"))
    w = Window.partitionBy("purchase_id")
    touches = pairs.withColumn("n_touches", F.count(F.lit(1)).over(w))
    us = 3_600_000_000
    touch_hour = F.timestamp_seconds(
        F.floor(F.unix_micros(F.col("click_ts")) / us) * 3600
    )
    return touches.groupBy(touch_hour.alias("touch_hour")).agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.round(
            F.sum(F.col("value") / F.col("n_touches")), 6
        ).alias("credited_value"),
    )


DEDUP_SAVINGS_ORACLE = """
    WITH groups AS (
        SELECT md5(text) AS h, COUNT(*) AS n, MIN(n_chars) AS chars
        FROM documents GROUP BY md5(text)
    )
    SELECT CAST(SUM(n) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_removed,
           CAST(SUM((n - 1) * chars) AS BIGINT) AS chars_saved,
           ROUND((SUM(n) - COUNT(*))
                 / CAST(SUM(n) AS DOUBLE), 6) AS dedup_ratio
    FROM groups
"""


@query("dedup_savings_report", DEDUP_SAVINGS_ORACLE)
def q_dedup_savings_report(spark, sf_dir):
    """Dedup economics in one row: documents before/after exact
    dedup, removed copies, characters saved, and the dedup ratio —
    the go/no-go number before paying for the near-dup passes. One
    hash-groupBy on the digest (exact copies share n_chars, so MIN is
    exact), then a single-row summary."""
    docs = load_table(spark, sf_dir, "documents")
    groups = docs.groupBy(F.md5("text").alias("h")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("n_chars").alias("chars"),
    )
    return groups.agg(
        F.sum("n").alias("n_docs"),
        F.count(F.lit(1)).alias("n_distinct"),
        (F.sum("n") - F.count(F.lit(1))).alias("n_removed"),
        F.sum((F.col("n") - 1) * F.col("chars")).alias("chars_saved"),
        F.round(
            (F.sum("n") - F.count(F.lit(1)))
            / F.sum("n").cast("double"),
            6,
        ).alias("dedup_ratio"),
    )


HEATMAP_ORACLE = """
    SELECT CAST(isodow(ts) - 1 AS INT) AS weekday,
           CAST(EXTRACT(hour FROM ts) AS INT) AS hour,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 6) AS sum_value
    FROM events GROUP BY 1, 2
"""


@query("hourly_activity_heatmap", HEATMAP_ORACLE)
def q_hourly_activity_heatmap(spark, sf_dir):
    """The ops-dashboard activity heatmap: event count and value sum
    by (weekday, hour-of-day). Weekday convention pinned explicitly —
    Spark's weekday() (0 = Monday) equals DuckDB's isodow − 1; the
    bare dayofweek functions disagree across engines (Sunday-first vs
    Monday-first) and are avoided."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy(
        F.weekday(F.col("ts")).cast("int").alias("weekday"),
        F.hour(F.col("ts")).cast("int").alias("hour"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


_HIST_BINS = 20

VALUE_HIST_ORACLE = f"""
    WITH bounds AS (
        SELECT MIN(value) AS lo, MAX(value) AS hi FROM events
    ),
    binned AS (
        SELECT CASE WHEN b.hi = b.lo THEN 0
                    ELSE LEAST(CAST(FLOOR((value - b.lo)
                                          / ((b.hi - b.lo)
                                             / {_HIST_BINS}))
                                    AS INT), {_HIST_BINS - 1})
               END AS bin
        FROM events CROSS JOIN bounds b
    )
    SELECT bin, CAST(COUNT(*) AS BIGINT) AS n
    FROM binned GROUP BY bin
"""


@query("value_histogram", VALUE_HIST_ORACLE)
def q_value_histogram(spark, sf_dir):
    """Equal-width 20-bin histogram of the value column: global
    min/max arrive as a broadcast 1-row frame (no driver collect),
    bin = floor((v − lo)/width) clamped so the maximum lands in the
    last bin. A degenerate span (all values equal → width 0) maps
    everything to bin 0 instead of dividing by zero (NaN bins on
    Spark, a cast error on DuckDB). The bin arithmetic is the same
    three FP ops on both engines — identical doubles, exact integer
    bins."""
    events = load_table(spark, sf_dir, "events")
    bounds = events.agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    width = (F.col("hi") - F.col("lo")) / F.lit(_HIST_BINS)
    return (
        events.crossJoin(F.broadcast(bounds))
        .select(
            F.when(F.col("hi") == F.col("lo"), F.lit(0))
            .otherwise(
                F.least(
                    F.floor(
                        (F.col("value") - F.col("lo")) / width
                    ).cast("int"),
                    F.lit(_HIST_BINS - 1),
                )
            )
            .alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


BIGRAM_LOGPROB_ORACLE = """
    WITH toks AS (
        SELECT regexp_extract_all(lower(text), '\\S+') AS ts, doc_id
        FROM documents
    ),
    bigs AS (
        SELECT doc_id,
               list_extract(ts, i) AS w1,
               list_extract(ts, i + 1) AS w2
        FROM (SELECT doc_id, ts, unnest(range(1, len(ts))) AS i
              FROM toks)
    ),
    bc AS (SELECT w1, w2, COUNT(*) AS nb FROM bigs GROUP BY w1, w2),
    uc AS (SELECT w1, SUM(nb) AS nw FROM bc GROUP BY w1),
    voc AS (SELECT CAST(COUNT(DISTINCT w2) AS DOUBLE) AS v FROM bc)
    SELECT bigs.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(-SUM(ln((nb + 0.5) / (nw + 0.5 * v))) / COUNT(*), 6)
               AS avg_neg_logprob
    FROM bigs
    JOIN bc ON bc.w1 = bigs.w1 AND bc.w2 = bigs.w2
    JOIN uc ON uc.w1 = bigs.w1
    CROSS JOIN voc
    GROUP BY bigs.doc_id
"""


@query("bigram_logprob_score", BIGRAM_LOGPROB_ORACLE)
def q_bigram_logprob_score(spark, sf_dir):
    """Perplexity-proxy curation signal, order-aware: each document's
    mean negative log-probability under the corpus BIGRAM LM with
    add-0.5 smoothing — P(w2|w1) = (c(w1,w2)+0.5)/(c(w1·)+0.5·V),
    prefix counts derived from the bigram table itself and V the
    continuation vocabulary. Catches shuffled-word noise the unigram
    score (unigram_logprob_score) is blind to: a bag of plausible
    tokens in an implausible ORDER scores high here. Shape: one
    bigram count (map-side combined, fixed-width word-pair keys)
    feeding prefix counts and vocabulary by re-aggregation — the
    corpus scans twice total (count pass + scoring pass), both joins
    broadcast-sized (vocabulary², bounded)."""
    from funding_monitoring_spark.operators.textstats import (
        word_bigram_structs,
    )

    docs = load_table(spark, sf_dir, "documents")
    # struct-emitting bigrams — same rationale as the trigram scorer:
    # the string form re-split every bigram row twice
    bigs = docs.select(
        "doc_id",
        F.explode(
            word_bigram_structs(F.lower(F.col("text")))
        ).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2")
    bc = (
        bigs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("nb"))
        .localCheckpoint(eager=True)
    )
    uc = bc.groupBy("w1").agg(F.sum("nb").alias("nw"))
    voc = bc.agg(
        F.countDistinct("w2").cast("double").alias("v")
    )
    p = (F.col("nb") + 0.5) / (F.col("nw") + 0.5 * F.col("v"))
    return (
        bigs.join(F.broadcast(bc), ["w1", "w2"])
        .join(F.broadcast(uc), "w1")
        .crossJoin(F.broadcast(voc))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                -F.sum(F.log(p)) / F.count(F.lit(1)), 6
            ).alias("avg_neg_logprob"),
        )
    )


KN_TRIGRAM_ORACLE = """
    WITH toks AS (
        SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS ts
        FROM documents
    ),
    tris AS (
        SELECT doc_id,
               list_extract(ts, i) AS w1,
               list_extract(ts, i + 1) AS w2,
               list_extract(ts, i + 2) AS w3
        FROM (SELECT doc_id, ts, unnest(range(1, len(ts) - 1)) AS i
              FROM toks)
    ),
    tc AS (SELECT w1, w2, w3, CAST(COUNT(*) AS DOUBLE) AS c3
           FROM tris GROUP BY 1, 2, 3),
    bc AS (SELECT w1, w2, CAST(SUM(c3) AS DOUBLE) AS c2,
                  CAST(COUNT(*) AS DOUBLE) AS f3
           FROM tc GROUP BY 1, 2),
    cont3 AS (SELECT w2, w3, CAST(COUNT(*) AS DOUBLE) AS n3
              FROM tc GROUP BY 1, 2),
    mid AS (SELECT w2, CAST(SUM(n3) AS DOUBLE) AS m,
                   CAST(COUNT(*) AS DOUBLE) AS f2
            FROM cont3 GROUP BY 1),
    contu AS (SELECT w3, CAST(COUNT(*) AS DOUBLE) AS u
              FROM cont3 GROUP BY 1),
    tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM cont3)
    SELECT tris.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_trigrams,
           ROUND(-SUM(ln(
               (c3 - 0.75 + 0.75 * f3 *
                   ((n3 - 0.75 + 0.75 * f2 * (u / t)) / m)) / c2
           )) / COUNT(*), 6) AS avg_neg_logprob
    FROM tris
    JOIN tc USING (w1, w2, w3)
    JOIN bc USING (w1, w2)
    JOIN cont3 USING (w2, w3)
    JOIN mid USING (w2)
    JOIN contu USING (w3)
    CROSS JOIN tot
    GROUP BY tris.doc_id
"""


@query("kn_trigram_logprob_score", KN_TRIGRAM_ORACLE)
def q_kn_trigram_logprob_score(spark, sf_dir):
    """Perplexity-proxy curation signal, third in the LM-scoring
    ladder (unigram_logprob_score -> bigram_logprob_score -> this):
    each document's mean negative log-probability under an
    interpolated KNESER-NEY trigram LM (absolute discount D=0.75)
    built from the corpus itself — the smoothing every serious n-gram
    quality filter uses, because add-k over-penalizes rare-but-valid
    continuations while KN backs off by CONTINUATION counts
    (how many contexts a word completes, not how often it occurs).
    All count tables derive from one trigram count: c(w1w2w3);
    context totals and N1+ continuation counts are re-aggregations of
    it, so the model is exactly reproducible in SQL and every scored
    trigram has a positive denominator (it came from the corpus).
    P(w3|w1w2) = (c3 - D + D·N1+(w1w2·)·P2(w3|w2)) / c(w1w2·),
    P2(w3|w2) = (N1+(·w2w3) - D + D·N1+(w2·)·N1+(·w3)/N1+(··))
                / N1+(·w2·).
    Shape at 100 TB: one map-side-combined trigram count feeding
    three re-aggregations (all tiny relative to the corpus), then
    equi-joins back onto the trigram stream — count tables scale with
    distinct n-grams, so the joins shuffle on n-gram keys rather than
    assuming broadcastability; AQE picks BHJ when a side fits. The
    identical arithmetic expression tree on both engines keeps raw
    doubles bit-comparable before the 6-digit round."""
    from funding_monitoring_spark.operators.textstats import (
        word_trigram_structs,
    )

    docs = load_table(spark, sf_dir, "documents")
    # struct-emitting trigrams: the string form re-ran F.split THREE
    # times per trigram row (no subexpression elimination across the
    # projection); tokens contain no whitespace, so emitting the
    # component words directly is value-identical (guide §1)
    tris = docs.select(
        "doc_id",
        F.explode(
            word_trigram_structs(F.lower(F.col("text")))
        ).alias("tg"),
    ).select("doc_id", "tg.w1", "tg.w2", "tg.w3")
    tc = (
        tris.groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).cast("double").alias("c3"))
        .transform(scoped_persist)  # feeds bc, cont3 AND the join; persist (not
        # checkpoint) keeps relation statistics so the n-gram joins
        # stay broadcast-eligible at fixture scale (see dedup.py)
    )
    bc = tc.groupBy("w1", "w2").agg(
        F.sum("c3").alias("c2"),
        F.count(F.lit(1)).cast("double").alias("f3"),
    )
    cont3 = (
        tc.groupBy("w2", "w3")
        .agg(F.count(F.lit(1)).cast("double").alias("n3"))
        .transform(scoped_persist)  # feeds mid, contu, tot, join
    )
    mid = cont3.groupBy("w2").agg(
        F.sum("n3").alias("m"),
        F.count(F.lit(1)).cast("double").alias("f2"),
    )
    contu = cont3.groupBy("w3").agg(
        F.count(F.lit(1)).cast("double").alias("u")
    )
    tot = cont3.agg(F.count(F.lit(1)).cast("double").alias("t"))
    p2 = (
        F.col("n3") - 0.75 + 0.75 * F.col("f2")
        * (F.col("u") / F.col("t"))
    ) / F.col("m")
    p3 = (F.col("c3") - 0.75 + 0.75 * F.col("f3") * p2) / F.col("c2")
    return (
        tris.join(tc, ["w1", "w2", "w3"])
        .join(bc, ["w1", "w2"])
        .join(cont3, ["w2", "w3"])
        .join(mid, ["w2"])
        .join(contu, ["w3"])
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.round(
                -F.sum(F.log(p3)) / F.count(F.lit(1)), 6
            ).alias("avg_neg_logprob"),
        )
    )


ACF_ORACLE = """
    WITH s AS (
        SELECT event_type, value,
               LAG(value, 1) OVER w AS l1,
               LAG(value, 2) OVER w AS l2,
               LAG(value, 3) OVER w AS l3
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    )
    SELECT event_type, 1 AS lag,
           ROUND(CORR(value, l1), 6) + 0.0 AS acf,
           CAST(COUNT(l1) AS BIGINT) AS n_pairs
    FROM s GROUP BY 1
    UNION ALL
    SELECT event_type, 2, ROUND(CORR(value, l2), 6) + 0.0,
           CAST(COUNT(l2) AS BIGINT)
    FROM s GROUP BY 1
    UNION ALL
    SELECT event_type, 3, ROUND(CORR(value, l3), 6) + 0.0,
           CAST(COUNT(l3) AS BIGINT)
    FROM s GROUP BY 1
"""


@query("acf_by_type", ACF_ORACLE)
def q_acf_by_type(spark, sf_dir):
    """Autocorrelation function per series at lags 1-3 — the
    time-series memory diagnostic a rates monitor runs before
    trusting a rolling-mean signal (high lag-1 ACF = momentum, ~0 =
    noise; the reference's rolling averages implicitly assume the
    former). One window pass computes all three lagged columns on the
    shared (series, time) ordering, one aggregation per lag over the
    SAME frame — no re-scan, no self-join; rounded corr with the
    negative-zero canonicalization, same conventions as
    event_type_correlation."""
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    s = events.select(
        "event_type",
        "value",
        F.lag("value", 1).over(w).alias("l1"),
        F.lag("value", 2).over(w).alias("l2"),
        F.lag("value", 3).over(w).alias("l3"),
    ).localCheckpoint(eager=True)
    parts = []
    for k in (1, 2, 3):
        parts.append(
            s.groupBy("event_type").agg(
                F.lit(k).cast("int").alias("lag"),
                (
                    F.round(F.corr("value", f"l{k}"), 6) + F.lit(0.0)
                ).alias("acf"),
                F.count(f"l{k}").alias("n_pairs"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


DRAWDOWN_ORACLE = """
    WITH runs AS (
        SELECT event_type, value,
               MAX(value) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS run_max
        FROM events
    )
    SELECT event_type,
           ROUND(MIN(CASE WHEN run_max > 0
                          THEN value / run_max - 1.0 END), 6) + 0.0
               AS max_drawdown,
           ROUND(MAX(run_max), 6) AS peak,
           CAST(COUNT(*) AS BIGINT) AS n_obs
    FROM runs GROUP BY event_type
"""


@query("max_drawdown_by_type", DRAWDOWN_ORACLE)
def q_max_drawdown_by_type(spark, sf_dir):
    """Maximum drawdown per series — the worst peak-to-trough decline
    of the value path, the risk statistic a funding-rate monitor
    reports next to the rolling mean. One running-max window pass on
    the shared (series, time) ordering, then a plain aggregate: the
    drawdown at each point is value/run_max - 1 (exact same division
    on both engines), and the minimum is order-independent, so only
    the final ROUND is needed. No self-join, no re-scan.

    Drawdown is only meaningful from a POSITIVE peak: a zero peak
    divides by zero and a negative peak inverts the ratio's sign, so
    points where run_max <= 0 are excluded from the fold (funding
    rates routinely go negative) and a series with no positive peak
    reports NULL — identically guarded in the oracle's CASE."""
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runs = events.select(
        "event_type",
        "value",
        F.max("value").over(w).alias("run_max"),
    )
    return runs.groupBy("event_type").agg(
        (
            F.round(
                F.min(
                    F.when(
                        F.col("run_max") > 0,
                        F.col("value") / F.col("run_max") - 1.0,
                    )
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("max_drawdown"),
        F.round(F.max("run_max"), 6).alias("peak"),
        F.count(F.lit(1)).alias("n_obs"),
    )


# -- Count-Min point-frequency report ------------------------------------

from funding_monitoring_spark.operators.dedup import poly_hash_of
from funding_monitoring_spark.operators.sampling import (
    SAMPLE_INC,
    SAMPLE_MOD,
    SAMPLE_MUL,
    SAMPLE_SEED_PRIME,
)
from funding_monitoring_spark.operators.sketches import (
    cm_estimate,
    cm_sketch,
)
from funding_monitoring_spark.suites.dedup_suite import _sql_poly

#: the query's grid is deliberately NARROW (4 x 16) for the 31-token
#: test vocabulary so the overcount column exercises the collision
#: path; production sizing is the operator default (4 x 1024, eps =
#: e/1024). The bound and the estimates are recomputed bit-for-bit by
#: the oracle either way.
_CM_W = 16
_CM_D = 4


def _sql_cm_bucket(fp_sql: str, row: int, width: int) -> str:
    """DuckDB twin of sketches.cm_bucket: the seeded LCG mix of
    operators/sampling.py reduced mod the grid width (inputs are
    non-negative, so plain % matches pmod)."""
    m, a, c = SAMPLE_MOD, SAMPLE_MUL, SAMPLE_INC
    shifted = f"(({fp_sql}) + {row * SAMPLE_SEED_PRIME})"
    return f"(((({shifted} % {m}) * {a} + {c}) % {m}) % {width})"


_CM_ROWS = ", ".join(str(j) for j in range(_CM_D))

COUNT_MIN_ORACLE = f"""
    WITH toks AS (
        SELECT unnest(regexp_extract_all(lower(text), '\\S+')) AS token
        FROM documents
    ),
    vocab AS (
        SELECT token, {_sql_poly("token")} AS f
        FROM (SELECT DISTINCT token FROM toks)
    ),
    cells AS (
        SELECT j.j AS cm_row,
               CASE j.j
                   {" ".join(f"WHEN {j} THEN {_sql_cm_bucket('v.f', j, _CM_W)}" for j in range(_CM_D))}
               END AS cm_bucket,
               COUNT(*) AS n
        FROM toks t
        JOIN vocab v USING (token),
             (SELECT unnest([{_CM_ROWS}]) AS j) j
        GROUP BY 1, 2
    ),
    top20 AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_n
        FROM toks GROUP BY 1
        ORDER BY exact_n DESC, token LIMIT 20
    ),
    probes AS (
        SELECT t.token, t.exact_n, j.j AS cm_row,
               CASE j.j
                   {" ".join(f"WHEN {j} THEN {_sql_cm_bucket('v.f', j, _CM_W)}" for j in range(_CM_D))}
               END AS cm_bucket
        FROM top20 t
        JOIN vocab v USING (token),
             (SELECT unnest([{_CM_ROWS}]) AS j) j
    )
    SELECT p.token, p.exact_n,
           CAST(MIN(c.n) AS BIGINT) AS cm_n,
           CAST(MIN(c.n) - p.exact_n AS BIGINT) AS overcount
    FROM probes p JOIN cells c USING (cm_row, cm_bucket)
    GROUP BY 1, 2
"""


@query("count_min_freq_report", COUNT_MIN_ORACLE)
def q_count_min_freq_report(spark, sf_dir):
    """Count-Min point-frequency estimates vs exact counts for the
    top-20 corpus tokens (operators/sketches.py cm_sketch): the d x w
    counter grid is ONE groupBy over derived (row, bucket) keys —
    Spark's map-side partial aggregation is the sketch merge, so the
    shuffle moves at most d*w rows per partition no matter how large
    the corpus, and the grid broadcasts to the probe side. The
    overcount column (cm_n - exact_n, always >= 0) makes the sketch's
    approximation error an oracle-tracked number, the same discipline
    as the ANN recall reports. Grid deliberately narrow (4 x 16) at
    test scale so collisions actually occur; estimates are exact
    integer arithmetic, recomputed bit-for-bit by the DuckDB twin."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit(r"(\S+)"), 1
            )
        ).alias("token")
    )
    tf = toks.withColumn("f", poly_hash_of(F.col("token")))
    sketch = cm_sketch(tf, F.col("f"), depth=_CM_D, width=_CM_W)
    top20 = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), F.col("token"))
        .limit(20)
        .withColumn("f", poly_hash_of(F.col("token")))
    )
    est = cm_estimate(
        sketch,
        top20,
        F.col("f"),
        ["token", "exact_n"],
        depth=_CM_D,
        width=_CM_W,
    )
    return est.select(
        "token",
        "exact_n",
        "cm_n",
        (F.col("cm_n") - F.col("exact_n")).alias("overcount"),
    )


# -- CUSUM change-point detection ----------------------------------------

_CUSUM_K = 0.5  # slack, in z units
_CUSUM_H = 5.0  # alarm threshold, in z units

CUSUM_ORACLE = f"""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               ROUND(SUM(value), 6) AS s
        FROM events GROUP BY 1, 2
    ),
    stats AS (
        SELECT event_type, AVG(s) AS mu,
               AVG(s * s) - AVG(s) * AVG(s) AS var_pop
        FROM hourly GROUP BY 1
    ),
    z AS (
        SELECT h.event_type, h.h,
               (h.s - st.mu) / sqrt(st.var_pop) AS z
        FROM hourly h JOIN stats st USING (event_type)
        WHERE st.var_pop > 0
    ),
    p AS (
        SELECT event_type, h,
               SUM(z - {_CUSUM_K}) OVER w AS p_pos,
               SUM(-z - {_CUSUM_K}) OVER w AS p_neg
        FROM z
        WINDOW w AS (PARTITION BY event_type ORDER BY h
                     ROWS UNBOUNDED PRECEDING)
    ),
    c AS (
        SELECT event_type, h,
               ROUND(p_pos - LEAST(0, MIN(p_pos) OVER w), 4) + 0.0
                   AS cusum_pos,
               ROUND(p_neg - LEAST(0, MIN(p_neg) OVER w), 4) + 0.0
                   AS cusum_neg
        FROM p
        WINDOW w AS (PARTITION BY event_type ORDER BY h
                     ROWS UNBOUNDED PRECEDING)
    )
    SELECT event_type, h,
           cusum_pos, cusum_neg,
           CAST(cusum_pos > {_CUSUM_H} OR cusum_neg > {_CUSUM_H}
                AS INT) AS alarm
    FROM c
"""


@query("cusum_change_points", CUSUM_ORACLE)
def q_cusum_change_points(spark, sf_dir):
    """Two-sided CUSUM change-point statistic per series — the
    monitoring question after anomaly scoring: not "is this tick
    odd" but "has the LEVEL shifted". The Page (1954) recursion
    S_t = max(0, S_{t-1} + z_t - k) looks like an imperative fold,
    but the classic identity S_t = P_t - min(0, min_{j<=t} P_j)
    (prefix sums minus their running minimum) turns it into two
    cumulative window passes — fully distributed, no UDF, no state,
    identical algebra on both engines. Hourly sums are rounded before
    standardization (the verify-skill float discipline); variance
    uses the explicit AVG(s^2) - AVG(s)^2 form so neither engine's
    internal moment algorithm leaks into the hash."""
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.round(F.sum("value"), 6).alias("s"))
    stats = hourly.groupBy("event_type").agg(
        F.avg("s").alias("mu"),
        (F.avg(F.col("s") * F.col("s"))
         - F.avg("s") * F.avg("s")).alias("var_pop"),
    )
    z = (
        hourly.join(stats, "event_type")
        .filter(F.col("var_pop") > 0)
        .withColumn(
            "z",
            (F.col("s") - F.col("mu")) / F.sqrt(F.col("var_pop")),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = z.select(
        "event_type",
        "h",
        F.sum(F.col("z") - _CUSUM_K).over(w).alias("p_pos"),
        F.sum(-F.col("z") - _CUSUM_K).over(w).alias("p_neg"),
    )
    c = p.select(
        "event_type",
        "h",
        (
            F.round(
                F.col("p_pos")
                - F.least(F.lit(0.0), F.min("p_pos").over(w)),
                4,
            )
            + F.lit(0.0)
        ).alias("cusum_pos"),
        (
            F.round(
                F.col("p_neg")
                - F.least(F.lit(0.0), F.min("p_neg").over(w)),
                4,
            )
            + F.lit(0.0)
        ).alias("cusum_neg"),
    )
    return c.select(
        "event_type",
        "h",
        "cusum_pos",
        "cusum_neg",
        (
            (F.col("cusum_pos") > _CUSUM_H)
            | (F.col("cusum_neg") > _CUSUM_H)
        )
        .cast("int")
        .alias("alarm"),
    )


# -- unigram-LM tokenizer training (operators/unigram.py) ------------------

_UG_INF = 10**15
_UG_SCALE = 1_000_000
_UG_MAXP = 4
_UG_MULTI = 150


def _ug_cost_sql(num: str, den: str) -> str:
    """floor(-ln(num/den) * SCALE + 0.5) — the integer-cost twin of
    operators/unigram.cost_of (explicit floor(x+0.5): Python round()
    is banker's, DuckDB ROUND is half-up; floor+0.5 is both engines'
    common ground)."""
    return (
        f"CAST(floor(-ln(({num}) / ({den})) * {_UG_SCALE} + 0.5) "
        "AS BIGINT)"
    )


def _ug_fwd_cte(name: str, edges: str) -> str:
    """Forward Viterbi DP as a RECURSIVE CTE over SCALAR columns: one
    row per (word, j) carrying a sliding window of the last MAX_PIECE
    best costs (p3, p2, p1, cur) — best[j-l] is a column, never a
    list, and piece costs come from the precomputed ``edges`` table
    via a plain INNER join + GROUP BY in a subquery of the recursive
    term. This deliberately avoids two DuckDB 1.0.0 hazards observed
    live while building this oracle: (1) large lambda-built list
    columns misalign against their row under parallel vectorized
    evaluation ('customer' segmented with 'stream''s cost vector;
    correct under SET threads=1), and (2) correlated scalar
    subqueries inside a recursive term silently return NULL when the
    target CTE's plan is non-trivial. Plain joins on scalars execute
    correctly at any thread count."""
    inf = f"CAST({_UG_INF} AS BIGINT)"
    return f"""{name}(word, j, p3, p2, p1, cur) AS (
        SELECT word, 0, {inf}, {inf}, {inf}, CAST(0 AS BIGINT)
        FROM words
        UNION ALL
        SELECT word, j + 1, p2, p1, cur, newbest FROM (
            SELECT f.word AS word, f.j AS j, f.p3 AS p3, f.p2 AS p2,
                   f.p1 AS p1, f.cur AS cur,
                   MIN(e.cost + CASE e.l
                       WHEN 1 THEN f.cur WHEN 2 THEN f.p1
                       WHEN 3 THEN f.p2 ELSE f.p3 END) AS newbest
            FROM {name} f
            JOIN {edges} e ON e.word = f.word AND e.j = f.j + 1
            WHERE f.j < length(f.word)
            GROUP BY 1, 2, 3, 4, 5, 6
        )
    )"""


def _ug_seg_cte(name: str, edges: str, bests: str) -> str:
    """Backward path reconstruction as a second RECURSIVE CTE: from
    (word, len) walk to 0, at each position keeping the SMALLEST
    piece length whose edge lies on an optimal path (MIN(l) in the
    recursive term's grouped subquery) — the same tie rule as
    operators/unigram.viterbi_segment; the emitted piece rows are
    the segmentation multiset. Same joins-only discipline as the
    forward pass (see _ug_fwd_cte)."""
    return f"""{name}(word, pos, piece) AS (
        SELECT word, length(word), CAST(NULL AS VARCHAR) FROM words
        UNION ALL
        SELECT word, pos - minl,
               substring(word, pos - minl + 1, minl) FROM (
            SELECT s.word AS word, s.pos AS pos, MIN(e.l) AS minl
            FROM {name} s
            JOIN {edges} e ON e.word = s.word AND e.j = s.pos
            JOIN {bests} bp
              ON bp.word = s.word AND bp.j = s.pos - e.l
            JOIN {bests} bc ON bc.word = s.word AND bc.j = s.pos
            WHERE s.pos > 0 AND e.cost + bp.best = bc.best
            GROUP BY 1, 2
        )
    )"""


def _ug_edges_cte(name: str, cost_tbl: str) -> str:
    """(word, j, l, cost) for every in-range (position, piece length)
    pair — the vocab lookup done ONCE, relationally, outside any
    recursion; out-of-vocab pieces carry the INF sentinel. The
    positions table is bounded at 256 (a 'word' is a whitespace
    token; anything longer is not natural-language vocabulary and
    the fixture maximum is ~15)."""
    return f"""{name} AS MATERIALIZED (
        SELECT w.word, p.j, t.l,
               coalesce(c.cost, CAST({_UG_INF} AS BIGINT)) AS cost
        FROM words w
        JOIN positions p ON p.j <= length(w.word)
        JOIN lens t ON t.l <= p.j
        LEFT JOIN {cost_tbl} c
          ON c.piece = substring(w.word, p.j - t.l + 1, t.l)
    )"""


def _ug_counts_cte(name: str, seg: str) -> str:
    return f"""{name} AS MATERIALIZED (
        SELECT piece, SUM(wcount) AS n_used
        FROM {seg} JOIN words USING (word)
        WHERE piece IS NOT NULL GROUP BY 1
    )"""


def _ug_oracle() -> str:
    return f"""
    WITH RECURSIVE words AS MATERIALIZED (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS wcount FROM (
            SELECT unnest(regexp_extract_all(text, '\\S+')) AS word
            FROM documents
        ) GROUP BY 1
    ),
    positions AS (SELECT CAST(range AS INT) AS j FROM range(1, 257)),
    lens AS (SELECT * FROM (VALUES (1), (2), (3), (4)) v(l)),
    cand AS MATERIALIZED (
        SELECT piece, SUM(wcount) AS weight FROM (
            SELECT wcount,
                   unnest(flatten([[substring(word, i, l)
                       for l in range(1, least({_UG_MAXP},
                                      length(word) - i + 1) + 1)]
                       for i in range(1, length(word) + 1)])) AS piece
            FROM words
        ) GROUP BY 1
    ),
    vocab0 AS MATERIALIZED (
        SELECT piece, weight FROM cand WHERE length(piece) = 1
        UNION ALL
        SELECT piece, weight FROM (
            SELECT piece, weight, ROW_NUMBER() OVER
                (ORDER BY weight DESC, piece) AS rn
            FROM cand WHERE length(piece) > 1
        ) WHERE rn <= {_UG_MULTI}
    ),
    cost0 AS MATERIALIZED (
        SELECT piece,
               {_ug_cost_sql('weight',
                             '(SELECT SUM(weight) FROM vocab0)')}
                   AS cost
        FROM vocab0
    ),
    {_ug_edges_cte('edges1', 'cost0')},
    {_ug_fwd_cte('fwd1', 'edges1')},
    bests1 AS MATERIALIZED (SELECT word, j, cur AS best FROM fwd1),
    {_ug_seg_cte('seg1', 'edges1', 'bests1')},
    {_ug_counts_cte('counts1', 'seg1')},
    cost1 AS MATERIALIZED (
        SELECT c.piece,
               {_ug_cost_sql(
                   'COALESCE(n.n_used, 0) + 1',
                   '(SELECT SUM(n_used) FROM counts1) '
                   '+ (SELECT COUNT(*) FROM cost0)')}
                   AS cost
        FROM cost0 c LEFT JOIN counts1 n ON n.piece = c.piece
    ),
    {_ug_edges_cte('edges2', 'cost1')},
    {_ug_fwd_cte('fwd2', 'edges2')},
    bests2 AS MATERIALIZED (SELECT word, j, cur AS best FROM fwd2),
    {_ug_seg_cte('seg2', 'edges2', 'bests2')},
    {_ug_counts_cte('counts2', 'seg2')}
    SELECT c.piece, c.cost,
           CAST(COALESCE(n.n_used, 0) AS BIGINT) AS n_used
    FROM cost1 c LEFT JOIN counts2 n ON n.piece = c.piece
    """


@query("unigram_lm_train", _ug_oracle())
def q_unigram_lm_train(spark, sf_dir):
    """SentencePiece-style unigram-LM tokenizer training — the second
    tokenizer trainer next to batched BPE: candidate pieces are all
    1..4-char substrings of the corpus' distinct words (weighted by
    occurrence x word count), the vocabulary is all single chars plus
    the top-150 multi-char pieces (a bounded broadcastable artifact),
    and a fixed 2-E-step EM fits integer piece costs
    round(-ln(p)*1e6): init costs from candidate weights -> Viterbi
    E-step over DISTINCT words -> Laplace M-step -> final E-step.
    Integer costs make the DP exact cross-engine, and the DuckDB
    oracle REPLAYS the whole loop — both Viterbi passes run as
    list_reduce DPs with the same shortest-piece tie rule — so the
    value-hash match verifies the entire distributed training loop
    (the quality-classifier precedent). Scale: E-steps map over the
    distinct-word state (the batched-BPE design), never the corpus;
    the cost table is a bounded driver artifact like BPE's per-round
    argmax row."""
    from funding_monitoring_spark.operators.unigram import (
        unigram_lm_train,
    )

    docs = load_table(spark, sf_dir, "documents")
    return unigram_lm_train(
        docs, vocab_multi=_UG_MULTI, max_piece=_UG_MAXP
    )
