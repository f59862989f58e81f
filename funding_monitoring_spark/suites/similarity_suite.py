"""Similarity-search queries over the embeddings fixture with exact
DuckDB oracles. The oracle SQL uses the same SEQUENTIAL left-fold dot
product as the Spark plan, so doubles are bit-identical before
rounding and LSH sign decisions agree exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from funding_monitoring_spark.operators import similarity as S
from funding_monitoring_spark.registry import query
from funding_monitoring_spark.sources.tables import load_table

K = 5
N_QUERIES = 20
NEAR_DUP_LIMIT = 300
NEAR_DUP_THRESHOLD = 0.4

#: per-session ANN index cache, keyed by (session id, fixture dir,
#: index kind). The PQ/IVF-PQ corpus-side artifacts (codebooks, cell
#: assignments, residual codes) are once-per-ingest builds at 100 TB;
#: the four PQ queries sharing one session re-encode the same corpus
#: otherwise (same amortization precedent as the streaming chunk
#: cache). Frames are eagerly checkpointed by the builders, so cached
#: entries own materialized blocks, not lineage — which is exactly why
#: the key MUST carry the session identity: a checkpointed frame from
#: a stopped SparkSession references dead blocks, and a same-process
#: session restart (pytest, bench reruns) would otherwise hit the
#: stale entry and fail opaquely.
_ANN_INDEX_CACHE: dict[tuple[str, str, str], tuple] = {}


def _index_key(spark, sf_dir: str, kind: str) -> tuple[str, str, str]:
    import os

    return (
        spark.sparkContext.applicationId,
        os.path.abspath(sf_dir),
        kind,
    )


def _pq_index(spark, sf_dir):
    key = _index_key(spark, sf_dir, "pq")
    if key not in _ANN_INDEX_CACHE:
        emb = load_table(spark, sf_dir, "embeddings")
        _ANN_INDEX_CACHE[key] = S.build_pq_index(emb)
    return _ANN_INDEX_CACHE[key]


def _ivf_pq_index(spark, sf_dir):
    key = _index_key(spark, sf_dir, "ivf_pq")
    if key not in _ANN_INDEX_CACHE:
        emb = load_table(spark, sf_dir, "embeddings")
        _ANN_INDEX_CACHE[key] = S.build_ivf_pq_index(emb)
    return _ANN_INDEX_CACHE[key]


def _sql_dot(a: str, b: str) -> str:
    """Sequential fold matching operators.similarity.seq_dot."""
    return (
        f"list_reduce(list_prepend(0.0, "
        f"list_transform(list_zip({a}, {b}), x -> x[1] * x[2])), "
        f"(acc, y) -> acc + y)"
    )


def _sql_plane(t: int, j: int) -> str:
    vals = ", ".join(repr(v) for v in S.PLANES[t][j])
    return f"[{vals}]::DOUBLE[]"


def _sql_bucket(emb: str, t: int) -> str:
    bits = " + ".join(
        f"(CASE WHEN {_sql_dot(emb, _sql_plane(t, j))} >= 0 "
        f"THEN {1 << j} ELSE 0 END)"
        for j in range(S.N_PLANES)
    )
    return f"({bits})"


def _sql_bucket_keys(emb: str) -> str:
    keys = ", ".join(
        f"'{t}' || ':' || CAST({_sql_bucket(emb, t)} AS VARCHAR)"
        for t in range(S.N_TABLES)
    )
    return f"[{keys}]"


def _sql_probe_bucket_keys(emb: str) -> str:
    """Multi-probe twin of operators.similarity.probe_bucket_keys:
    per table, the exact bucket plus every 1-bit xor flip."""
    keys = []
    for t in range(S.N_TABLES):
        b = _sql_bucket(emb, t)
        keys.append(f"'{t}' || ':' || CAST({b} AS VARCHAR)")
        keys.extend(
            f"'{t}' || ':' || CAST(xor({b}, {1 << j}) AS VARCHAR)"
            for j in range(S.N_PLANES)
        )
    return f"[{', '.join(keys)}]"


_SQL_COSINE = (
    f"ROUND({_sql_dot('q_emb', 'c_emb')} / "
    f"(SQRT({_sql_dot('q_emb', 'q_emb')}) * "
    f"SQRT({_sql_dot('c_emb', 'c_emb')})), {S.SCORE_ROUND})"
)


ANN_EXACT_ORACLE = f"""
    WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS q_emb
               FROM embeddings WHERE vec_id < {N_QUERIES}),
    c AS (SELECT vec_id AS c_id, CAST(embedding AS DOUBLE[]) AS c_emb
          FROM embeddings),
    scored AS (
        SELECT q_id, c_id, {_SQL_COSINE} AS score
        FROM q CROSS JOIN c WHERE q_id != c_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                   ORDER BY score DESC, c_id ASC) AS rank
        FROM scored
    )
    SELECT q_id AS query_id, c_id AS neighbor_id, score, rank
    FROM ranked WHERE rank <= {K}
    """


@query("ann_cosine_topk", ANN_EXACT_ORACLE)
def q_ann_brute(spark, sf_dir):
    """Exact brute-force cosine top-k (the correctness baseline for ANN)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return S.cosine_topk(queries, emb, k=K)


ANN_LSH_ORACLE = f"""
    WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS q_emb
               FROM embeddings WHERE vec_id < {N_QUERIES}),
    c AS (SELECT vec_id AS c_id, CAST(embedding AS DOUBLE[]) AS c_emb
          FROM embeddings),
    qb AS (SELECT q_id, unnest({_sql_probe_bucket_keys('q_emb')}) AS bucket
           FROM q),
    cb AS (SELECT c_id, unnest({_sql_bucket_keys('c_emb')}) AS bucket
           FROM c),
    cand AS (
        SELECT DISTINCT q_id, c_id
        FROM qb JOIN cb USING (bucket) WHERE q_id != c_id
    ),
    scored AS (
        SELECT cand.q_id, cand.c_id, {_SQL_COSINE} AS score
        FROM cand JOIN q ON q.q_id = cand.q_id
                  JOIN c ON c.c_id = cand.c_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                   ORDER BY score DESC, c_id ASC) AS rank
        FROM scored
    )
    SELECT q_id AS query_id, c_id AS neighbor_id, score, rank
    FROM ranked WHERE rank <= {K}
    """


@query("ann_cosine_topk_lsh", ANN_LSH_ORACLE)
def q_ann_lsh(spark, sf_dir):
    """Approximate top-k via random-hyperplane LSH buckets — candidates
    share the query's sign-pattern bucket (equi-join, not cross join)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return S.cosine_topk_lsh(queries, emb, k=K)


_SQL_RAW_COSINE = (
    f"{_sql_dot('q_emb', 'c_emb')} / "
    f"(SQRT({_sql_dot('q_emb', 'q_emb')}) * "
    f"SQRT({_sql_dot('c_emb', 'c_emb')}))"
)


@query(
    "ann_cosine_topk_scale",
    f"""
    WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS q_emb
               FROM embeddings WHERE vec_id < {N_QUERIES}),
    c AS (SELECT vec_id AS c_id, CAST(embedding AS DOUBLE[]) AS c_emb
          FROM embeddings),
    scored AS (
        SELECT q_id, c_id, {_SQL_RAW_COSINE} AS raw
        FROM q CROSS JOIN c WHERE q_id != c_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                   ORDER BY raw DESC, c_id ASC) AS rank
        FROM scored
    )
    SELECT q_id AS query_id, c_id AS neighbor_id,
           ROUND(raw, {S.SCORE_ROUND}) AS score, rank
    FROM ranked WHERE rank <= {K}
    """,
)
def q_ann_scale(spark, sf_dir):
    """Exact top-k via vectorized mapInPandas + per-partition candidate
    pruning (the distributed-scale path; raw doubles bit-identical to
    the fold, ranked pre-rounding)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return S.cosine_topk_scale(queries, emb, k=K)


ANN_IVF_ORACLE = f"""
    WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS q_emb
               FROM embeddings WHERE vec_id < {N_QUERIES}),
    c AS (SELECT vec_id AS c_id, CAST(embedding AS DOUBLE[]) AS c_emb
          FROM embeddings),
    cents AS (
        SELECT vec_id AS cent_id, CAST(embedding AS DOUBLE[]) AS cent_emb,
               SQRT({_sql_dot("CAST(embedding AS DOUBLE[])",
                              "CAST(embedding AS DOUBLE[])")}) AS cent_norm
        FROM embeddings WHERE vec_id % {S.IVF_CENTROID_MOD} = 0
          AND vec_id < {S.IVF_CENT_CAP}
    ),
    c_assign AS (
        SELECT c_id, cent_id FROM (
            SELECT c.c_id, cents.cent_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY c.c_id
                       ORDER BY {_sql_dot('c_emb', 'cent_emb')} /
                                (SQRT({_sql_dot('c_emb', 'c_emb')}) * cent_norm)
                                DESC, cent_id ASC) AS crank
            FROM c CROSS JOIN cents
        ) WHERE crank <= 1
    ),
    q_probe AS (
        SELECT q_id, cent_id FROM (
            SELECT q.q_id, cents.cent_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.q_id
                       ORDER BY {_sql_dot('q_emb', 'cent_emb')} /
                                (SQRT({_sql_dot('q_emb', 'q_emb')}) * cent_norm)
                                DESC, cent_id ASC) AS crank
            FROM q CROSS JOIN cents
        ) WHERE crank <= {S.IVF_NPROBE}
    ),
    cand AS (
        SELECT DISTINCT q_id, c_id
        FROM q_probe JOIN c_assign USING (cent_id)
        WHERE q_id != c_id
    ),
    scored AS (
        SELECT cand.q_id, cand.c_id, {_SQL_RAW_COSINE} AS raw
        FROM cand JOIN q ON q.q_id = cand.q_id
                  JOIN c ON c.c_id = cand.c_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                   ORDER BY raw DESC, c_id ASC) AS rank
        FROM scored
    )
    SELECT q_id AS query_id, c_id AS neighbor_id,
           ROUND(raw, {S.SCORE_ROUND}) AS score, rank
    FROM ranked WHERE rank <= {K}
    """


@query("ann_cosine_topk_ivf", ANN_IVF_ORACLE)
def q_ann_ivf(spark, sf_dir):
    """Approximate top-k via an IVF index (corpus hard-assigned to
    sampled centroid cells; queries probe nprobe cells) — candidate
    equi-join on cell id, the partition-by-cell scale path."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return S.cosine_topk_ivf(queries, emb, k=K)


NEAR_DUP_LSH_ORACLE = f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings WHERE vec_id < {NEAR_DUP_LIMIT}),
    vb AS (SELECT vec_id, unnest({_sql_bucket_keys('emb')}) AS bucket
           FROM v),
    vpb AS (SELECT vec_id, unnest({_sql_probe_bucket_keys('emb')}) AS bucket
            FROM v),
    cand AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM vpb a JOIN vb b USING (bucket) WHERE a.vec_id < b.vec_id
    ),
    pairs AS (
        SELECT id_a, id_b, va.emb AS q_emb, vc.emb AS c_emb
        FROM cand JOIN v va ON va.vec_id = cand.id_a
                  JOIN v vc ON vc.vec_id = cand.id_b
    )
    SELECT id_a, id_b, {_SQL_COSINE} AS score
    FROM pairs
    WHERE {_SQL_COSINE} >= {NEAR_DUP_THRESHOLD}
    """


@query("embedding_near_dup", NEAR_DUP_LSH_ORACLE)
def q_embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs, LSH band-then-verify —
    the scale path (bucket equi-join, no cross join; the oracle
    mirrors the banding so candidate sets agree exactly)."""
    v = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < NEAR_DUP_LIMIT
    )
    return S.embedding_near_dup(v, threshold=NEAR_DUP_THRESHOLD)


NEAR_DUP_EXACT_ORACLE = f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings WHERE vec_id < {NEAR_DUP_LIMIT}),
    pairs AS (
        SELECT a.vec_id AS q_id, b.vec_id AS c_id,
               a.emb AS q_emb, b.emb AS c_emb
        FROM v a CROSS JOIN v b WHERE a.vec_id < b.vec_id
    )
    SELECT q_id AS id_a, c_id AS id_b, {_SQL_COSINE} AS score
    FROM pairs
    WHERE {_SQL_COSINE} >= {NEAR_DUP_THRESHOLD}
    """


@query("embedding_near_dup_exact", NEAR_DUP_EXACT_ORACLE)
def q_embedding_near_dup_exact(spark, sf_dir):
    """Exact all-pairs near-dup twin (bounded fixture): the recall
    baseline the LSH path is measured against."""
    v = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < NEAR_DUP_LIMIT
    )
    return S.embedding_near_dup_exact(v, threshold=NEAR_DUP_THRESHOLD)


def _sql_kmeans_cents(n_iters: int) -> tuple[str, str]:
    """Unrolled Lloyd iterations as chained CTEs, mirroring
    operators.similarity.kmeans_refined_centroids: assignment by the
    same seq-fold cosine, per-dimension means rounded to the same
    digits, norms recomputed over the rounded centroid."""
    ctes = [
        f"""dims AS (SELECT unnest(range(1, {S.DIM + 1})) AS dim),
    kc AS (SELECT vec_id AS c_id, CAST(embedding AS DOUBLE[]) AS c_emb,
                  SQRT({_sql_dot("CAST(embedding AS DOUBLE[])",
                                 "CAST(embedding AS DOUBLE[])")}) AS c_norm
           FROM embeddings),
    cents0 AS (
        SELECT c_id AS cent_id, c_emb AS cent_emb, c_norm AS cent_norm
        FROM kc WHERE c_id % {S.IVF_CENTROID_MOD} = 0
          AND c_id < {S.IVF_CENT_CAP}
    )"""
    ]
    for i in range(1, n_iters + 1):
        prev = f"cents{i - 1}"
        ctes.append(
            f"""a{i} AS (
        SELECT c_id, cent_id FROM (
            SELECT kc.c_id, ct.cent_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY kc.c_id
                       ORDER BY {_sql_dot("c_emb", "cent_emb")} /
                                (c_norm * cent_norm) DESC,
                                cent_id ASC) AS crank
            FROM kc CROSS JOIN {prev} ct
        ) WHERE crank = 1
    ),
    m{i} AS (
        SELECT cent_id, d.dim AS dim,
               ROUND(AVG(list_extract(c_emb, CAST(d.dim AS INT))),
                     {S.CENTROID_ROUND}) AS val
        FROM a{i} JOIN kc USING (c_id) CROSS JOIN dims d
        GROUP BY cent_id, d.dim
    ),
    cents{i} AS (
        SELECT cent_id, cent_emb,
               SQRT({_sql_dot("cent_emb", "cent_emb")}) AS cent_norm
        FROM (
            SELECT cent_id, list(val ORDER BY dim) AS cent_emb
            FROM m{i} GROUP BY cent_id
        )
    )"""
        )
    return ",\n    ".join(ctes), f"cents{n_iters}"


_KMEANS_CTES, _KMEANS_FINAL = _sql_kmeans_cents(S.IVF_KMEANS_ITERS)


@query(
    "ann_cosine_topk_ivf_kmeans",
    f"""
    WITH {_KMEANS_CTES},
    q AS (SELECT c_id AS q_id, c_emb AS q_emb, c_norm AS q_norm
          FROM kc WHERE c_id < {N_QUERIES}),
    c_assign AS (
        SELECT c_id, cent_id FROM (
            SELECT kc.c_id, ct.cent_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY kc.c_id
                       ORDER BY {_sql_dot("c_emb", "cent_emb")} /
                                (c_norm * cent_norm) DESC,
                                cent_id ASC) AS crank
            FROM kc CROSS JOIN {_KMEANS_FINAL} ct
        ) WHERE crank <= 1
    ),
    q_probe AS (
        SELECT q_id, cent_id FROM (
            SELECT q.q_id, ct.cent_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.q_id
                       ORDER BY {_sql_dot("q_emb", "cent_emb")} /
                                (q_norm * cent_norm) DESC,
                                cent_id ASC) AS crank
            FROM q CROSS JOIN {_KMEANS_FINAL} ct
        ) WHERE crank <= {S.IVF_NPROBE}
    ),
    cand AS (
        SELECT DISTINCT q_id, c_id
        FROM q_probe JOIN c_assign USING (cent_id)
        WHERE q_id != c_id
    ),
    scored AS (
        SELECT cand.q_id, cand.c_id,
               {_sql_dot("q_emb", "c_emb")} / (q_norm * c_norm) AS raw
        FROM cand JOIN q ON q.q_id = cand.q_id
                  JOIN kc ON kc.c_id = cand.c_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                   ORDER BY raw DESC, c_id ASC) AS rank
        FROM scored
    )
    SELECT q_id AS query_id, c_id AS neighbor_id,
           ROUND(raw, {S.SCORE_ROUND}) AS score, rank
    FROM ranked WHERE rank <= {K}
    """,
)
def q_ann_ivf_kmeans(spark, sf_dir):
    """IVF top-k with Lloyd-refined centroids (2 iterations): the
    sampled cells move to the data's density before search; same cell
    equi-join probe as ann_cosine_topk_ivf."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return S.cosine_topk_ivf_kmeans(queries, emb, k=K)


@query(
    "embedding_quantize_int8",
    """
    WITH v AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vv
        FROM embeddings
    ),
    s AS (
        SELECT vec_id, vv,
               list_max(list_transform(vv, x -> abs(x))) / 127.0 AS scale
        FROM v
    ),
    q AS (
        SELECT vec_id, vv, scale,
               CASE WHEN scale = 0
                    THEN list_transform(vv, x -> CAST(0 AS BIGINT))
                    ELSE list_transform(
                        vv, x -> CAST(floor(x / scale + 0.5) AS BIGINT))
               END AS qq
        FROM s
    )
    SELECT vec_id,
           ROUND(scale, 6) AS scale,
           list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                            list_transform(qq, x -> abs(x))),
               (a, b) -> a + b) AS q_l1,
           ROUND(
               list_reduce(
                   list_prepend(0.0,
                       list_transform(range(1, len(vv) + 1),
                           i -> abs(list_extract(vv, i)
                                    - list_extract(qq, i) * scale))),
                   (a, b) -> a + b)
               / greatest(len(vv), 1), 6) AS mean_abs_err
    FROM q
    """,
)
def q_embedding_quantize_int8(spark, sf_dir):
    """Absmax int8 quantization audit over the embedding table: scale,
    quantized L1 mass (exact integer — any quantization divergence
    breaks it), and mean dequantization error. Scan-stage higher-order
    functions, no shuffle, no UDF (operators/vectorops.py)."""
    from funding_monitoring_spark.operators.vectorops import (
        quantize_int8_stats,
    )

    return quantize_int8_stats(load_table(spark, sf_dir, "embeddings"))


def _recall_sql(method: str, approx_sql: str) -> str:
    return f"""
    SELECT '{method}' AS method,
           CAST(COUNT(DISTINCT e.query_id) AS BIGINT) AS n_queries,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           CAST(COALESCE(SUM(CASE WHEN a.neighbor_id IS NOT NULL
                                  THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS n_hits,
           ROUND(COALESCE(SUM(CASE WHEN a.neighbor_id IS NOT NULL
                                   THEN 1 ELSE 0 END), 0)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS recall_at_k
    FROM (SELECT query_id, neighbor_id FROM ({ANN_EXACT_ORACLE})) e
    LEFT JOIN (SELECT query_id, neighbor_id FROM ({approx_sql})) a
           USING (query_id, neighbor_id)
    """


@query(
    "ann_recall_report",
    f"""
    {_recall_sql('lsh', ANN_LSH_ORACLE)}
    UNION ALL
    {_recall_sql('ivf', ANN_IVF_ORACLE)}
    """,
)
def q_ann_recall_report(spark, sf_dir):
    """recall@k of the two approximate ANN paths against the exact
    brute-force baseline — the approximation-quality claim as an
    oracle-tracked number instead of an assertion. Every input is
    deterministic (fold dot product, score-then-id tie-break), so
    recall is exactly reproducible on both engines. The exact top-k
    is localCheckpointed: it feeds both method rows and Catalyst
    never reuses aliased subplans, so without it the brute-force
    scoring would run twice."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    exact = (
        S.cosine_topk(queries, emb, k=K)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=True)
    )
    lsh = S.cosine_topk_lsh(queries, emb, k=K)
    ivf = S.cosine_topk_ivf(queries, emb, k=K)
    return S.topk_recall(exact, lsh, "lsh").unionByName(
        S.topk_recall(exact, ivf, "ivf")
    )


@query(
    "near_dup_recall_report",
    f"""
    SELECT 'lsh_near_dup' AS method,
           CAST((SELECT COUNT(*)
                 FROM ({NEAR_DUP_EXACT_ORACLE})) AS BIGINT) AS n_exact,
           CAST(COUNT(*) AS BIGINT) AS n_hits,
           ROUND(COUNT(*) / CAST((SELECT COUNT(*)
                 FROM ({NEAR_DUP_EXACT_ORACLE})) AS DOUBLE), 6)
               AS recall
    FROM ({NEAR_DUP_EXACT_ORACLE}) e
    JOIN ({NEAR_DUP_LSH_ORACLE}) a USING (id_a, id_b)
    """,
)
def q_near_dup_recall_report(spark, sf_dir):
    """recall of the LSH band-then-verify near-dup pair set against
    the exact all-pairs twin at the same threshold — the second
    approximate path whose quality claim becomes an oracle-tracked
    number (companion to ann_recall_report). Both pair sets are
    deterministic, so recall is exact; the semi-join probes the
    (tiny) pair frames, never the embeddings."""
    v = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < NEAR_DUP_LIMIT
    )
    exact = S.embedding_near_dup_exact(
        v, threshold=NEAR_DUP_THRESHOLD
    ).select("id_a", "id_b").localCheckpoint(eager=True)
    lsh = S.embedding_near_dup(v, threshold=NEAR_DUP_THRESHOLD).select(
        "id_a", "id_b"
    )
    hits = exact.join(lsh, ["id_a", "id_b"], "left_semi")
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    return (
        hits.agg(F.count(F.lit(1)).alias("n_hits"))
        .crossJoin(F.broadcast(n_exact))
        .select(
            F.lit("lsh_near_dup").alias("method"),
            "n_exact",
            "n_hits",
            F.round(
                F.col("n_hits") / F.col("n_exact").cast("double"), 6
            ).alias("recall"),
        )
    )


SEMANTIC_DEDUP_ORACLE = f"""
    WITH RECURSIVE v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        FROM embeddings WHERE vec_id < {NEAR_DUP_LIMIT}
    ),
    vb AS (SELECT vec_id, unnest({_sql_bucket_keys('emb')}) AS bucket
           FROM v),
    vpb AS (SELECT vec_id, unnest({_sql_probe_bucket_keys('emb')}) AS bucket
            FROM v),
    cand AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM vpb a JOIN vb b USING (bucket) WHERE a.vec_id < b.vec_id
    ),
    dpairs AS (
        SELECT id_a, id_b
        FROM (SELECT id_a, id_b, va.emb AS q_emb, vc.emb AS c_emb
              FROM cand JOIN v va ON va.vec_id = cand.id_a
                        JOIN v vc ON vc.vec_id = cand.id_b)
        WHERE {_SQL_COSINE} >= {NEAR_DUP_THRESHOLD}
    ),
    edges AS (
        SELECT id_a AS u, id_b AS w FROM dpairs
        UNION
        SELECT id_b AS u, id_a AS w FROM dpairs
    ),
    reach(id, lbl) AS (
        SELECT u, u FROM edges
        UNION
        SELECT e.w, r.lbl FROM reach r JOIN edges e ON e.u = r.id
    ),
    comp AS (SELECT id, MIN(lbl) AS cluster_id FROM reach GROUP BY id)
    SELECT v.vec_id,
           COALESCE(c.cluster_id, v.vec_id) AS cluster_id,
           v.vec_id = COALESCE(c.cluster_id, v.vec_id) AS is_canonical
    FROM v LEFT JOIN comp c ON c.id = v.vec_id
    """


@query("semantic_dedup_clusters", SEMANTIC_DEDUP_ORACLE)
def q_semantic_dedup_clusters(spark, sf_dir):
    """SEMANTIC deduplication end to end — the embedding-space twin of
    the MinHash `dedup_clusters` pipeline: multi-probe LSH near-dup
    pairs (cosine >= threshold, exact-verified) feed hash-min
    connected components, every vector maps to its transitive
    duplicate cluster, and `is_canonical` marks the survivor a
    curation pass keeps (min id — deterministic). The oracle replays
    the same pairs and closes them with a recursive CTE, so cluster
    assignments are value-checked member by member. At 100 TB every
    stage is bounded: bucket equi-joins for pairs, (node, label)
    shuffles for the closure, and the final assignment joins the slim
    component frame back to the corpus."""
    from funding_monitoring_spark.operators.components import (
        dedup_cluster_assignment,
    )

    v = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < NEAR_DUP_LIMIT
    )
    pairs = S.embedding_near_dup(
        v, threshold=NEAR_DUP_THRESHOLD
    ).select("id_a", "id_b")
    return dedup_cluster_assignment(
        v.select("vec_id"), pairs, id_col="vec_id"
    ).select("vec_id", "cluster_id", "is_canonical")


def _sql_sq_l2(a: str, b: str) -> str:
    """Sequential fold matching operators.similarity._sq_l2."""
    return (
        f"list_reduce(list_prepend(0.0, "
        f"list_transform(list_zip({a}, {b}), "
        f"x -> (x[1] - x[2]) * (x[1] - x[2]))), "
        f"(acc, y) -> acc + y)"
    )


ANN_PQ_ORACLE = f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings),
    n AS (SELECT vec_id,
                 list_transform(
                     emb, x -> x / sqrt({_sql_dot('emb', 'emb')}))
                     AS nemb
          FROM v),
    subs AS (SELECT vec_id, m,
                    list_slice(nemb, (m - 1) * {S.PQ_SUBDIM} + 1,
                               m * {S.PQ_SUBDIM}) AS sub
             FROM n CROSS JOIN
                  (SELECT unnest(range(1, {S.PQ_M} + 1)) AS m)),
    cents AS (SELECT m, vec_id AS j, sub AS csub
              FROM subs
              WHERE vec_id % {S.PQ_CENT_MOD} = 0
                AND vec_id < {S.PQ_CENT_CAP}),
    dists AS (SELECT s.vec_id AS c_id, s.m, c.j,
                     ROUND({_sql_sq_l2('s.sub', 'c.csub')},
                           {S.SCORE_ROUND}) AS dist
              FROM subs s JOIN cents c ON s.m = c.m),
    codes AS (SELECT c_id, m, j AS code FROM (
                  SELECT *, ROW_NUMBER() OVER (
                      PARTITION BY c_id, m
                      ORDER BY dist ASC, j ASC) AS rn
                  FROM dists)
              WHERE rn = 1),
    lut AS (SELECT q.vec_id AS q_id, q.m, c.j,
                   {_sql_dot('q.sub', 'c.csub')} AS partial
            FROM subs q JOIN cents c ON q.m = c.m
            WHERE q.vec_id < {N_QUERIES}),
    pairs AS (SELECT l.q_id, cd.c_id, cd.m, l.partial
              FROM codes cd
              JOIN lut l ON l.m = cd.m AND l.j = cd.code),
    scored AS (SELECT q_id, c_id,
                      ROUND(list_reduce(
                          list_prepend(0.0,
                              list(partial ORDER BY m)),
                          (acc, y) -> acc + y), {S.SCORE_ROUND})
                          AS score
               FROM pairs
               GROUP BY q_id, c_id
               HAVING q_id != c_id),
    shortlist AS (SELECT q_id, c_id FROM (
                      SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                          ORDER BY score DESC, c_id ASC) AS rn
                      FROM scored)
                  WHERE rn <= {K} * {S.PQ_RERANK}),
    rescored AS (SELECT s.q_id, s.c_id, {_SQL_COSINE} AS score
                 FROM shortlist s
                 JOIN (SELECT vec_id AS q_id, emb AS q_emb FROM v) q
                      USING (q_id)
                 JOIN (SELECT vec_id AS c_id, emb AS c_emb FROM v) c
                      USING (c_id)),
    ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                   ORDER BY score DESC, c_id ASC) AS rank
               FROM rescored)
    SELECT q_id AS query_id, c_id AS neighbor_id, score, rank
    FROM ranked WHERE rank <= {K}
    """


@query("ann_cosine_topk_pq", ANN_PQ_ORACLE)
def q_ann_pq(spark, sf_dir):
    """Product-quantized ANN with asymmetric distance computation
    plus exact re-rank: the corpus is compressed to PQ_M sub-centroid
    codes, queries precompute per-subspace inner-product lookup
    tables against the broadcast codebook, ADC scores (m-ordered sums
    of table lookups — the scan touches codes, never embeddings)
    winnow to a rerank*k shortlist, and only that bounded shortlist
    gets full-dimension exact rescoring. Every argmin, fold, and cut
    is fixed-order with rounded tie-breaks, so the whole compressed
    pipeline (codebook -> encode -> LUT -> ADC shortlist -> exact
    re-rank) hashes exactly against the oracle's replica. At 100 TB
    this composes with IVF cell routing (IVF-PQ); here the linear ADC
    scan is the registered path."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return S.cosine_topk_pq(
        queries, emb, k=K, index=_pq_index(spark, sf_dir)
    )


@query(
    "ann_pq_recall_report",
    _recall_sql("pq", ANN_PQ_ORACLE),
)
def q_ann_pq_recall(spark, sf_dir):
    """recall@k of the PQ/ADC path against the exact brute-force
    baseline — the compression-quality claim as an oracle-tracked
    number, companion to ann_recall_report's LSH/IVF rows (PQ trades
    memory for recall; LSH/IVF trade candidates for recall)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    exact = (
        S.cosine_topk(queries, emb, k=K)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=True)
    )
    return S.topk_recall(
        exact,
        S.cosine_topk_pq(
            queries, emb, k=K, index=_pq_index(spark, sf_dir)
        ),
        "pq",
    )


ANN_IVF_PQ_ORACLE = f"""
    WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS q_emb
               FROM embeddings WHERE vec_id < {N_QUERIES}),
    c AS (SELECT vec_id AS c_id, CAST(embedding AS DOUBLE[]) AS c_emb
          FROM embeddings),
    cents AS (
        SELECT vec_id AS cent_id, CAST(embedding AS DOUBLE[]) AS cent_emb,
               SQRT({_sql_dot("CAST(embedding AS DOUBLE[])",
                              "CAST(embedding AS DOUBLE[])")}) AS cent_norm
        FROM embeddings WHERE vec_id % {S.IVF_CENTROID_MOD} = 0
          AND vec_id < {S.IVF_CENT_CAP}
    ),
    c_assign AS (
        SELECT c_id, cent_id FROM (
            SELECT c.c_id, cents.cent_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY c.c_id
                       ORDER BY {_sql_dot('c_emb', 'cent_emb')} /
                                (SQRT({_sql_dot('c_emb', 'c_emb')}) * cent_norm)
                                DESC, cent_id ASC) AS crank
            FROM c CROSS JOIN cents
        ) WHERE crank <= 1
    ),
    q_probe AS (
        SELECT q_id, cent_id FROM (
            SELECT q.q_id, cents.cent_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.q_id
                       ORDER BY {_sql_dot('q_emb', 'cent_emb')} /
                                (SQRT({_sql_dot('q_emb', 'q_emb')}) * cent_norm)
                                DESC, cent_id ASC) AS crank
            FROM q CROSS JOIN cents
        ) WHERE crank <= {S.IVF_NPROBE}
    ),
    cand AS (
        SELECT DISTINCT q_id, c_id
        FROM q_probe JOIN c_assign USING (cent_id)
        WHERE q_id != c_id
    ),
    nv AS (SELECT vec_id,
                  list_transform(
                      CAST(embedding AS DOUBLE[]),
                      x -> x / sqrt({_sql_dot(
                          "CAST(embedding AS DOUBLE[])",
                          "CAST(embedding AS DOUBLE[])")}))
                      AS nemb
           FROM embeddings),
    ncents AS (SELECT cent_id,
                      list_transform(cent_emb, x -> x / cent_norm)
                          AS ncent
               FROM cents),
    resid AS (SELECT nv.vec_id AS c_id,
                     list_transform(
                         list_zip(nv.nemb, nc.ncent),
                         x -> x[1] - x[2]) AS remb
              FROM nv
              JOIN c_assign ca ON ca.c_id = nv.vec_id
              JOIN ncents nc USING (cent_id)),
    rsubs AS (SELECT c_id, m,
                     list_slice(remb, (m - 1) * {S.PQ_SUBDIM} + 1,
                                m * {S.PQ_SUBDIM}) AS sub
              FROM resid CROSS JOIN
                   (SELECT unnest(range(1, {S.PQ_M} + 1)) AS m)),
    qsubs AS (SELECT vec_id AS q_id, m,
                     list_slice(nemb, (m - 1) * {S.PQ_SUBDIM} + 1,
                                m * {S.PQ_SUBDIM}) AS sub
              FROM nv CROSS JOIN
                   (SELECT unnest(range(1, {S.PQ_M} + 1)) AS m)
              WHERE vec_id < {N_QUERIES}),
    pcents AS (SELECT m, c_id AS j, sub AS csub
               FROM rsubs
               WHERE c_id % {S.PQ_CENT_MOD} = 0
                 AND c_id < {S.PQ_CENT_CAP}),
    dists AS (SELECT s.c_id, s.m, p.j,
                     ROUND({_sql_sq_l2('s.sub', 'p.csub')},
                           {S.SCORE_ROUND}) AS dist
              FROM rsubs s JOIN pcents p ON s.m = p.m),
    codes AS (SELECT c_id, m, j AS code FROM (
                  SELECT *, ROW_NUMBER() OVER (
                      PARTITION BY c_id, m
                      ORDER BY dist ASC, j ASC) AS rn
                  FROM dists)
              WHERE rn = 1),
    lut AS (SELECT s.q_id, s.m, p.j AS code,
                   {_sql_dot('s.sub', 'p.csub')} AS partial
            FROM qsubs s JOIN pcents p ON s.m = p.m),
    cent_term AS (SELECT cand.q_id, cand.c_id, 0 AS m,
                         {_sql_dot('qn.nemb', 'nc.ncent')} AS partial
                  FROM cand
                  JOIN c_assign ca ON ca.c_id = cand.c_id
                  JOIN ncents nc USING (cent_id)
                  JOIN nv qn ON qn.vec_id = cand.q_id),
    pairs AS (SELECT cand.q_id, cand.c_id, cd.m, l.partial
              FROM cand
              JOIN codes cd ON cd.c_id = cand.c_id
              JOIN lut l ON l.q_id = cand.q_id
                        AND l.m = cd.m AND l.code = cd.code
              UNION ALL
              SELECT q_id, c_id, m, partial FROM cent_term),
    adc AS (SELECT q_id, c_id,
                   ROUND(list_reduce(
                       list_prepend(0.0, list(partial ORDER BY m)),
                       (acc, y) -> acc + y), {S.SCORE_ROUND})
                       AS adc_score
            FROM pairs GROUP BY q_id, c_id),
    shortlist AS (SELECT q_id, c_id FROM (
                      SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                          ORDER BY adc_score DESC, c_id ASC) AS rn
                      FROM adc)
                  WHERE rn <= {K} * {S.IVF_PQ_RERANK}),
    rescored AS (SELECT s.q_id, s.c_id,
                        ROUND({_SQL_RAW_COSINE}, {S.SCORE_ROUND})
                            AS score
                 FROM shortlist s
                 JOIN q USING (q_id)
                 JOIN c USING (c_id)),
    ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                   ORDER BY score DESC, c_id ASC) AS rank
               FROM rescored)
    SELECT q_id AS query_id, c_id AS neighbor_id, score, rank
    FROM ranked WHERE rank <= {K}
    """


@query("ann_cosine_topk_ivf_pq", ANN_IVF_PQ_ORACLE)
def q_ann_ivf_pq(spark, sf_dir):
    """IVF-PQ with residual encoding, the composed 100 TB ANN path
    made concrete instead of a docstring promise: IVF cells route
    (candidates are a cell equi-join — never a corpus scan), PQ codes
    quantize each vector's RESIDUAL to its cell centroid (standard
    IVF-PQ: q.v = q.cent + q.r, the exact centroid term folds in as
    an m=0 row), and the rerank*k ADC shortlist alone is
    exact-rescored. The oracle replays every stage — cell assignment,
    residual, codebook, encode, LUT, m-ordered ADC fold, shortlist
    cut, exact re-rank — so the full composition value-hashes. Recall
    at sf0.01 is 0.69 = the plain-IVF routing ceiling (nothing inside
    the probed cells is lost); see IVF_PQ_RERANK for the fixture-vs-
    clustered-corpus operating-point discussion."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return S.cosine_topk_ivf_pq(
        queries, emb, k=K, index=_ivf_pq_index(spark, sf_dir)
    )


@query(
    "ann_ivf_pq_recall_report",
    _recall_sql("ivf_pq", ANN_IVF_PQ_ORACLE),
)
def q_ann_ivf_pq_recall(spark, sf_dir):
    """recall@k of the composed IVF-PQ path against the exact
    baseline: 0.69 at sf0.01 — AT the plain-IVF routing ceiling
    (round 7: residual encoding + the IVF_PQ_RERANK shortlist closed
    the 0.03 the raw-vector encode gave up inside the probed cells),
    tracked like every other approximate path."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    exact = (
        S.cosine_topk(queries, emb, k=K)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=True)
    )
    return S.topk_recall(
        exact,
        S.cosine_topk_ivf_pq(
            queries, emb, k=K, index=_ivf_pq_index(spark, sf_dir)
        ),
        "ivf_pq"
    )


# -- incremental ANN index maintenance ---------------------------------

#: v1 of the embeddings snapshot store holds vec_id < IDX_SPLIT;
#: v2 appends the rest. Centroids train ONCE on v1 (standard IVF
#: practice: the coarse quantizer is frozen; new data routes to
#: existing cells until a rebuild is scheduled).
IDX_SPLIT = 350

ANN_INDEX_INCR_ORACLE = f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings),
    cents AS (
        SELECT vec_id AS cent_id, emb AS cent_emb,
               SQRT({_sql_dot('emb', 'emb')}) AS cent_norm
        FROM v WHERE vec_id % {S.IVF_CENTROID_MOD} = 0
                 AND vec_id < least({IDX_SPLIT}, {S.IVF_CENT_CAP})
    ),
    assign AS (
        SELECT vec_id, cent_id FROM (
            SELECT v.vec_id, cents.cent_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY {_sql_dot('emb', 'cent_emb')} /
                                (SQRT({_sql_dot('emb', 'emb')})
                                 * cent_norm) DESC,
                                cent_id ASC) AS rn
            FROM v CROSS JOIN cents
        ) WHERE rn = 1
    )
    SELECT vec_id, cent_id,
           CAST(CASE WHEN vec_id < {IDX_SPLIT} THEN 1 ELSE 2 END
                AS INT) AS indexed_at_version
    FROM assign
    """


@query("ann_index_incremental", ANN_INDEX_INCR_ORACLE)
def q_ann_index_incremental(spark, sf_dir):
    """Stateful ANN index maintenance: the IVF routing table kept in
    step with a GROWING table-format store, re-routing ONLY the rows
    added since the last indexed version. v1 of the snapshot store is
    committed and fully indexed (centroids trained on it, then
    frozen — standard IVF practice); v2 appends new vectors, and the
    index update reads exactly the delta via read_snapshot_changes
    (file-set subtraction on manifests — no rescan of v1's files) and
    assigns it against the SAME frozen centroids. The oracle is the
    full rebuild over the final table, so the hash proves
    incremental == rebuild row for row; indexed_at_version pins WHICH
    pass indexed each vector, so a delta reader that leaks old rows
    (or misses new ones) breaks the match. At 100 TB this is the
    difference between re-encoding the corpus nightly and routing
    only the day's ingest — the same consumer pattern as
    incremental_rollup_maintenance, applied to the ANN index."""
    import os
    import tempfile as _tf

    from funding_monitoring_spark.sources.snapshots import (
        commit_snapshot,
        read_snapshot,
        read_snapshot_changes,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    store = os.path.join(
        _tf.mkdtemp(prefix="fm_ann_idx_"), "embeddings"
    )
    v1 = commit_snapshot(emb.filter(F.col("vec_id") < IDX_SPLIT), store)
    base = read_snapshot(spark, store, version=v1)
    cents = S._prep(
        base.filter(
            ((F.col("vec_id") % S.IVF_CENTROID_MOD) == 0)
            & (F.col("vec_id") < S.IVF_CENT_CAP)
        ),
        "vec_id",
        "embedding",
        "cent",
    ).localCheckpoint(eager=True)

    def route(df, version: int):
        return (
            S._cell_assignments(
                S._prep(df, "vec_id", "embedding", "v"), cents, keep=1
            )
            .select(
                F.col("v_id").alias("vec_id"),
                "cent_id",
                F.lit(version).cast("int").alias("indexed_at_version"),
            )
        )

    index_v1 = route(base, 1)
    commit_snapshot(emb.filter(F.col("vec_id") >= IDX_SPLIT), store)
    delta = read_snapshot_changes(spark, store, from_version=v1)
    return index_v1.unionByName(route(delta, 2))
