"""Corpus-curation queries (round-2 LLM-pipeline extensions):
Gopher-style repetition filtering, TF-IDF salient terms, train/eval
n-gram contamination, PII redaction, and a corpus-balance report.
Every oracle reproduces the Spark computation fragment-by-fragment in
DuckDB SQL (hash-verified, not rows-counted)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from funding_monitoring_spark.operators import corpus as C
from funding_monitoring_spark.operators import textstats as X
from funding_monitoring_spark.registry import query
from funding_monitoring_spark.sources.tables import load_table
from funding_monitoring_spark.suites.dedup_suite import _FPS

_TOKS = r"regexp_extract_all(text, '\S+')"

#: bigram list over a token list named `toks` (DuckDB range() is
#: end-exclusive, so i runs 1..len-1 and pairs (i, i+1))
_SQL_BIGRAMS = (
    "list_transform(range(1, len(toks)), "
    "i -> list_extract(toks, i) || ' ' || list_extract(toks, i + 1))"
)


@query(
    "repetition_filter",
    f"""
    WITH base AS (
        SELECT doc_id, {_TOKS} AS toks FROM documents
    ),
    bi AS (
        SELECT doc_id, unnest({_SQL_BIGRAMS}) AS bigram FROM base
    ),
    cnt AS (
        SELECT doc_id, bigram, COUNT(*) AS c FROM bi GROUP BY 1, 2
    ),
    top AS (
        SELECT doc_id, MAX(c) AS top_n, SUM(c) AS total_bigrams
        FROM cnt GROUP BY 1
    )
    SELECT b.doc_id,
           len(toks) AS n_tokens,
           ROUND(CASE WHEN len(toks) > 0
                      THEN len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE)
                      ELSE 1.0 END, 6) AS distinct_ratio,
           ROUND(COALESCE(top_n / CAST(total_bigrams AS DOUBLE), 0.0), 6)
               AS top_bigram_fraction,
           CAST(
             ROUND(CASE WHEN len(toks) > 0
                        THEN len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE)
                        ELSE 1.0 END, 6) < {C.MIN_DISTINCT_TOKEN_RATIO}
             OR (COALESCE(total_bigrams, 0) >= {C.MIN_BIGRAMS_FOR_TOP_RULE}
                 AND ROUND(COALESCE(top_n / CAST(total_bigrams AS DOUBLE),
                                    0.0), 6)
                     > {C.MAX_TOP_BIGRAM_FRACTION})
             AS INT) AS is_repetitive
    FROM base b LEFT JOIN top USING (doc_id)
    """,
)
def q_repetition_filter(spark, sf_dir):
    """Gopher-style repetition profile per document (Rae et al. 2021's
    repetitive-document rules re-expressed over the documents table):
    distinct-token ratio + top-bigram occupancy + composite verdict."""
    return C.repetition_metrics(load_table(spark, sf_dir, "documents"))


@query(
    "tfidf_top_terms",
    """
    WITH t AS (
        SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2
    ),
    df AS (
        SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT doc_id, term,
               ROUND(tf * ln(n_docs / CAST(df AS DOUBLE)), 6) AS tfidf
        FROM tf JOIN df USING (term) CROSS JOIN n
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rn
        FROM scored
    )
    SELECT doc_id, term, tfidf, rn FROM ranked WHERE rn <= 3
    """,
)
def q_tfidf_top_terms(spark, sf_dir):
    """Top-3 TF-IDF terms per document; rank on the rounded score so
    float ulps in ln() cannot flip cross-engine ordering."""
    return C.tfidf_top_terms(load_table(spark, sf_dir, "documents"), k=3)


#: eval-set membership: a deterministic id sieve (≈1/37 of the corpus)
EVAL_MOD = 37


@query(
    "test_set_contamination",
    f"""
    WITH g AS (
        SELECT doc_id, unnest({_FPS}) AS gram FROM documents
    ),
    e AS (
        SELECT DISTINCT gram FROM g WHERE doc_id % {EVAL_MOD} = 0
    ),
    t AS (
        SELECT doc_id, gram FROM g WHERE doc_id % {EVAL_MOD} <> 0
    ),
    per_doc AS (
        SELECT doc_id, COUNT(*) AS n_grams FROM t GROUP BY 1
    ),
    hits AS (
        SELECT doc_id, COUNT(*) AS n_shared_grams
        FROM t JOIN e USING (gram) GROUP BY 1
    )
    SELECT doc_id, n_shared_grams, n_grams,
           ROUND(n_shared_grams / CAST(n_grams AS DOUBLE), 6)
               AS contamination_rate
    FROM hits JOIN per_doc USING (doc_id)
    """,
)
def q_test_set_contamination(spark, sf_dir):
    """Which training documents share token shingles with the held-out
    eval slice (doc_id % 37 == 0), and what fraction of their grams is
    contaminated. Eval gram dictionary broadcasts; train side never
    shuffles text."""
    docs = load_table(spark, sf_dir, "documents")
    return C.ngram_contamination(
        docs, eval_pred=F.col("doc_id") % EVAL_MOD == 0
    )


@query(
    "pii_redaction",
    f"""
    WITH derived AS (
        SELECT doc_id,
               text || ' contact: user' || CAST(doc_id AS VARCHAR)
                    || '@' || source || '.example.com tel +1-555-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                   AS contact_text
        FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(contact_text, '{X.EMAIL_RE}'))
               AS n_emails,
           len(regexp_extract_all(contact_text, '{X.PHONE_RE}'))
               AS n_phones,
           regexp_replace(
               regexp_replace(contact_text, '{X.EMAIL_RE}', '<EMAIL>', 'g'),
               '{X.PHONE_RE}', '<PHONE>', 'g') AS redacted
    FROM derived
    """,
)
def q_pii_redaction(spark, sf_dir):
    """PII scrub over a derived contact column (the synthetic corpus
    contains no organic PII, so the query plants a deterministic email
    + phone per doc, then counts and redacts them — the operator under
    test is textstats.redact_pii). Pure scan-stage regexes: at 100 TB
    this pipelines with the read, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    contact = F.concat(
        F.col("text"),
        F.lit(" contact: user"),
        F.col("doc_id").cast("string"),
        F.lit("@"),
        F.col("source"),
        F.lit(".example.com tel +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    return docs.select(
        "doc_id",
        F.regexp_count(contact, F.lit(X.EMAIL_RE)).alias("n_emails"),
        F.regexp_count(contact, F.lit(X.PHONE_RE)).alias("n_phones"),
        X.redact_pii(contact).alias("redacted"),
    )


@query(
    "corpus_balance_report",
    """
    WITH per AS (
        SELECT lang, source, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY 1, 2
    ),
    tot AS (
        SELECT SUM(n_docs) AS all_docs, SUM(total_chars) AS all_chars
        FROM per
    )
    SELECT lang, source, n_docs, total_chars,
           ROUND(n_docs / CAST(all_docs AS DOUBLE), 6) AS doc_share,
           ROUND(total_chars / CAST(all_chars AS DOUBLE), 6) AS char_share
    FROM per CROSS JOIN tot
    """,
)
def q_corpus_balance_report(spark, sf_dir):
    """Corpus composition audit: per (lang, source) document/char counts
    and global shares. Global totals join back as a 1-row broadcast —
    no global window over row-level data."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
    tot = per.agg(
        F.sum("n_docs").alias("all_docs"),
        F.sum("total_chars").alias("all_chars"),
    )
    return per.join(F.broadcast(tot)).select(
        "lang",
        "source",
        "n_docs",
        "total_chars",
        F.round(F.col("n_docs") / F.col("all_docs"), 6).alias("doc_share"),
        F.round(F.col("total_chars") / F.col("all_chars"), 6).alias(
            "char_share"
        ),
    )


@query(
    "term_posting_lists",
    """
    WITH terms AS (
        SELECT DISTINCT doc_id,
               unnest(regexp_extract_all(text, '\\S+')) AS term
        FROM documents
    )
    SELECT term,
           COUNT(*) AS df,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
               AS postings
    FROM terms GROUP BY term
    """,
)
def q_term_posting_lists(spark, sf_dir):
    """Inverted-index build: term → document frequency + ascending
    posting list (serialized as a comma string so the driver's value
    hash covers the ordering, not just membership). One shuffle on the
    term key; collect_list order is made deterministic with
    sort_array. At 100 TB postings shard by (term, doc_id range) —
    the groupBy key extends with a bucket column, same plan shape."""
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.regexp_extract_all("text", F.lit(r"(\S+)"), 1)
            )
        ).alias("term"),
    )
    return terms.groupBy("term").agg(
        F.count("*").alias("df"),
        F.array_join(
            # sort NUMERICALLY before stringifying ("10" < "2" would
            # diverge from the oracle's ORDER BY doc_id)
            F.transform(
                F.sort_array(F.collect_list("doc_id")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("postings"),
    )


@query(
    "ngram_novelty",
    f"""
    WITH g AS (
        SELECT doc_id, unnest({_FPS}) AS gram FROM documents
    ),
    firsts AS (
        SELECT gram, MIN(doc_id) AS first_doc FROM g GROUP BY 1
    )
    SELECT g.doc_id,
           COUNT(*) AS n_grams,
           COUNT(*) FILTER (WHERE f.first_doc = g.doc_id) AS n_novel,
           ROUND(COUNT(*) FILTER (WHERE f.first_doc = g.doc_id)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS novelty
    FROM g JOIN firsts f USING (gram)
    GROUP BY g.doc_id
    """,
)
def q_ngram_novelty(spark, sf_dir):
    """Corpus-order novelty score: the fraction of a document's token
    shingles that no lower-id document contains — the streaming-
    ingestion view of "how much does this doc add?". Shuffles only
    int64 gram fingerprints keyed by gram, then one per-doc count;
    text never leaves the scan stage."""
    from funding_monitoring_spark.operators.dedup import (
        shingle_fingerprints,
    )

    docs = load_table(spark, sf_dir, "documents")
    g = docs.select(
        "doc_id", F.explode(shingle_fingerprints("text")).alias("gram")
    )
    # first_doc as a window-min over the gram partition instead of a
    # groupBy + join back onto g (guide §2.4): Catalyst has no
    # subplan reuse, so the join shape evaluated the whole shingle
    # explode TWICE and shuffled it twice on the gram key; the window
    # computes the identical per-gram minimum in the single gram
    # shuffle the plan already needed.
    w = Window.partitionBy("gram")
    tagged = g.select(
        "doc_id", F.min("doc_id").over(w).alias("first_doc")
    )
    return tagged.groupBy("doc_id").agg(
        F.count("*").alias("n_grams"),
        F.sum(
            (F.col("first_doc") == F.col("doc_id")).cast("long")
        ).alias("n_novel"),
        F.round(
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("long"))
            / F.count("*"),
            6,
        ).alias("novelty"),
    )


PACK_CAPACITY = 512  # tokens per packed training sequence


@query(
    "sequence_packing_plan",
    f"""
    WITH toks AS (
        SELECT doc_id, lang, len({_TOKS}) AS n_tokens FROM documents
    ),
    pos AS (
        SELECT doc_id, lang, n_tokens,
               CAST(SUM(n_tokens) OVER (
                   PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_tokens AS BIGINT) AS start_offset
        FROM toks
    )
    SELECT doc_id, lang, n_tokens, start_offset,
           start_offset // {PACK_CAPACITY} AS pack_id,
           start_offset % {PACK_CAPACITY} AS offset_in_pack
    FROM pos
    """,
)
def q_sequence_packing_plan(spark, sf_dir):
    """Deterministic sequence-packing plan: concatenate each language
    stream in doc_id order and split at {capacity}-token boundaries —
    every doc gets its pack id and intra-pack offset (docs straddling
    a boundary continue into the next pack, the standard LLM-pretrain
    packing). A pure window cumsum: one shuffle on the stream key.
    At 100 TB use sequence_packing_sharded — its (lang, shard) stream
    key keeps any single window partition bounded."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id", "lang", X.token_count("text").alias("n_tokens")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pos = toks.withColumn(
        "start_offset",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long"),
    )
    return pos.select(
        "doc_id",
        "lang",
        "n_tokens",
        "start_offset",
        F.floor(F.col("start_offset") / PACK_CAPACITY).alias("pack_id"),
        (F.col("start_offset") % PACK_CAPACITY).alias("offset_in_pack"),
    )


PACK_SHARDS = 8  # parallel packing streams per language


@query(
    "sequence_packing_sharded",
    f"""
    WITH toks AS (
        SELECT doc_id, lang,
               CAST(doc_id % {PACK_SHARDS} AS INT) AS shard,
               len({_TOKS}) AS n_tokens
        FROM documents
    ),
    pos AS (
        SELECT doc_id, lang, shard, n_tokens,
               CAST(SUM(n_tokens) OVER (
                   PARTITION BY lang, shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_tokens AS BIGINT) AS start_offset
        FROM toks
    )
    SELECT doc_id, lang, shard, n_tokens, start_offset,
           start_offset // {PACK_CAPACITY} AS pack_seq,
           start_offset % {PACK_CAPACITY} AS offset_in_pack
    FROM pos
    """,
)
def q_sequence_packing_sharded(spark, sf_dir):
    """The 100 TB shape of sequence packing: the stream key is
    (lang, shard) with shard = doc_id % {PACK_SHARDS}, so each language
    is {PACK_SHARDS} independent packing streams and no single window
    partition ever holds a whole language — the one known skew cliff of
    sequence_packing_plan (where the largest language = the largest
    partition). Pack identity is the (lang, shard, pack_seq) triple;
    determinism is unchanged (modulo sharding + doc_id order commute
    with retries). Scale knob: PACK_SHARDS grows with corpus size so
    that max per-partition tokens ≈ corpus_tokens / (|langs|·shards)
    stays inside executor memory;
    tests/test_curation_ops.py::test_sharded_packing_bounds_partitions
    pins the bound at fixture scale."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id",
        "lang",
        (F.col("doc_id") % PACK_SHARDS).cast("int").alias("shard"),
        X.token_count("text").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pos = toks.withColumn(
        "start_offset",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long"),
    )
    return pos.select(
        "doc_id",
        "lang",
        "shard",
        "n_tokens",
        "start_offset",
        F.floor(F.col("start_offset") / PACK_CAPACITY).alias("pack_seq"),
        (F.col("start_offset") % PACK_CAPACITY).alias("offset_in_pack"),
    )


SOURCE_CAP = 25
#: Knuth multiplicative hash for a cross-engine deterministic shuffle
#: order (xxhash64 exists only in Spark, DuckDB's hash() differs)
_KNUTH = 2654435761


@query(
    "cap_per_source",
    f"""
    WITH ranked AS (
        SELECT doc_id, lang, source,
               ROW_NUMBER() OVER (
                   PARTITION BY lang, source
                   ORDER BY (doc_id * {_KNUTH}) % 4294967296, doc_id
               ) AS sample_rank
        FROM documents
    )
    SELECT doc_id, lang, source, sample_rank
    FROM ranked WHERE sample_rank <= {SOURCE_CAP}
    """,
)
def q_cap_per_source(spark, sf_dir):
    """Per-(lang, source) document cap — the corpus-rebalancing step
    after corpus_balance_report flags over-represented slices: keep at
    most {cap} docs per slice, chosen by a DETERMINISTIC pseudo-random
    order (Knuth multiplicative hash of doc_id — reproducible across
    engines, retries, and runs, unlike rand()). One window shuffle on
    the slice key; at 100 TB this is the same shape as
    sequence_packing_sharded's cumsum and shards the same way if a
    slice is hot."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    order = (F.col("doc_id") * _KNUTH) % F.lit(4294967296)
    w = Window.partitionBy("lang", "source").orderBy(order, "doc_id")
    return (
        docs.select(
            "doc_id",
            "lang",
            "source",
            F.row_number().over(w).alias("sample_rank"),
        )
        .filter(F.col("sample_rank") <= SOURCE_CAP)
    )


# -- overlapping token-window chunking (pretraining preprocessing) ---------

CHUNK_TOKENS = 64  # window size W
CHUNK_STRIDE = 48  # stride S (overlap = W - S = 16 tokens)


@query(
    "doc_chunking",
    f"""
    WITH base AS (
        SELECT doc_id, {_TOKS} AS toks, len({_TOKS}) AS n
        FROM documents
    ),
    sized AS (
        SELECT doc_id, toks, n,
               GREATEST(1, CAST(CEIL((n - {CHUNK_TOKENS}) /
                                     {CHUNK_STRIDE}.0) AS BIGINT) + 1)
                   AS n_chunks
        FROM base
    ),
    chunks AS (
        SELECT doc_id, i AS chunk_id,
               list_slice(toks, i * {CHUNK_STRIDE} + 1,
                          LEAST(i * {CHUNK_STRIDE} + {CHUNK_TOKENS}, n))
                   AS ct
        FROM sized, UNNEST(range(n_chunks)) AS u(i)
    )
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(chunk_id * {CHUNK_STRIDE} AS BIGINT) AS chunk_start,
           CAST(len(ct) AS BIGINT) AS n_chunk_tokens,
           array_to_string(ct, ' ') AS chunk_text
    FROM chunks
    """,
)
def q_doc_chunking(spark, sf_dir):
    """Fixed-window token chunking with overlap — the standard
    pretraining preprocessing step that turns variable-length
    documents into model-context-sized pieces (window W=64 whitespace
    tokens, stride S=48, 16-token overlap so no boundary context is
    lost; short docs yield exactly one chunk).

    Scale shape: a narrow per-row transform (split → sequence →
    explode → slice), no shuffle, all whole-stage-codegen built-ins —
    the explode fan-out is bounded at ceil(n_tokens/S) chunks per doc
    and each output row is capped at W tokens, so output size is a
    fixed multiple (~W/S) of the input regardless of document-length
    skew. Pairs with sequence_packing_plan, which packs these chunks
    back into full training sequences.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.expr(r"regexp_extract_all(text, '\\S+', 0)")
    base = docs.select("doc_id", toks.alias("toks")).withColumn(
        "n", F.size("toks")
    )
    n_chunks = F.greatest(
        F.lit(1).cast("long"),
        F.ceil(
            (F.col("n") - F.lit(CHUNK_TOKENS)) / F.lit(float(CHUNK_STRIDE))
        ).cast("long")
        + 1,
    )
    exploded = base.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
            "chunk_id"
        ),
    )
    ct = F.slice(
        F.col("toks"),
        (F.col("chunk_id") * CHUNK_STRIDE + 1).cast("int"),
        CHUNK_TOKENS,
    )
    return exploded.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        (F.col("chunk_id") * CHUNK_STRIDE).cast("long").alias("chunk_start"),
        F.size(ct).cast("long").alias("n_chunk_tokens"),
        F.array_join(ct, " ").alias("chunk_text"),
    )


_VOCAB_SIZE = 500

TOKEN_ID_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id,
               unnest(range(1, len(l) + 1)) AS pos,
               unnest(l) AS t
        FROM (SELECT doc_id,
                     regexp_extract_all(lower(text), '\\S+') AS l
              FROM documents)
    ),
    vocab AS (
        SELECT t,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, t ASC) AS id
        FROM toks GROUP BY t
    )
    SELECT toks.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           string_agg(CAST(CASE WHEN vocab.id <= {_VOCAB_SIZE}
                                THEN CAST(vocab.id AS INT) ELSE 0 END
                           AS VARCHAR), ',' ORDER BY toks.pos)
               AS token_ids
    FROM toks JOIN vocab ON vocab.t = toks.t
    GROUP BY toks.doc_id
"""


def _encode_token_ids(docs):
    """(doc_id, n_tokens, token_ids) for every non-empty document —
    the shared tokenizer-application body of `token_id_encoding` and
    `packed_training_batches`."""
    from pyspark.sql.window import Window as W

    toks = docs.select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit(r"(\S+)"), 1
            )
        ).alias("pos", "t"),
    )
    vocab = (
        toks.groupBy("t")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "id",
            F.row_number().over(W.orderBy(F.desc("cnt"), F.asc("t"))),
        )
        .select(
            "t",
            F.when(F.col("id") <= _VOCAB_SIZE, F.col("id"))
            .otherwise(F.lit(0))
            .cast("int")
            .alias("id"),
        )
    )
    return (
        toks.join(F.broadcast(vocab), "t")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "id"))),
                lambda s: s["id"],
            ).alias("token_ids"),
        )
    )


@query("token_id_encoding", TOKEN_ID_ORACLE)
def q_token_id_encoding(spark, sf_dir):
    """Tokenizer APPLICATION — text → integer id sequences, the step
    between vocabulary building and sequence packing: rank the corpus
    vocabulary by frequency (the vocab is a post-aggregation dim
    table, so its global ranking is dim-side work), map every token
    through the BROADCAST vocab with ids beyond the 500-cap folded to
    0 (<unk>), and reassemble each document's id array in position
    order (sort_array over (pos, id) structs — deterministic without
    relying on collect order). One shuffle for the vocab count, one
    for the per-doc reassembly; the token stream itself never sorts
    globally. The id array is serialized to a comma string at the
    query boundary (the term_posting_lists pattern) so the driver's
    value hash covers ordering AND its canonicalizer — which sorts
    raw pandas columns and crashes on list cells — can digest it."""
    return _encode_token_ids(load_table(spark, sf_dir, "documents")).select(
        "doc_id",
        "n_tokens",
        F.array_join(
            F.transform("token_ids", lambda x: x.cast("string")), ","
        ).alias("token_ids"),
    )


PACKED_BATCHES_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id,
               unnest(range(1, len(l) + 1)) AS pos,
               unnest(l) AS t
        FROM (SELECT doc_id,
                     regexp_extract_all(lower(text), '\\S+') AS l
              FROM documents)
    ),
    vocab AS (
        SELECT t,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, t ASC) AS id
        FROM toks GROUP BY t
    ),
    ids AS (
        SELECT toks.doc_id, toks.pos,
               CASE WHEN vocab.id <= {_VOCAB_SIZE}
                    THEN CAST(vocab.id AS INT) ELSE 0 END AS id
        FROM toks JOIN vocab ON vocab.t = toks.t
    ),
    doc_meta AS (
        SELECT d.doc_id, d.lang, COUNT(*) AS n_tokens
        FROM documents d JOIN ids ON ids.doc_id = d.doc_id
        GROUP BY d.doc_id, d.lang
    ),
    offsets AS (
        SELECT doc_id, lang,
               CAST(SUM(n_tokens) OVER (
                   PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_tokens AS BIGINT) AS start_offset
        FROM doc_meta
    )
    SELECT o.lang,
           (o.start_offset + ids.pos - 1) // {PACK_CAPACITY} AS pack_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           string_agg(CAST(ids.id AS VARCHAR), ','
                      ORDER BY o.start_offset + ids.pos - 1)
               AS token_ids
    FROM ids JOIN offsets o ON o.doc_id = ids.doc_id
    GROUP BY o.lang, (o.start_offset + ids.pos - 1) // {PACK_CAPACITY}
"""


@query("packed_training_batches", PACKED_BATCHES_ORACLE)
def q_packed_training_batches(spark, sf_dir):
    """The training-data pipeline's final artifact: fixed-capacity
    packed id sequences. Composes the tokenizer application
    (_encode_token_ids) with the contiguous packing plan
    (sequence_packing_plan's per-language cumsum): each token's
    GLOBAL stream position = its document's start offset + its
    position, pack = position // {capacity}, and every pack
    reassembles its ≤ {capacity} ids in stream order. Docs straddle
    pack boundaries — standard LLM-pretrain packing, zero padding
    waste. Per-pack collect is bounded by the capacity, and the pack
    grouping shuffles (pack_id, id) pairs only."""
    docs = load_table(spark, sf_dir, "documents")
    ids = _encode_token_ids(docs).localCheckpoint(eager=True)
    from pyspark.sql.window import Window as W

    w = (
        W.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    offsets = (
        ids.join(
            docs.select("doc_id", "lang"), "doc_id"
        )
        .withColumn(
            "start_offset",
            (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast(
                "long"
            ),
        )
        .select("doc_id", "lang", "start_offset", "token_ids")
    )
    exploded = offsets.select(
        "lang",
        "start_offset",
        F.posexplode("token_ids").alias("pos", "id"),
    ).select(
        "lang",
        (F.col("start_offset") + F.col("pos")).alias("gpos"),
        "id",
    )
    return (
        exploded.withColumn(
            "pack_id", F.floor(F.col("gpos") / PACK_CAPACITY)
        )
        .groupBy("lang", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            # comma-serialized in stream order: driver-canonicalizable
            # (its raw-column sort crashes on list cells) and the hash
            # covers intra-pack ordering, not just membership
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("gpos", "id"))),
                    lambda s: s["id"].cast("string"),
                ),
                ",",
            ).alias("token_ids"),
        )
    )


SPAN_WORDS = 10

SPAN_DEDUP_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, regexp_extract_all(text, '\\S+') AS l
        FROM documents
    ),
    segs AS (
        SELECT doc_id, CAST(s AS INT) AS seg_idx,
               array_to_string(
                   l[s * {SPAN_WORDS} + 1 : (s + 1) * {SPAN_WORDS}], ' '
               ) AS seg
        FROM toks,
             unnest(range(0, CAST(ceil(len(l) / {SPAN_WORDS}.0) AS INT)))
                 AS u(s)
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY seg ORDER BY doc_id, seg_idx
        ) AS rn
        FROM segs
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           string_agg(CASE WHEN rn = 1 THEN seg END, ' '
                      ORDER BY seg_idx) AS cleaned_text
    FROM ranked GROUP BY doc_id
"""


@query("span_dedup_cleaned_docs", SPAN_DEDUP_ORACLE)
def q_span_dedup_cleaned_docs(spark, sf_dir):
    """C4-style SPAN deduplication — finer-grained than whole-document
    dedup: every document splits into fixed {n}-word segments, a
    segment whose exact text already appeared EARLIER in the corpus
    (first occurrence by (doc_id, seg_idx) — deterministic) is
    removed, and each document reassembles from its surviving
    segments. Catches boilerplate repeated across documents that
    document-level fingerprints miss entirely. One shuffle on the
    segment text (rank-the-first-occurrence window) and one on doc_id
    for reassembly — segment text is the heaviest thing shuffled, the
    same cost shape C4's three-sentence-span dedup pays at scale; at
    100 TB the window key would extend with a segment hash bucket.
    The oracle replays the identical split/rank/reassembly, so the
    cleaned TEXT itself is value-hashed, not just the counts."""
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.regexp_extract_all(
            F.col("text"), F.lit(r"(\S+)"), 1
        ).alias("l"),
    )
    segs = toks.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.ceil(F.size("l") / SPAN_WORDS).cast("int") - 1,
            )
        ).alias("seg_idx"),
        F.col("l"),
    ).select(
        "doc_id",
        "seg_idx",
        F.array_join(
            F.slice(
                "l",
                F.col("seg_idx") * SPAN_WORDS + 1,
                SPAN_WORDS,
            ),
            " ",
        ).alias("seg"),
    )
    ranked = segs.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("seg").orderBy("doc_id", "seg_idx")
        ),
    )
    agg = ranked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum((F.col("rn") == 1).cast("int")).alias("n_kept"),
        # when(rn != 1) -> NULL, which collect_list drops; surviving
        # segments reassemble in seg_idx order
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(
                            F.col("rn") == 1,
                            F.struct("seg_idx", "seg"),
                        )
                    )
                ),
                lambda x: x["seg"],
            ),
            " ",
        ).alias("joined"),
    )
    return agg.select(
        "doc_id",
        "n_segments",
        "n_kept",
        # a fully-duplicated doc has NO surviving segments: NULL, to
        # match string_agg over an all-NULL group
        F.when(F.col("n_kept") > 0, F.col("joined")).alias(
            "cleaned_text"
        ),
    )


# -- offset-robust exact-substring dedup -----------------------------------

SUBSTR_GRAM = 8

SUBSTRING_DEDUP_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, regexp_extract_all(text, '\\S+') AS l
        FROM documents
    ),
    g AS (
        SELECT doc_id, len(l) AS n_tokens, CAST(i AS BIGINT) AS pos,
               array_to_string(
                   l[i + 1 : i + {SUBSTR_GRAM}], ' '
               ) AS gram
        FROM toks, unnest(range(0, len(l) - {SUBSTR_GRAM} + 1)) AS u(i)
        WHERE len(l) >= {SUBSTR_GRAM}
    ),
    dup AS (
        SELECT doc_id, n_tokens, pos FROM (
            SELECT *, COUNT(*) OVER (PARTITION BY gram) AS cnt FROM g
        ) WHERE cnt >= 2
    ),
    flagged AS (
        SELECT doc_id, n_tokens, pos,
               CASE WHEN pos > COALESCE(MAX(pos + {SUBSTR_GRAM} - 1)
                   OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), -{SUBSTR_GRAM} - 2) + 1
               THEN 1 ELSE 0 END AS new_island
        FROM dup
    ),
    islands AS (
        SELECT *, SUM(new_island) OVER (
            PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS isl
        FROM flagged
    ),
    per_island AS (
        SELECT doc_id, n_tokens, isl, COUNT(*) AS n_starts,
               MAX(pos) - MIN(pos) + {SUBSTR_GRAM} AS covered
        FROM islands GROUP BY doc_id, n_tokens, isl
    ),
    per_doc AS (
        SELECT doc_id,
               CAST(SUM(n_starts) AS BIGINT) AS dup_gram_starts,
               CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
               CAST(SUM(covered) AS BIGINT) AS dup_tokens
        FROM per_island GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.l) AS BIGINT) AS n_tokens,
           COALESCE(p.dup_gram_starts, 0) AS dup_gram_starts,
           COALESCE(p.n_dup_spans, 0) AS n_dup_spans,
           COALESCE(p.dup_tokens, 0) AS dup_tokens,
           ROUND(COALESCE(p.dup_tokens, 0) /
                 GREATEST(len(t.l), 1), 6) AS dup_ratio
    FROM toks t LEFT JOIN per_doc p USING (doc_id)
"""


@query("substring_dedup_spans", SUBSTRING_DEDUP_ORACLE)
def q_substring_dedup_spans(spark, sf_dir):
    """Offset-robust exact-substring duplication report — the
    suffix-array dedup family (anchor n-gram + span coalescing) over
    the documents corpus: a position is duplicated iff its exact
    {SUBSTR_GRAM}-word window occurs >= 2 times corpus-wide (ANY
    offset — the case span_dedup_cleaned_docs' fixed 10-word grid
    misses when boilerplate shifts by even one word), and overlapping
    windows coalesce to maximal spans. Per doc: duplicated-anchor
    count, maximal-span count, exact union token coverage, ratio.
    Scale shape: shuffle keys are the anchor gram (one linear
    count-over-partition — never a pair join, so a viral gram cannot
    go quadratic) and doc_id (islands + report share a partitioning);
    rows are O(total tokens). The oracle replays the identical
    anchor/count/coalesce algebra in SQL."""
    from funding_monitoring_spark.operators.dedup import (
        duplicated_span_report,
    )

    docs = load_table(spark, sf_dir, "documents")
    return duplicated_span_report(
        docs, id_col="doc_id", text_col="text", min_gram=SUBSTR_GRAM
    )


@query("substring_dedup_spans_folded", SUBSTRING_DEDUP_ORACLE)
def q_substring_dedup_spans_folded(spark, sf_dir):
    """The FULL-SCALE variant of substring_dedup_spans: the
    {SUBSTR_GRAM}-word anchor gram is xxhash64-folded to 8 bytes
    BEFORE the gram-keyed shuffle, cutting the key mass of the
    biggest exchange of a corpus-wide substring-dedup pass ~8x
    (operators/dedup.py fold_grams). The oracle is the SAME
    string-keyed SQL as substring_dedup_spans — the driver's
    value-hash match IS the statement that folding changes nothing
    (a 64-bit collision would over-count one anchor; property-tested
    fold ≡ string in tests/test_extensions.py on corpora with forced
    shifted duplicates)."""
    from funding_monitoring_spark.operators.dedup import (
        duplicated_span_report,
    )

    docs = load_table(spark, sf_dir, "documents")
    return duplicated_span_report(
        docs,
        id_col="doc_id",
        text_col="text",
        min_gram=SUBSTR_GRAM,
        fold_grams=True,
    )


SUBSTRING_CLEAN_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, regexp_extract_all(text, '\\S+') AS l
        FROM documents
    ),
    g AS (
        SELECT doc_id, CAST(i AS BIGINT) AS pos,
               array_to_string(
                   l[i + 1 : i + {SUBSTR_GRAM}], ' '
               ) AS gram
        FROM toks, unnest(range(0, len(l) - {SUBSTR_GRAM} + 1)) AS u(i)
        WHERE len(l) >= {SUBSTR_GRAM}
    ),
    ranked AS (
        SELECT doc_id, pos,
               COUNT(*) OVER (PARTITION BY gram) AS cnt,
               ROW_NUMBER() OVER (
                   PARTITION BY gram ORDER BY doc_id, pos
               ) AS rn
        FROM g
    ),
    covered AS (
        SELECT DISTINCT doc_id, CAST(c AS BIGINT) AS cpos
        FROM ranked, unnest(range(pos, pos + {SUBSTR_GRAM})) AS u(c)
        WHERE cnt >= 2 AND rn >= 2
    ),
    words AS (
        SELECT doc_id, unnest(range(0, len(l))) AS pos,
               unnest(l) AS word
        FROM toks
    ),
    kept AS (
        SELECT w.doc_id, w.pos, w.word
        FROM words w
        LEFT JOIN covered c
          ON w.doc_id = c.doc_id AND w.pos = c.cpos
        WHERE c.doc_id IS NULL
    ),
    agg AS (
        SELECT doc_id, COUNT(*) AS kept_n,
               string_agg(word, ' ' ORDER BY pos) AS joined
        FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.l) AS BIGINT) AS n_tokens,
           CAST(len(t.l) - COALESCE(a.kept_n, 0) AS BIGINT)
               AS n_removed,
           a.joined AS cleaned_text
    FROM toks t LEFT JOIN agg a USING (doc_id)
"""


@query("substring_dedup_cleaned_docs", SUBSTRING_CLEAN_ORACLE)
def q_substring_dedup_cleaned_docs(spark, sf_dir):
    """The APPLY half of offset-robust exact-substring dedup: keep
    the FIRST corpus-wide occurrence (by doc_id, position) of every
    duplicated {SUBSTR_GRAM}-word window, remove the tokens every
    later occurrence covers, and reassemble each document from its
    surviving tokens — the keep-one-copy cleaned-corpus contract of
    the public exact-substring dedup pipelines, robust to arbitrary
    word offsets. The cleaned TEXT itself is value-hashed against the
    oracle's identical rank/cover/reassemble replay, not just the
    counts. Scale shape: one gram-keyed window (rank — linear, no
    pair join), a bounded x{SUBSTR_GRAM} covered-position explode,
    then doc_id-keyed anti-join + ordered reassembly."""
    from funding_monitoring_spark.operators.dedup import (
        remove_duplicated_spans,
    )

    docs = load_table(spark, sf_dir, "documents")
    return remove_duplicated_spans(
        docs, id_col="doc_id", text_col="text", min_gram=SUBSTR_GRAM
    )


INCR_SUBSTR_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, regexp_extract_all(text, '\\S+') AS l
        FROM documents
    ),
    store_grams AS (
        SELECT DISTINCT array_to_string(
                   l[i + 1 : i + {SUBSTR_GRAM}], ' '
               ) AS gram
        FROM toks, unnest(range(0, len(l) - {SUBSTR_GRAM} + 1)) AS u(i)
        WHERE len(l) >= {SUBSTR_GRAM} AND doc_id % 3 != 0
    ),
    batch_grams AS (
        SELECT doc_id, CAST(i AS BIGINT) AS pos,
               array_to_string(
                   l[i + 1 : i + {SUBSTR_GRAM}], ' '
               ) AS gram
        FROM toks, unnest(range(0, len(l) - {SUBSTR_GRAM} + 1)) AS u(i)
        WHERE len(l) >= {SUBSTR_GRAM} AND doc_id % 3 = 0
    ),
    dup AS (
        SELECT doc_id, pos FROM batch_grams
        WHERE gram IN (SELECT gram FROM store_grams)
    ),
    flagged AS (
        SELECT doc_id, pos,
               CASE WHEN pos > COALESCE(MAX(pos + {SUBSTR_GRAM} - 1)
                   OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), -{SUBSTR_GRAM} - 2) + 1
               THEN 1 ELSE 0 END AS new_island
        FROM dup
    ),
    islands AS (
        SELECT *, SUM(new_island) OVER (
            PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS isl
        FROM flagged
    ),
    per_island AS (
        SELECT doc_id, isl, COUNT(*) AS n_starts,
               MAX(pos) - MIN(pos) + {SUBSTR_GRAM} AS covered
        FROM islands GROUP BY doc_id, isl
    ),
    per_doc AS (
        SELECT doc_id,
               CAST(SUM(n_starts) AS BIGINT) AS dup_gram_starts,
               CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
               CAST(SUM(covered) AS BIGINT) AS dup_tokens
        FROM per_island GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.l) AS BIGINT) AS n_tokens,
           COALESCE(p.dup_gram_starts, 0) AS dup_gram_starts,
           COALESCE(p.n_dup_spans, 0) AS n_dup_spans,
           COALESCE(p.dup_tokens, 0) AS dup_tokens,
           ROUND(COALESCE(p.dup_tokens, 0) /
                 GREATEST(len(t.l), 1), 6) AS dup_ratio
    FROM toks t LEFT JOIN per_doc p USING (doc_id)
    WHERE t.doc_id % 3 = 0
"""


@query("incremental_substring_dedup", INCR_SUBSTR_ORACLE)
def q_incremental_substring_dedup(spark, sf_dir):
    """Steady-state offset-robust substring dedup — the third member
    of the incremental family (incremental_dedup = whole-document
    fingerprints, incremental_minhash_dedup = near-dup signatures,
    this = exact substrings): an arriving batch (doc_id %% 3 == 0)
    reports how much of each document is covered by {SUBSTR_GRAM}-word
    windows that already exist in the historical corpus (%% 3 != 0),
    WITHOUT re-pairing history against itself. The store reduces to
    its DISTINCT gram set — at 100 TB the persisted anchor-gram index,
    bucketed by gram, that history never re-shuffles per batch — and
    one left-semi join marks covered batch anchors; spans coalesce
    exactly as in substring_dedup_spans."""
    from funding_monitoring_spark.operators.dedup import (
        incremental_duplicated_spans,
    )

    docs = load_table(spark, sf_dir, "documents")
    return incremental_duplicated_spans(
        docs.filter(F.col("doc_id") % 3 == 0),
        docs.filter(F.col("doc_id") % 3 != 0),
        id_col="doc_id",
        text_col="text",
        min_gram=SUBSTR_GRAM,
    )


# -- KMV dataset-overlap report ------------------------------------------

from funding_monitoring_spark.operators.dedup import (
    POLY_MOD as _KMV_M,
)
from funding_monitoring_spark.operators.dedup import (
    shingle_fingerprints,
)
from funding_monitoring_spark.operators.sampling import (
    hash_threshold,
    oracle_hash_expr,
    train_test_split,
)
from funding_monitoring_spark.operators.sketches import (
    kmv_distinct_estimate,
    kmv_min_k,
)

#: same split as sampling_suite's train_test_split_stats (seed 7,
#: 80/20) so the overlap report reads on the split users actually ship
_KMV_SEED = 7
_KMV_FRAC = 0.8
_KMV_K = 256
_KMV_NUM = (_KMV_K - 1) * _KMV_M  # < 2^53: exact as a double literal


def _sql_kmv_est(kset: str) -> str:
    """DuckDB twin of sketches.kmv_distinct_estimate over a named
    min-k CTE: exact size while not full, else (k-1)*M / h_k."""
    return f"""
        CASE WHEN (SELECT COUNT(*) FROM {kset}) < {_KMV_K}
             THEN CAST((SELECT COUNT(*) FROM {kset}) AS DOUBLE)
             ELSE CAST({_KMV_NUM} AS DOUBLE)
                  / (SELECT MAX(f) FROM {kset})
        END
    """


_KMV_H = oracle_hash_expr("doc_id", _KMV_SEED)

DATASET_OVERLAP_KMV_ORACLE = f"""
    WITH tagged AS (
        SELECT CASE WHEN {_KMV_H} < {hash_threshold(_KMV_FRAC)}
                    THEN 'train' ELSE 'test' END AS split,
               text
        FROM documents
    ),
    fps AS (
        SELECT DISTINCT split, f
        FROM (SELECT split, unnest({_FPS}) AS f FROM tagged)
    ),
    ka AS (SELECT f FROM fps WHERE split = 'train'
           ORDER BY f LIMIT {_KMV_K}),
    kb AS (SELECT f FROM fps WHERE split = 'test'
           ORDER BY f LIMIT {_KMV_K}),
    ku AS (SELECT f FROM (SELECT f FROM ka UNION SELECT f FROM kb) u
           ORDER BY f LIMIT {_KMV_K}),
    scal AS (
        SELECT
            (SELECT COUNT(*) FROM fps WHERE split = 'train')
                AS exact_train,
            (SELECT COUNT(*) FROM fps WHERE split = 'test')
                AS exact_test,
            (SELECT COUNT(*) FROM (
                SELECT f FROM fps GROUP BY f
                HAVING COUNT(DISTINCT split) = 2)) AS exact_inter,
            (SELECT COUNT(*) FROM ku
             WHERE f IN (SELECT f FROM ka)
               AND f IN (SELECT f FROM kb)) AS rho_n,
            ROUND({_sql_kmv_est("ka")}, 4) AS est_train,
            ROUND({_sql_kmv_est("kb")}, 4) AS est_test,
            ROUND({_sql_kmv_est("ku")}, 4) AS est_union,
            CASE WHEN (SELECT COUNT(*) FROM ku) < {_KMV_K}
                 THEN CAST((SELECT COUNT(*) FROM (
                     SELECT f FROM fps GROUP BY f
                     HAVING COUNT(DISTINCT split) = 2)) AS DOUBLE)
                 ELSE ROUND(
                     (CAST((SELECT COUNT(*) FROM ku
                            WHERE f IN (SELECT f FROM ka)
                              AND f IN (SELECT f FROM kb)) AS DOUBLE)
                      / {float(_KMV_K)})
                     * (CAST({_KMV_NUM} AS DOUBLE)
                        / (SELECT MAX(f) FROM ku)), 4)
            END AS est_inter
    )
    SELECT CAST({_KMV_K} AS BIGINT) AS k,
           CAST(exact_train AS BIGINT) AS exact_train,
           CAST(exact_test AS BIGINT) AS exact_test,
           CAST(exact_inter AS BIGINT) AS exact_inter,
           est_train, est_test, est_union, est_inter,
           ROUND(CAST(rho_n AS DOUBLE) / {float(_KMV_K)}, 4)
               AS jaccard_est,
           ROUND(CAST(exact_inter AS DOUBLE)
                 / (exact_train + exact_test - exact_inter), 4)
               AS jaccard_exact,
           CASE WHEN exact_inter > 0
                THEN ROUND(ABS(est_inter - exact_inter)
                           / exact_inter, 4)
           END AS rel_err_inter
    FROM scal
"""


@query("dataset_overlap_kmv", DATASET_OVERLAP_KMV_ORACLE)
def q_dataset_overlap_kmv(spark, sf_dir):
    """Train/eval shingle-set overlap from KMV min-k sketches
    (operators/sketches.py kmv_min_k): HLL unions but cannot
    intersect; the k smallest distinct fingerprints per side support
    union, intersection, and Jaccard estimates from 2*k values total —
    the 100 TB contamination-screening tool, where the exact
    distinct-intersection groupBy (test_set_contamination above) is
    the cost ceiling. The report carries BOTH the estimates and the
    exact counts, so the sketch's error is an oracle-tracked number
    (same discipline as the ANN recall reports); a sketch-only
    deployment drops the exact columns and the full-fingerprint
    shuffle with them. Estimates are single IEEE divisions over exact
    integers — recomputed bit-for-bit by the DuckDB twin."""
    from funding_monitoring_spark.operators.cachescope import (
        scoped_persist,
    )

    docs = load_table(spark, sf_dir, "documents")
    tagged = train_test_split(docs, "doc_id", _KMV_FRAC, _KMV_SEED)
    # the fingerprint ARRAYS are persisted pre-explode: the gram
    # stream feeds both the KMV sketch build and the exact-count
    # aggregate, and without the cache the tokenize+hash shingle fold
    # (the expensive pass) would run twice (guide §2.4/§5); each
    # consumer re-explodes map-side from the cached arrays, which at
    # any scale is cheaper than caching the exploded stream itself
    arrs_persisted = scoped_persist(
        tagged.select(
            "split", shingle_fingerprints(F.col("text")).alias("_fa")
        )
    )
    fps = arrs_persisted.select(
        "split", F.explode("_fa").alias("f")
    )
    sketches = kmv_min_k(
        fps, F.col("f"), F.col("split"), k=_KMV_K
    )
    arrs = sketches.groupBy().agg(
        F.first(
            F.when(F.col("g") == "train", F.col("kmv")),
            ignorenulls=True,
        ).alias("ka"),
        F.first(
            F.when(F.col("g") == "test", F.col("kmv")),
            ignorenulls=True,
        ).alias("kb"),
    )
    flags = fps.groupBy("f").agg(
        F.max(
            F.when(F.col("split") == "train", 1).otherwise(0)
        ).alias("in_tr"),
        F.max(
            F.when(F.col("split") == "test", 1).otherwise(0)
        ).alias("in_te"),
    )
    exact = flags.agg(
        F.sum("in_tr").alias("exact_train"),
        F.sum("in_te").alias("exact_test"),
        F.sum(F.col("in_tr") * F.col("in_te")).alias("exact_inter"),
    )
    ku = F.slice(
        F.array_sort(
            F.array_distinct(F.concat(F.col("ka"), F.col("kb")))
        ),
        1,
        _KMV_K,
    )
    combined = (
        exact.crossJoin(F.broadcast(arrs))
        .withColumn("ku", ku)
        .withColumn(
            "rho_n",
            F.size(
                F.filter(
                    F.col("ku"),
                    lambda v: F.array_contains(F.col("ka"), v)
                    & F.array_contains(F.col("kb"), v),
                )
            ),
        )
        .withColumn(
            "est_inter",
            F.when(
                F.size(F.col("ku")) < _KMV_K,
                F.col("exact_inter").cast("double"),
            ).otherwise(
                F.round(
                    (
                        F.col("rho_n").cast("double")
                        / F.lit(float(_KMV_K))
                    )
                    * (
                        F.lit(float(_KMV_NUM))
                        / F.element_at(F.col("ku"), _KMV_K)
                    ),
                    4,
                )
            ),
        )
    )
    return combined.select(
        F.lit(_KMV_K).cast("bigint").alias("k"),
        "exact_train",
        "exact_test",
        "exact_inter",
        F.round(
            kmv_distinct_estimate(F.col("ka"), _KMV_M, _KMV_K), 4
        ).alias("est_train"),
        F.round(
            kmv_distinct_estimate(F.col("kb"), _KMV_M, _KMV_K), 4
        ).alias("est_test"),
        F.round(
            kmv_distinct_estimate(F.col("ku"), _KMV_M, _KMV_K), 4
        ).alias("est_union"),
        "est_inter",
        F.round(
            F.col("rho_n").cast("double") / F.lit(float(_KMV_K)), 4
        ).alias("jaccard_est"),
        F.round(
            F.col("exact_inter").cast("double")
            / (
                F.col("exact_train")
                + F.col("exact_test")
                - F.col("exact_inter")
            ),
            4,
        ).alias("jaccard_exact"),
        F.when(
            F.col("exact_inter") > 0,
            F.round(
                F.abs(F.col("est_inter") - F.col("exact_inter"))
                / F.col("exact_inter"),
                4,
            ),
        ).alias("rel_err_inter"),
    )


# -- pairwise decontamination: exact containment join ----------------------

#: planted-leak eval set: a 20-token excerpt (tokens 11..30) of every
#: sieved document — each excerpt is fully contained in its source
#: (ground-truth containment 1.0) plus any near-duplicates of it
CONTAIN_EXCERPT_START = 11
CONTAIN_EXCERPT_LEN = 20
#: containment threshold 3/5, evaluated in INTEGER arithmetic on both
#: engines (IEEE ceil(0.6*5) = 4 is the boundary flip to avoid)
CONTAIN_T_NUM = 3
CONTAIN_T_DEN = 5

_CONTAIN_EXCERPT_SQL = (
    f"array_to_string(list_slice(regexp_extract_all(text, '\\S+'), "
    f"{CONTAIN_EXCERPT_START}, "
    f"{CONTAIN_EXCERPT_START + CONTAIN_EXCERPT_LEN - 1}), ' ')"
)


@query(
    "contamination_containment_pairs",
    f"""
    WITH ev AS MATERIALIZED (
        SELECT doc_id AS test_id, {_CONTAIN_EXCERPT_SQL} AS text
        FROM documents WHERE doc_id % {EVAL_MOD} = 0
    ),
    eg AS (SELECT test_id, unnest({_FPS}) AS gram FROM ev),
    tg AS (SELECT doc_id AS train_id, unnest({_FPS}) AS gram
           FROM documents),
    en AS (SELECT test_id, COUNT(*) AS n_test_grams
           FROM eg GROUP BY 1),
    inter AS (
        SELECT train_id, test_id, COUNT(*) AS n_shared
        FROM tg JOIN eg USING (gram) GROUP BY 1, 2
    )
    SELECT train_id, test_id, n_shared, n_test_grams,
           ROUND(n_shared / CAST(n_test_grams AS DOUBLE), 6)
               AS containment
    FROM inter JOIN en USING (test_id)
    WHERE n_shared * {CONTAIN_T_DEN} >= {CONTAIN_T_NUM} * n_test_grams
    """,
)
def q_contamination_containment_pairs(spark, sf_dir):
    """WHICH eval document leaked into which training document:
    operators/corpus.containment_join finds every (train, test) pair
    whose shingle containment |G_train ∩ G_test| / |G_test| >= 3/5,
    over a planted-leak eval set (a 20-token excerpt of every sieved
    doc, so each excerpt's source is ground truth at containment
    1.0). Candidates come from the test-side PREFIX against the
    train-side inverted index (asymmetric prefix filtering — exact by
    pigeonhole under any fixed gram order), so the result is
    IDENTICAL to the oracle's brute-force pair join; the shuffle key
    is an int64 gram, never a pair, and the quadratic stop-shingle
    failure mode fails loudly via max_pairs_per_gram. The threshold
    compares in integer arithmetic on both engines."""
    from funding_monitoring_spark.operators.corpus import (
        containment_join,
    )
    from funding_monitoring_spark.operators.textstats import tokens

    docs = load_table(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % EVAL_MOD == 0).select(
        F.col("doc_id").alias("test_id"),
        F.array_join(
            F.slice(
                tokens("text"),
                CONTAIN_EXCERPT_START,
                CONTAIN_EXCERPT_LEN,
            ),
            " ",
        ).alias("text"),
    )
    tr = docs.select(F.col("doc_id").alias("train_id"), "text")
    return containment_join(
        tr, ev, CONTAIN_T_NUM, CONTAIN_T_DEN
    )


# -- BM25 ranked retrieval (operators/corpus.bm25_topk) --------------------

#: deterministic query bag: the terms ranked 10..14 by (df DESC, term)
#: — mid-frequency terms, so the ranking has real discrimination
#: (the top handful of stopword-ish terms match every document)
BM25_QUERY_RANKS = (10, 14)
BM25_TOPK = 20

_BM25_QUERY_TERMS_SQL = f"""
    SELECT term FROM (
        SELECT term,
               ROW_NUMBER() OVER (ORDER BY df DESC, term) AS r
        FROM (
            SELECT term, COUNT(*) AS df FROM (
                SELECT DISTINCT doc_id, unnest({_TOKS}) AS term
                FROM documents
            ) GROUP BY 1
        )
    ) WHERE r BETWEEN {BM25_QUERY_RANKS[0]} AND {BM25_QUERY_RANKS[1]}
"""


@query(
    "bm25_topk_retrieval",
    f"""
    WITH q AS MATERIALIZED ({_BM25_QUERY_TERMS_SQL}),
    toks AS MATERIALIZED (
        SELECT doc_id, unnest({_TOKS}) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf
           FROM toks GROUP BY 1, 2),
    dfr AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
    stats AS (SELECT COUNT(*) AS n_docs,
                     CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
              FROM dl),
    hits AS (
        SELECT tf.doc_id,
               ROUND(
                   ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                   * tf * ({C.BM25_K1} + 1.0)
                   / (tf + {C.BM25_K1}
                      * (1.0 - {C.BM25_B}
                         + {C.BM25_B} * dl / avgdl)),
                   9) AS term_score
        FROM tf
        JOIN q USING (term)
        JOIN dfr USING (term)
        JOIN dl USING (doc_id)
        CROSS JOIN stats
    ),
    scored AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_hit_terms,
               ROUND(SUM(term_score), 6) AS score
        FROM hits GROUP BY 1
    )
    SELECT CAST(ROW_NUMBER() OVER
                (ORDER BY score DESC, doc_id) AS INT) AS rank,
           doc_id, n_hit_terms, score
    FROM scored
    ORDER BY score DESC, doc_id LIMIT {BM25_TOPK}
    """,
)
def q_bm25_topk_retrieval(spark, sf_dir):
    """BM25 top-20 for a deterministic mid-frequency query bag (terms
    ranked 10..14 by document frequency): the retrieval primitive on
    top of the inverted-index machinery — retrieval-based dedup and
    eval-leak lookup are ranked-search problems. Query terms and all
    corpus statistics broadcast; the corpus side is one (doc, term)
    aggregation and a bounded TakeOrderedAndProject top-k (no full
    sort). Per-term scores round at 9 digits before the per-doc sum
    so cross-engine summation orders re-synchronize; idf is the
    non-negative ln(1 + ...) flavor; ties rank by doc_id."""
    from funding_monitoring_spark.operators.corpus import bm25_topk
    from funding_monitoring_spark.operators.textstats import tokens
    from funding_monitoring_spark.operators.topk import (
        top_k_per_group,
    )

    docs = load_table(spark, sf_dir, "documents")
    dfr = (
        docs.select(
            "doc_id",
            F.explode(F.array_distinct(tokens("text"))).alias(
                "term"
            ),
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    qterms = (
        top_k_per_group(
            dfr,
            [],
            [F.col("df").desc(), F.col("term")],
            BM25_QUERY_RANKS[1],
        )
        .filter(F.col("rank") >= BM25_QUERY_RANKS[0])
        .select("term")
    )
    return bm25_topk(docs, qterms, BM25_TOPK).withColumn(
        "rank", F.col("rank").cast("int")
    )
