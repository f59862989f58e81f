"""funding_monitoring_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query/data-processing surface of the
reference pipeline ``cryptoTradingBotRicoSern/funding-monitoring`` (an
Airflow + pandas + Postgres crypto-market monitor), rebuilt Spark-first:

- DataFrame/SQL declarative plans (Catalyst optimizes; no hand scheduling)
- Structured Streaming micro-batches replacing the 5-minute Airflow tick
- join-based upsert sinks replacing Postgres ``ON CONFLICT DO UPDATE``
- one window/groupBy expression replacing the reference's per-symbol loops

plus large-scale training-data-pipeline extensions (dedup, similarity
search, text analysis, multimodal plumbing) designed for 100 TB scale.

Layout:
    session.py    SparkSession factory (UTC, AQE, Arrow)
    schemas.py    explicit StructTypes for reference + fixture tables
    sources/      parquet/json readers with schema enforcement
    functions/    scalar function library (built-in-first, no row UDFs)
    operators/    reusable relational operators (rolling stats, top-k,
                  dedup family, similarity search, text analysis, upsert)
    pipeline/     the reference pipeline re-expressed (funding stats, ...)
    streaming/    Structured Streaming layer (triggers, watermark dedup,
                  foreachBatch upsert writer)
    plans/        plan inspection helpers (explain, shuffle audit)
"""

__version__ = "0.1.0"
