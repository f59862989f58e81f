"""K3-K6 sink/DDL coverage: tab-sep CSV roundtrip, snapshot overwrite,
temp-view registry + spark.sql over it."""

from __future__ import annotations

from pyspark.sql import functions as F

from funding_monitoring_spark.sources.sinks import (
    overwrite_parquet,
    read_tsv,
    write_tsv,
)
from funding_monitoring_spark.sources.tables import (
    load_table,
    register_temp_views,
)


def test_tsv_roundtrip(spark, sf_dir, tmp_path):
    """K5: tab-separated headerless CSV write + schema-aware read back
    reproduces the frame exactly."""
    region = load_table(spark, sf_dir, "region").select(
        "r_regionkey", "r_name"
    )
    path = str(tmp_path / "region_tsv")
    write_tsv(region, path)
    back = read_tsv(spark, path, region.schema)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, region.collect())
    )


def test_overwrite_parquet_snapshot_replace(spark, sf_dir, tmp_path):
    """K3/K4: a second overwrite fully replaces the first snapshot."""
    path = str(tmp_path / "snap")
    nation = load_table(spark, sf_dir, "nation")
    overwrite_parquet(nation.filter(F.col("n_regionkey") == 0), path)
    first = spark.read.parquet(path).count()
    overwrite_parquet(nation, path)
    assert spark.read.parquet(path).count() == nation.count() != first


def test_register_temp_views_and_sql(spark, sf_dir):
    """K6: idempotent registry; spark.sql can join the views."""
    register_temp_views(spark, sf_dir)
    register_temp_views(spark, sf_dir)  # idempotent
    got = spark.sql(
        """
        SELECT r.r_name, COUNT(*) AS n
        FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        """
    ).collect()
    assert sum(r.n for r in got) == 25


# -- DB-API upsert sink (sources/dbsink.py) --------------------------------


def _sqlite_factory(path):
    import functools
    import sqlite3

    return functools.partial(sqlite3.connect, path, timeout=30)


def test_dbapi_upsert_end_to_end_lww(spark, tmp_path):
    """The relational K1/K2 transport against a REAL database (stdlib
    sqlite3 speaks the reference's exact ON CONFLICT DO UPDATE
    dialect): insert, then re-upsert changed values — last write wins
    on the PK, untouched keys survive, written from executor-side
    partitions."""
    import sqlite3

    from funding_monitoring_spark.operators.upsert import dedupe_batch
    from funding_monitoring_spark.sources.dbsink import upsert_via_dbapi

    db = str(tmp_path / "sink.db")
    with sqlite3.connect(db) as conn:
        conn.execute(
            "CREATE TABLE rates (symbol TEXT, ts INTEGER, rate REAL, "
            "PRIMARY KEY (symbol, ts))"
        )
    factory = _sqlite_factory(db)

    b1 = spark.createDataFrame(
        [("BTC", 1, 0.01), ("BTC", 2, 0.02), ("ETH", 1, 0.03)],
        "symbol string, ts long, rate double",
    ).coalesce(2)
    upsert_via_dbapi(b1, "rates", ["symbol", "ts"], factory)
    # revision batch with an in-batch duplicate: dedupe first (the
    # order-aware contract), then upsert — (BTC, 2) revised, new key
    b2 = spark.createDataFrame(
        [("BTC", 2, 0.05), ("BTC", 2, 0.04), ("SOL", 1, 0.09)],
        "symbol string, ts long, rate double",
    )
    b2 = dedupe_batch(b2, ["symbol", "ts"], ["rate"])
    upsert_via_dbapi(b2.coalesce(1), "rates", ["symbol", "ts"], factory)

    with sqlite3.connect(db) as conn:
        got = dict(
            ((s, t), r)
            for s, t, r in conn.execute(
                "SELECT symbol, ts, rate FROM rates"
            )
        )
    assert got == {
        ("BTC", 1): 0.01,
        ("BTC", 2): 0.05,
        ("ETH", 1): 0.03,
        ("SOL", 1): 0.09,
    }


def test_dbapi_upsert_statement_shape_and_guards():
    import pytest as _pytest

    from funding_monitoring_spark.sources.dbsink import upsert_statement

    sql = upsert_statement("rates", ["symbol", "ts", "rate"], ["symbol", "ts"])
    assert sql == (
        "INSERT INTO rates (symbol, ts, rate) VALUES (?, ?, ?) "
        "ON CONFLICT (symbol, ts) DO UPDATE SET rate = excluded.rate"
    )
    with _pytest.raises(ValueError, match="unsafe"):
        upsert_statement("rates; DROP TABLE x", ["a"], ["a"])
    with _pytest.raises(ValueError, match="non-key"):
        upsert_statement("rates", ["a"], ["a"])
    # key_cols are interpolated into ON CONFLICT too: validated the
    # same way, and must be a subset of the inserted columns
    with _pytest.raises(ValueError, match="unsafe"):
        upsert_statement("rates", ["a", "b"], ["a) DO NOTHING; --"])
    with _pytest.raises(ValueError, match="subset"):
        upsert_statement("rates", ["a", "b"], ["missing"])


def test_compaction_reduces_files_atomically(spark, tmp_path):
    """The micro-batch small-files problem and its maintenance fix:
    a fragmented store compacts to the target file count, survives
    re-reads with identical contents, and the store path stays valid
    throughout (atomic swap, not delete-then-write)."""
    from funding_monitoring_spark.sources.sinks import (
        compact_parquet_store,
    )

    store = str(tmp_path / "frag")
    df = spark.range(1000).selectExpr("id", "id * 2 AS v")
    df.repartition(24).write.parquet(store)
    before, after = compact_parquet_store(spark, store, target_files=2)
    assert before >= 24 and after == 2
    back = spark.read.parquet(store)
    assert back.count() == 1000
    assert back.selectExpr("sum(v)").first()[0] == 999 * 1000


def test_schema_evolution_merged_read(spark, tmp_path):
    """Additive schema evolution across write generations: an old
    batch lacking a column reads as NULL under mergeSchema, values
    keep their types, and the union row count is exact — the contract
    a long-lived store depends on when a producer adds a field."""
    store = str(tmp_path / "evolving")
    spark.range(3).selectExpr("id", "'a' AS source").write.parquet(
        store + "/gen=1"
    )
    spark.range(2).selectExpr(
        "id", "'b' AS source", "id * 1.5 AS score"
    ).write.parquet(store + "/gen=2")
    merged = spark.read.option("mergeSchema", True).parquet(store)
    assert merged.count() == 5
    assert set(merged.columns) >= {"id", "source", "score"}
    nulls = merged.filter("score IS NULL").count()
    assert nulls == 3  # gen=1 rows surface the new column as NULL


def test_dynamic_partition_overwrite_replaces_only_touched(
    spark, tmp_path
):
    """Dynamic partition overwrite — the per-partition replace
    semantics a partitioned lakehouse store depends on: writing a
    batch that touches one partition must replace THAT partition's
    content and leave every other partition intact (static mode would
    truncate the whole table)."""
    store = str(tmp_path / "parts")
    base = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 10), ("c", 100)], "p string, v int"
    )
    base.write.partitionBy("p").parquet(store)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        patch = spark.createDataFrame([("b", 99)], "p string, v int")
        patch.write.mode("overwrite").partitionBy("p").parquet(store)
    finally:
        spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", prev
        )
    got = {
        (r.p, r.v) for r in spark.read.parquet(store).collect()
    }
    assert got == {("a", 1), ("a", 2), ("b", 99), ("c", 100)}
