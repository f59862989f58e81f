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
