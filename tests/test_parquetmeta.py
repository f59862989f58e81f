"""Pure Thrift-compact parquet footer parser vs pyarrow's independent
reader (operators/parquetmeta.py): layouts, codecs, multi-row-group
files, tail-slice retry contract, and loud refusals."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from funding_monitoring_spark.operators.parquetmeta import (
    parse_parquet_footer,
)


def _table(n=1000):
    return pa.table(
        {
            "a": pa.array(range(n), pa.int64()),
            "b": pa.array([float(i) / 7 for i in range(n)]),
            "c": pa.array([f"s{i % 13}" for i in range(n)]),
        }
    )


@pytest.mark.parametrize("codec", ["snappy", "none", "zstd"])
def test_footer_matches_pyarrow(tmp_path, codec):
    p = str(tmp_path / f"t_{codec}.parquet")
    pq.write_table(_table(), p, compression=codec,
                   row_group_size=300)
    info = parse_parquet_footer(open(p, "rb").read())
    meta = pq.ParquetFile(p).metadata
    assert info["num_rows"] == meta.num_rows == 1000
    assert len(info["row_groups"]) == meta.num_row_groups == 4
    assert [c["path"] for c in info["columns"]] == ["a", "b", "c"]
    assert [c["type"] for c in info["columns"]] == [
        "INT64", "DOUBLE", "BYTE_ARRAY"
    ]
    want_codec = {"snappy": "SNAPPY", "none": "UNCOMPRESSED",
                  "zstd": "ZSTD"}[codec]
    for gi, rg in enumerate(info["row_groups"]):
        assert rg["num_rows"] == meta.row_group(gi).num_rows
        for cj, col in enumerate(rg["columns"]):
            pa_col = meta.row_group(gi).column(cj)
            assert col["codec"] == want_codec == pa_col.compression
            assert col["num_values"] == pa_col.num_values
            assert col["compressed"] == pa_col.total_compressed_size
            assert (
                col["uncompressed"] == pa_col.total_uncompressed_size
            )
    assert info["created_by"].startswith("parquet-cpp")


def test_footer_tail_slice_and_refusals(tmp_path):
    p = str(tmp_path / "t.parquet")
    pq.write_table(_table(64), p)
    payload = open(p, "rb").read()
    # a tail slice that still holds the whole footer parses
    meta_len = int.from_bytes(payload[-8:-4], "little")
    tail = payload[-(meta_len + 8):]
    assert parse_parquet_footer(tail)["num_rows"] == 64
    # a slice that truncates the footer names the retry contract
    with pytest.raises(ValueError, match="longer tail"):
        parse_parquet_footer(payload[-(meta_len // 2):])
    with pytest.raises(ValueError, match="PAR1"):
        parse_parquet_footer(b"not parquet at all")


def test_footer_nested_schema_paths(tmp_path):
    """Nested structs: leaf paths join with '.' exactly as parquet
    column chunks name them."""
    p = str(tmp_path / "nested.parquet")
    t = pa.table(
        {
            "id": pa.array([1, 2], pa.int64()),
            "s": pa.array(
                [{"x": 1, "y": "a"}, {"x": 2, "y": "b"}],
                pa.struct([("x", pa.int32()), ("y", pa.string())]),
            ),
        }
    )
    pq.write_table(t, p)
    info = parse_parquet_footer(open(p, "rb").read())
    assert [c["path"] for c in info["columns"]] == [
        "id", "s.x", "s.y"
    ]
    rg_paths = [c["path"] for c in info["row_groups"][0]["columns"]]
    assert rg_paths == ["id", "s.x", "s.y"]
