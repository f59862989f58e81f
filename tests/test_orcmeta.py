"""Pure protobuf/snappy ORC footer parser (operators/orcmeta.py):
hand-built snappy vectors pin the decoder semantics, Spark's own ORC
reader cross-validates layouts across all three compression kinds,
and malformed tails refuse loudly."""

import glob

import pytest

from funding_monitoring_spark.operators.orcmeta import (
    parse_orc_footer,
    protobuf_message,
    snappy_decompress,
)


def _uv(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def test_snappy_hand_built_vectors():
    # pure literal: tag (len-1)<<2 | 0
    lit = _uv(5) + bytes([(5 - 1) << 2]) + b"hello"
    assert snappy_decompress(lit) == b"hello"
    # long literal: tag 61<<2 = two extra little-endian length bytes
    data = bytes(range(200)) * 2  # 400 bytes
    long_lit = _uv(400) + bytes([61 << 2]) + (400 - 1).to_bytes(
        2, "little"
    ) + data
    assert snappy_decompress(long_lit) == data
    # copy with 1-byte offset, OVERLAPPING (run-length): emit 'ab',
    # then copy len 6 offset 2 -> 'ابab' pattern 'ababababab'... here:
    # literal 'ab' + copy(len=6, off=2) = 'ab' + 'ababab'
    v = _uv(8) + bytes([(2 - 1) << 2]) + b"ab" + bytes(
        [((6 - 4) << 2) | 1, 2]
    )
    assert snappy_decompress(v) == b"abababab"
    # copy with 2-byte offset
    v = (
        _uv(6)
        + bytes([(3 - 1) << 2])
        + b"xyz"
        + bytes([((3 - 1) << 2) | 2])
        + (3).to_bytes(2, "little")
    )
    assert snappy_decompress(v) == b"xyzxyz"
    # declared length mismatch refuses
    with pytest.raises(ValueError, match="promised"):
        snappy_decompress(_uv(9) + bytes([(5 - 1) << 2]) + b"hello")
    # offset past output refuses
    with pytest.raises(ValueError, match="offset"):
        snappy_decompress(
            _uv(6) + bytes([(2 - 1) << 2]) + b"ab"
            + bytes([((4 - 4) << 2) | 1, 9])
        )


def test_protobuf_generic_and_packed():
    # field 1 varint 150; field 2 bytes "abc"; field 3 packed varints
    msg = (
        bytes([1 << 3 | 0]) + _uv(150)
        + bytes([2 << 3 | 2]) + _uv(3) + b"abc"
        + bytes([3 << 3 | 2]) + _uv(3) + _uv(1) + _uv(200) + b""
    )
    # 200 needs 2 varint bytes: fix the packed blob length
    packed = _uv(1) + _uv(200)
    msg = (
        bytes([1 << 3 | 0]) + _uv(150)
        + bytes([2 << 3 | 2]) + _uv(3) + b"abc"
        + bytes([3 << 3 | 2]) + _uv(len(packed)) + packed
    )
    got = protobuf_message(msg)
    assert got[1] == [150]
    assert got[2] == [b"abc"]
    from funding_monitoring_spark.operators.orcmeta import _uint_list

    assert _uint_list(got, 3) == [1, 200]


@pytest.mark.parametrize("codec", ["snappy", "zlib", "none"])
def test_orc_footer_matches_spark(spark, tmp_path, codec):
    df = spark.range(0, 5000).selectExpr(
        "id AS event_id",
        "CAST(id % 7 AS STRING) AS event_type",
        "id % 50 AS user_id",
        "CAST(id AS DOUBLE) / 3 AS value",
    )
    path = str(tmp_path / f"ev_{codec}")
    df.repartition(2).write.option("compression", codec).orc(path)
    files = sorted(glob.glob(path + "/*.orc"))
    assert len(files) == 2
    total = 0
    for f in files:
        info = parse_orc_footer(open(f, "rb").read())
        total += info["num_rows"]
        assert info["compression"] == {
            "snappy": "SNAPPY", "zlib": "ZLIB", "none": "NONE"
        }[codec]
        assert [c["name"] for c in info["columns"]] == [
            "event_id", "event_type", "user_id", "value"
        ]
        assert [c["kind"] for c in info["columns"]] == [
            "LONG", "STRING", "LONG", "DOUBLE"
        ]
        assert sum(s["num_rows"] for s in info["stripes"]) == (
            info["num_rows"]
        )
    assert total == 5000
    # Spark's own reader agrees
    assert spark.read.orc(path).count() == 5000

    # tail-slice contract: postscript readable but footer truncated
    payload = open(files[0], "rb").read()
    ps_len = payload[-1]
    with pytest.raises(ValueError, match="longer tail"):
        parse_orc_footer(payload[-(ps_len + 3):])
    with pytest.raises(ValueError):
        parse_orc_footer(b"PAR1 not orc\x05")  # junk tail: loud, any msg
    with pytest.raises(ValueError, match="magic"):
        # structurally valid postscript bytes but wrong magic: a
        # 1-field protobuf ("ORD") parses, the magic check refuses
        bad_ps = bytes([8000 << 3 | 2]) if False else None
        import struct as _s
        field_key = (8000 << 3) | 2
        key_bytes = bytearray()
        k = field_key
        while True:
            b = k & 0x7F
            k >>= 7
            if k:
                key_bytes.append(b | 0x80)
            else:
                key_bytes.append(b)
                break
        ps = bytes(key_bytes) + bytes([3]) + b"ORD"
        parse_orc_footer(ps + bytes([len(ps)]))
