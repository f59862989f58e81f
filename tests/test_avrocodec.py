"""Avro OCF codec tests (operators/avrocodec.py): zigzag edges,
both codecs, union nulls, block framing, and loud refusals."""

import pytest

from funding_monitoring_spark.operators.avrocodec import (
    decode_avro,
    encode_avro,
)

_SCHEMA = {
    "type": "record",
    "name": "doc",
    "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "text", "type": "string"},
        {"name": "score", "type": "double"},
        {"name": "keep", "type": "boolean"},
        {"name": "lang", "type": ["null", "string"]},
    ],
}


def _recs(n):
    return [
        {
            "doc_id": i,
            "text": f"t{i}" * (i % 9),
            "score": i / 7.0,
            "keep": i % 2 == 0,
            "lang": None if i % 3 == 0 else f"l{i % 5}",
        }
        for i in range(n)
    ]


@pytest.mark.parametrize("codec", ["null", "deflate"])
@pytest.mark.parametrize("n,block", [(0, 10), (1, 10), (257, 50),
                                     (100, 100), (101, 100)])
def test_roundtrip(codec, n, block):
    recs = _recs(n)
    schema, back = decode_avro(
        encode_avro(_SCHEMA, recs, codec=codec, block_size=block)
    )
    assert schema == _SCHEMA and back == recs


def test_zigzag_long_edges():
    recs = [
        {"doc_id": v, "text": "", "score": 0.0, "keep": False,
         "lang": None}
        for v in (0, -1, 1, 63, -64, 2**62, -(2**62), 2**63 - 1,
                  -(2**63))
    ]
    assert decode_avro(encode_avro(_SCHEMA, recs))[1] == recs


def test_unicode_strings_roundtrip():
    recs = [{"doc_id": 0, "text": "héllo — wörld ✓", "score": 1.5,
             "keep": True, "lang": "ünïcode"}]
    assert decode_avro(encode_avro(_SCHEMA, recs))[1] == recs


def test_refusals_are_loud():
    with pytest.raises(NotImplementedError):
        encode_avro({"type": "array"}, [])
    with pytest.raises(NotImplementedError):
        encode_avro(
            {"type": "record", "name": "x",
             "fields": [{"name": "m", "type": {"type": "map"}}]},
            [],
        )
    with pytest.raises(NotImplementedError):
        encode_avro(_SCHEMA, [], codec="zstandard")  # snappy now decodes
    with pytest.raises(ValueError):
        decode_avro(b"NotAvroAtAll")
    good = encode_avro(_SCHEMA, _recs(5))
    doctored = bytearray(good)
    doctored[-1] ^= 0xFF  # corrupt the trailing sync marker
    with pytest.raises(ValueError):
        decode_avro(bytes(doctored))
    with pytest.raises(ValueError):
        decode_avro(good[:-8])  # truncated block


def test_unknown_codec_in_file_refuses():
    good = bytearray(encode_avro(_SCHEMA, _recs(3)))
    # rewrite the metadata codec value 'null' -> 'xxxx'
    at = bytes(good).index(b"null", 4)
    good[at : at + 4] = b"xxxx"
    with pytest.raises(NotImplementedError):
        decode_avro(bytes(good))


def test_array_and_map_fields_roundtrip():
    """Arrays and maps of primitives use real Avro block framing;
    the negative-count (size-prefixed) block form also reads."""
    schema = {
        "type": "record", "name": "doc",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "tags", "type": {"type": "array",
                                      "items": "string"}},
            {"name": "scores", "type": {"type": "map",
                                        "values": "double"}},
        ],
    }
    recs = [
        {"id": 1, "tags": ["a", "b", "c"], "scores": {"x": 1.5}},
        {"id": 2, "tags": [], "scores": {}},
        {"id": 3, "tags": ["z"], "scores": {"p": -0.25, "q": 8.0}},
    ]
    for codec in ("null", "deflate"):
        got_schema, got = decode_avro(
            encode_avro(schema, recs, codec=codec)
        )
        assert got == recs
    # negative-count block form: [-2, byte_size, "a", "b", 0]
    from funding_monitoring_spark.operators.avrocodec import (
        _field_reader,
        _zigzag_encode,
    )

    items = b"\x02a\x02b"  # two 1-char strings
    framed = (
        _zigzag_encode(-2) + _zigzag_encode(len(items)) + items
        + _zigzag_encode(0)
    )
    rd = _field_reader({"type": "array", "items": "string"})
    got, pos = rd(framed, 0)
    assert got == ["a", "b"] and pos == len(framed)


def test_truncated_header_and_negative_block_count_are_loud():
    good = encode_avro(_SCHEMA, _recs(4))
    # chop inside the metadata map: the schema value length now runs
    # past the end -> loud header truncation, not a silent short read
    at = good.index(b"avro.schema")
    with pytest.raises(ValueError, match="header truncated"):
        decode_avro(good[: at + 20])
    # a reference to an UNDEFINED name refuses (defined names now
    # resolve — see test_named_type_references_resolve)
    with pytest.raises(NotImplementedError, match="does not name"):
        encode_avro(
            {"type": "record", "name": "x", "fields": [
                {"name": "r", "type": "y"}]},
            [],
        )


def test_snappy_codec_roundtrip_and_crc():
    """Avro's snappy codec (raw snappy + big-endian CRC32 of the
    uncompressed block) round-trips through the pure-Python snappy
    pair; a corrupted block fails the CRC loudly."""
    recs = _recs(7)
    payload = encode_avro(_SCHEMA, recs, codec="snappy")
    schema, got = decode_avro(payload)
    assert got == recs
    # flip one byte INSIDE a data block (past the header/sync)
    doctored = bytearray(payload)
    at = len(payload) - 30
    doctored[at] ^= 0x01
    with pytest.raises(ValueError):
        decode_avro(bytes(doctored))


def test_nested_record_enum_fixed_bytes_roundtrip():
    """The r12 widened profile: record-in-record (two deep, composed
    with an array and a null union), enum symbol indices, fixed sized
    reads and length-prefixed bytes all round-trip."""
    schema = {
        "type": "record",
        "name": "envelope",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "kind", "type": {
                "type": "enum", "name": "kind_t",
                "symbols": ["alpha", "beta", "gamma"]}},
            {"name": "sig", "type": {
                "type": "fixed", "name": "sig_t", "size": 4}},
            {"name": "blob", "type": "bytes"},
            {"name": "inner", "type": {
                "type": "record", "name": "inner_t",
                "fields": [
                    {"name": "score", "type": "double"},
                    {"name": "tags", "type": {
                        "type": "array", "items": "string"}},
                    {"name": "deep", "type": {
                        "type": "record", "name": "deep_t",
                        "fields": [
                            {"name": "note",
                             "type": ["null", "string"]}]}},
                ]}},
        ],
    }
    recs = [
        {"id": 1, "kind": "beta", "sig": b"\x01\x02\x03\x04",
         "blob": b"", "inner": {"score": 0.5, "tags": ["a", "b"],
                                "deep": {"note": "hi"}}},
        {"id": 2, "kind": "alpha", "sig": b"\xff\x00\xff\x00",
         "blob": b"payload", "inner": {"score": -1.25, "tags": [],
                                       "deep": {"note": None}}},
    ]
    for codec in ("null", "deflate", "snappy"):
        _, got = decode_avro(encode_avro(schema, recs, codec=codec))
        assert got == recs


def test_enum_and_fixed_validation_is_loud():
    enum_schema = {
        "type": "record", "name": "e", "fields": [
            {"name": "k", "type": {"type": "enum", "name": "k_t",
                                   "symbols": ["x", "y"]}}]}
    with pytest.raises(ValueError, match="enum"):
        encode_avro(enum_schema, [{"k": "zzz"}])
    # out-of-range index on read
    good = encode_avro(enum_schema, [{"k": "y"}])
    from funding_monitoring_spark.operators.avrocodec import (
        _zigzag_encode,
    )

    bad_index = _zigzag_encode(7)
    doctored = good.replace(_zigzag_encode(1) + bytes(range(16)),
                            bad_index + bytes(range(16)), 1)
    with pytest.raises(ValueError, match="enum index"):
        decode_avro(doctored)
    fixed_schema = {
        "type": "record", "name": "f", "fields": [
            {"name": "s", "type": {"type": "fixed", "name": "s_t",
                                   "size": 3}}]}
    with pytest.raises(ValueError, match="fixed"):
        encode_avro(fixed_schema, [{"s": b"toolong"}])


def test_named_type_references_resolve():
    """Real schemas reuse named types: a record/enum/fixed defined
    once is referenced by NAME later (ADVICE/VERDICT r12 item 5).
    The reference must reuse the registered definition — including
    through the dotted fullname — and roundtrip byte-exactly."""
    point = {
        "type": "record",
        "name": "Point",
        "namespace": "geo",
        "fields": [
            {"name": "x", "type": "double"},
            {"name": "y", "type": "double"},
        ],
    }
    color = {"type": "enum", "name": "Color",
             "symbols": ["RED", "GREEN"]}
    schema = {
        "type": "record",
        "name": "Segment",
        "fields": [
            {"name": "a", "type": point},       # definition
            {"name": "b", "type": "Point"},     # bare-name reference
            {"name": "c", "type": "geo.Point"}, # fullname reference
            {"name": "tint", "type": color},
            {"name": "tint2", "type": "Color"},
            {"name": "pts", "type": {"type": "array",
                                     "items": "Point"}},
        ],
    }
    recs = [
        {
            "a": {"x": 1.0, "y": 2.0},
            "b": {"x": 3.0, "y": 4.0},
            "c": {"x": 5.0, "y": 6.0},
            "tint": "RED",
            "tint2": "GREEN",
            "pts": [{"x": 7.0, "y": 8.0}, {"x": 9.0, "y": 0.5}],
        }
    ]
    payload = encode_avro(schema, recs)
    got_schema, got = decode_avro(payload)
    assert got == recs and got_schema == schema


def test_recursive_named_record_roundtrips():
    """A self-referential record (linked list via [null, Node]) is
    legal Avro; the lazy reference path must terminate at build time
    and follow the finite data at run time."""
    schema = {
        "type": "record",
        "name": "Node",
        "fields": [
            {"name": "v", "type": "long"},
            {"name": "next", "type": ["null", "Node"]},
        ],
    }
    recs = [{"v": 1, "next": {"v": 2, "next": {"v": 3, "next": None}}}]
    payload = encode_avro(schema, recs)
    _, got = decode_avro(payload)
    assert got == recs


def test_undefined_named_reference_refuses_on_read_too():
    """The reader must refuse an undefined reference as loudly as the
    writer (a container written by other tooling can carry one)."""
    import json as _json

    good = encode_avro(
        {"type": "record", "name": "R",
         "fields": [{"name": "v", "type": "long"}]},
        [{"v": 1}],
    )
    # same-length type swap ("long" -> "Ghst") keeps the metadata
    # map's length varint valid
    bad_schema = _json.dumps(
        {"type": "record", "name": "R",
         "fields": [{"name": "v", "type": "Ghst"}]}
    ).encode()
    old = _json.dumps(
        {"type": "record", "name": "R",
         "fields": [{"name": "v", "type": "long"}]}
    ).encode()
    assert old in good and len(bad_schema) == len(old)
    with pytest.raises(NotImplementedError, match="Ghst"):
        decode_avro(good.replace(old, bad_schema))
