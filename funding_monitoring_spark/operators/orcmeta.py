"""Pure-Python ORC FOOTER parser (protobuf wire format + ORC
compressed-stream framing + a snappy decompressor).

The ORC twin of operators/parquetmeta.py: estate audits over ORC
lakes read the postscript + footer from a file tail — stripe layout,
row counts, schema, compression kind — never the data streams. All
of it is algorithm-defined by public specifications:

- protobuf wire format: ULEB128 varints, field headers
  (field_no << 3 | wire_type), length-delimited submessages — parsed
  GENERICALLY into {field_no: [values]} with no .proto transcription
  (same forward-compatible posture as the Thrift reader).
- ORC file tail: ...[metadata][footer][postscript][1-byte ps length];
  the postscript is NEVER compressed and carries the footer length
  and compression kind; the footer is framed in ORC compression
  chunks (3-byte little-endian header: length << 1 | is_original).
- snappy raw format (the default Spark ORC codec): varint
  uncompressed length, then literal tags and 1/2/4-byte-offset copy
  tags with overlapping-copy semantics — ~50 lines of pure Python,
  enough for footer-sized blocks (data-path decompression would want
  the C codec; an audit never touches the data path).
- ZLIB kind is raw DEFLATE (stdlib zlib, wbits=-15).

Cross-validated against Spark's own ORC reader in
tests/test_orcmeta.py (row counts, stripe layout, schema, all three
compression kinds) and against hand-built snappy vectors."""

from __future__ import annotations

import zlib

__all__ = [
    "parse_orc_footer",
    "protobuf_message",
    "snappy_decompress",
]

_PS_COMPRESSION = {
    0: "NONE", 1: "ZLIB", 2: "SNAPPY", 3: "LZO", 4: "LZ4", 5: "ZSTD",
}

_TYPE_KINDS = {
    0: "BOOLEAN", 1: "BYTE", 2: "SHORT", 3: "INT", 4: "LONG",
    5: "FLOAT", 6: "DOUBLE", 7: "STRING", 8: "BINARY",
    9: "TIMESTAMP", 10: "LIST", 11: "MAP", 12: "STRUCT",
    13: "UNION", 14: "DECIMAL", 15: "DATE", 16: "VARCHAR", 17: "CHAR",
}


def _uvarint(data: bytes, pos: int) -> tuple[int, int]:
    shift = v = 0
    while True:
        if pos >= len(data):
            raise ValueError("protobuf varint truncated")
        b = data[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7
        if shift > 70:
            raise ValueError("protobuf varint too long")


def protobuf_message(data: bytes) -> dict[int, list]:
    """Generic protobuf parse: {field_no: [raw values in order]}.
    Varints stay ints, fixed32/64 stay little-endian ints,
    length-delimited fields stay bytes (the caller knows which are
    submessages/strings/packed lists). Unknown fields are data, not
    errors."""
    out: dict[int, list] = {}
    pos = 0
    n = len(data)
    while pos < n:
        key, pos = _uvarint(data, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, pos = _uvarint(data, pos)
        elif wire == 1:
            if pos + 8 > n:
                raise ValueError("protobuf fixed64 truncated")
            v = int.from_bytes(data[pos : pos + 8], "little")
            pos += 8
        elif wire == 2:
            ln, pos = _uvarint(data, pos)
            if ln < 0 or pos + ln > n:
                raise ValueError("protobuf bytes truncated")
            v = data[pos : pos + ln]
            pos += ln
        elif wire == 5:
            if pos + 4 > n:
                raise ValueError("protobuf fixed32 truncated")
            v = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        else:
            raise ValueError(f"protobuf wire type {wire} unsupported")
        out.setdefault(field, []).append(v)
    return out


def _first(msg: dict, field: int, default=None):
    vals = msg.get(field)
    return vals[0] if vals else default


def _uint_list(msg: dict, field: int) -> list[int]:
    """Repeated uint field: protobuf writers may emit one varint per
    field occurrence OR a single PACKED length-delimited blob of
    varints (the proto3 default — Spark's ORC writer packs). Accept
    both."""
    out: list[int] = []
    for v in msg.get(field, []):
        if isinstance(v, int):
            out.append(v)
        else:
            pos = 0
            while pos < len(v):
                x, pos = _uvarint(v, pos)
                out.append(x)
    return out


def snappy_decompress(data: bytes) -> bytes:
    """Raw-format snappy (the block format, no framing): varint
    uncompressed length, then literal and copy tags. Copies may
    overlap their own output (run-length behavior) — appended
    byte-by-byte exactly as the format defines."""
    want, pos = _uvarint(data, pos=0)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        ttype = tag & 3
        if ttype == 0:  # literal
            ln = tag >> 2
            if ln >= 60:  # 60..63 -> 1..4 extra length bytes
                extra = ln - 59
                if pos + extra > n:
                    raise ValueError("snappy literal length truncated")
                ln = int.from_bytes(data[pos : pos + extra], "little")
                pos += extra
            ln += 1
            if pos + ln > n:
                raise ValueError("snappy literal truncated")
            out += data[pos : pos + ln]
            pos += ln
            continue
        if ttype == 1:  # copy, 1-byte offset
            ln = ((tag >> 2) & 0x7) + 4
            if pos >= n:
                raise ValueError("snappy copy-1 truncated")
            offset = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif ttype == 2:  # copy, 2-byte offset
            ln = (tag >> 2) + 1
            if pos + 2 > n:
                raise ValueError("snappy copy-2 truncated")
            offset = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte offset
            ln = (tag >> 2) + 1
            if pos + 4 > n:
                raise ValueError("snappy copy-4 truncated")
            offset = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        if offset == 0 or offset > len(out):
            raise ValueError("snappy copy offset out of range")
        at = len(out) - offset
        for i in range(ln):  # overlapping copies are defined behavior
            out.append(out[at + i])
    if len(out) != want:
        raise ValueError(
            f"snappy stream decodes to {len(out)} bytes, header "
            f"promised {want}"
        )
    return bytes(out)


def snappy_compress_stored(data: bytes) -> bytes:
    """A VALID snappy stream that stores its input as literal blocks
    (no back-references — the format permits it, compressors just
    prefer copies). Enough to WRITE formats whose spec mandates
    snappy framing (Avro's snappy codec) without a C codec; readers
    including snappy_decompress and the reference implementations
    accept it."""
    out = bytearray()
    n = len(data)
    k = n
    while True:  # varint uncompressed length
        b = k & 0x7F
        k >>= 7
        if k:
            out.append(b | 0x80)
        else:
            out.append(b)
            break
    pos = 0
    while pos < n:
        chunk = data[pos : pos + 65536]
        ln = len(chunk) - 1
        if ln < 60:
            out.append(ln << 2)
        elif ln < 1 << 8:
            out.append(60 << 2)
            out.append(ln)
        elif ln < 1 << 16:
            out.append(61 << 2)
            out += ln.to_bytes(2, "little")
        else:
            out.append(62 << 2)
            out += ln.to_bytes(3, "little")
        out += chunk
        pos += len(chunk)
    return bytes(out)


def _decompress_stream(data: bytes, kind: str) -> bytes:
    """Un-frame an ORC compressed stream: 3-byte little-endian chunk
    headers (length << 1 | is_original), each chunk raw-deflated /
    snappy'd / literal."""
    if kind == "NONE":
        return data
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        if pos + 3 > n:
            raise ValueError("ORC compression chunk header truncated")
        h = int.from_bytes(data[pos : pos + 3], "little")
        pos += 3
        ln = h >> 1
        if pos + ln > n:
            raise ValueError("ORC compression chunk truncated")
        chunk = data[pos : pos + ln]
        pos += ln
        if h & 1:  # original (stored) chunk
            out += chunk
        elif kind == "ZLIB":
            out += zlib.decompress(chunk, -15)
        elif kind == "SNAPPY":
            out += snappy_decompress(chunk)
        else:
            raise NotImplementedError(
                f"ORC compression kind {kind} not supported "
                "(NONE/ZLIB/SNAPPY only)"
            )
    return bytes(out)


def parse_orc_footer(payload: bytes) -> dict:
    """payload: the full file OR a tail slice that still contains the
    complete footer + postscript. Returns {compression, num_rows,
    content_length, stripes: [{offset, num_rows, index_length,
    data_length, footer_length}], columns: [{name, kind}],
    writer_version}. Refuses loudly on missing magic or a footer
    longer than the provided slice."""
    if len(payload) < 4:
        raise ValueError("not an ORC tail (too short)")
    ps_len = payload[-1]
    if ps_len + 1 > len(payload):
        raise ValueError("ORC postscript longer than provided tail")
    ps_bytes = payload[len(payload) - 1 - ps_len : len(payload) - 1]
    ps = protobuf_message(ps_bytes)
    magic = _first(ps, 8000, b"")
    if magic != b"ORC":
        raise ValueError("not an ORC tail (missing ORC magic)")
    footer_len = _first(ps, 1, 0)
    kind = _PS_COMPRESSION.get(_first(ps, 2, 0), "UNKNOWN")
    tail_needed = 1 + ps_len + footer_len
    if tail_needed > len(payload):
        raise ValueError(
            f"ORC footer is {footer_len} bytes but only "
            f"{len(payload) - 1 - ps_len} provided — re-read a "
            "longer tail"
        )
    raw = payload[
        len(payload) - tail_needed : len(payload) - 1 - ps_len
    ]
    footer = protobuf_message(_decompress_stream(raw, kind))
    stripes = []
    for sb in footer.get(3, []):
        s = protobuf_message(sb)
        stripes.append(
            {
                "offset": _first(s, 1, 0),
                "index_length": _first(s, 2, 0),
                "data_length": _first(s, 3, 0),
                "footer_length": _first(s, 4, 0),
                "num_rows": _first(s, 5, 0),
            }
        )
    types = [protobuf_message(tb) for tb in footer.get(4, [])]
    columns = []
    if types:
        root = types[0]
        names = [b.decode("utf-8") for b in root.get(3, [])]
        subtypes = _uint_list(root, 2)
        for name, st in zip(names, subtypes):
            if st >= len(types):
                raise ValueError("ORC schema subtype out of range")
            columns.append(
                {
                    "name": name,
                    "kind": _TYPE_KINDS.get(
                        _first(types[st], 1, -1), "UNKNOWN"
                    ),
                }
            )
    return {
        "compression": kind,
        "num_rows": _first(footer, 6, 0),
        "content_length": _first(footer, 2, 0),
        "stripes": stripes,
        "columns": columns,
        "writer_version": _first(ps, 6),
    }
