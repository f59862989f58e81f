"""Pure-Python parquet FOOTER parser (Thrift compact protocol).

Profiling a data lake is a metadata operation: row-group layout,
per-column codecs/encodings, row counts and writer provenance live in
the file footer, and a 100 TB estate audit should read ~64 KiB per
file, never the data pages. Spark/pyarrow expose this only through
their own readers; this module parses the footer from raw bytes so
manifest-scale audits run as plain distributed maps over (path, tail
bytes) — the same shape as the container manifest scans.

Everything here is algorithm-defined by public specifications: the
parquet file layout ("PAR1" magic, 4-byte little-endian footer length
trailer) and the Thrift COMPACT wire protocol (ULEB128 varints,
zigzag ints, nibble-packed field headers with delta field ids,
size-prefixed lists) — the same varint/zigzag machinery as the Avro
codec. The Thrift reader is GENERIC: it parses any compact-protocol
struct into {field_id: value} with no IDL transcription, and the
parquet layer then navigates the handful of public field ids it needs
(FileMetaData 1..6, RowGroup 1..3, ColumnChunk 3, ColumnMetaData
1..7, SchemaElement 4/5). Unknown fields are preserved, not errors —
footer schemas grow forward-compatibly.

Cross-validated against pyarrow's independent reader in
tests/test_parquetmeta.py (row counts, row-group layout, codecs,
column paths — both directions of trust)."""

from __future__ import annotations

import struct

__all__ = ["parse_parquet_footer", "thrift_struct"]

_MAGIC = b"PAR1"

#: parquet CompressionCodec enum (format spec, public)
CODECS = {
    0: "UNCOMPRESSED", 1: "SNAPPY", 2: "GZIP", 3: "LZO",
    4: "BROTLI", 5: "LZ4", 6: "ZSTD", 7: "LZ4_RAW",
}

#: parquet physical Type enum
PHYSICAL_TYPES = {
    0: "BOOLEAN", 1: "INT32", 2: "INT64", 3: "INT96",
    4: "FLOAT", 5: "DOUBLE", 6: "BYTE_ARRAY",
    7: "FIXED_LEN_BYTE_ARRAY",
}

#: parquet Encoding enum
ENCODINGS = {
    0: "PLAIN", 2: "PLAIN_DICTIONARY", 3: "RLE", 4: "BIT_PACKED",
    5: "DELTA_BINARY_PACKED", 6: "DELTA_LENGTH_BYTE_ARRAY",
    7: "DELTA_BYTE_ARRAY", 8: "RLE_DICTIONARY", 9: "BYTE_STREAM_SPLIT",
}


def _uvarint(data: bytes, pos: int) -> tuple[int, int]:
    shift = v = 0
    while True:
        if pos >= len(data):
            raise ValueError("thrift varint truncated")
        b = data[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7
        if shift > 70:
            raise ValueError("thrift varint too long")


def _zigzag(data: bytes, pos: int) -> tuple[int, int]:
    u, pos = _uvarint(data, pos)
    return (u >> 1) ^ -(u & 1), pos


def _value(data: bytes, pos: int, ctype: int):
    """One compact-protocol value of wire type ctype."""
    if ctype in (1, 2):  # BOOLEAN_TRUE / BOOLEAN_FALSE (in lists: byte)
        # inside LISTS booleans are one byte; field-level booleans are
        # encoded in the field header itself and never reach here with
        # these codes — treat a list element byte as truthiness
        if pos >= len(data):
            raise ValueError("thrift boolean truncated")
        return data[pos] == 1, pos + 1
    if ctype in (3, 4, 5, 6):  # BYTE, I16, I32, I64 — all zigzag varint
        return _zigzag(data, pos)
    if ctype == 7:  # DOUBLE: 8 bytes little-endian (compact protocol)
        if pos + 8 > len(data):
            raise ValueError("thrift double truncated")
        return struct.unpack_from("<d", data, pos)[0], pos + 8
    if ctype == 8:  # BINARY / STRING: varint length + bytes
        n, pos = _uvarint(data, pos)
        if n < 0 or pos + n > len(data):
            raise ValueError("thrift binary truncated")
        return data[pos : pos + n], pos + n
    if ctype in (9, 10):  # LIST / SET
        head = data[pos]
        pos += 1
        size = head >> 4
        etype = head & 0xF
        if size == 15:
            size, pos = _uvarint(data, pos)
        out = []
        for _ in range(size):
            v, pos = _value(data, pos, etype)
            out.append(v)
        return out, pos
    if ctype == 11:  # MAP
        size, pos = _uvarint(data, pos)
        if size == 0:
            return {}, pos
        head = data[pos]
        pos += 1
        ktype, vtype = head >> 4, head & 0xF
        out = {}
        for _ in range(size):
            k, pos = _value(data, pos, ktype)
            v, pos = _value(data, pos, vtype)
            out[k] = v
        return out, pos
    if ctype == 12:  # STRUCT
        return thrift_struct(data, pos)
    raise ValueError(f"thrift compact type {ctype} unknown")


def thrift_struct(data: bytes, pos: int = 0) -> tuple[dict, int]:
    """Parse one compact-protocol struct generically into
    {field_id: value}; nested structs become dicts, lists stay lists.
    Unknown fields are kept — forward compatibility is the point of
    the wire format, refusing on them would break on every new
    parquet writer version."""
    out: dict[int, object] = {}
    fid = 0
    while True:
        if pos >= len(data):
            raise ValueError("thrift struct truncated (no STOP)")
        head = data[pos]
        pos += 1
        if head == 0:  # STOP
            return out, pos
        delta = head >> 4
        ftype = head & 0xF
        if delta:
            fid += delta
        else:  # long form: explicit zigzag field id
            fid, pos = _zigzag(data, pos)
        if ftype == 1:  # BOOLEAN_TRUE carried in the header
            out[fid] = True
            continue
        if ftype == 2:  # BOOLEAN_FALSE
            out[fid] = False
            continue
        out[fid], pos = _value(data, pos, ftype)
    # unreachable


def parse_parquet_footer(payload: bytes) -> dict:
    """payload: the full file OR any tail slice that still contains
    the complete footer (metadata + 8-byte trailer). Returns
    {version, num_rows, created_by, columns: [{path, type}],
    row_groups: [{num_rows, total_byte_size, columns: [{path, codec,
    num_values, encodings, compressed, uncompressed}]}]}.

    Refuses loudly on missing magic or a footer longer than the
    provided slice — a manifest scan that reads a fixed tail size can
    retry with a bigger slice instead of mis-parsing."""
    if len(payload) < 12 or payload[-4:] != _MAGIC:
        raise ValueError("not a parquet tail (missing PAR1 magic)")
    (meta_len,) = struct.unpack_from("<I", payload, len(payload) - 8)
    if meta_len + 8 > len(payload):
        raise ValueError(
            f"parquet footer is {meta_len} bytes but only "
            f"{len(payload) - 8} provided — re-read a longer tail"
        )
    meta = payload[len(payload) - 8 - meta_len : len(payload) - 8]
    fmd, _ = thrift_struct(meta, 0)

    def dec(b):
        return b.decode("utf-8") if isinstance(b, bytes) else b

    # SchemaElement: 4=name, 5=num_children, 1=physical type. The
    # flat-column list is the leaves (no num_children), path built by
    # walking the tree depth-first with the declared child counts.
    schema = fmd.get(2, [])
    columns = []

    def walk(idx: int, prefix: list[str]) -> int:
        el = schema[idx]
        name = dec(el.get(4, b""))
        n_children = el.get(5, 0) or 0
        idx += 1
        if n_children == 0:
            columns.append(
                {
                    "path": ".".join([*prefix, name]),
                    "type": PHYSICAL_TYPES.get(el.get(1), "UNKNOWN"),
                }
            )
            return idx
        for _ in range(n_children):
            idx = walk(idx, [*prefix, name] if prefix or idx > 1 else [])
        return idx

    if schema:
        # root element: children only, its name never prefixes paths
        root_children = schema[0].get(5, 0) or 0
        idx = 1
        for _ in range(root_children):
            idx = walk(idx, [])

    row_groups = []
    for rg in fmd.get(4, []):
        cols = []
        for cc in rg.get(1, []):
            md = cc.get(3, {})
            cols.append(
                {
                    "path": ".".join(dec(p) for p in md.get(3, [])),
                    "codec": CODECS.get(md.get(4), "UNKNOWN"),
                    "num_values": md.get(5, 0),
                    "encodings": sorted(
                        ENCODINGS.get(e, str(e)) for e in md.get(2, [])
                    ),
                    "uncompressed": md.get(6, 0),
                    "compressed": md.get(7, 0),
                }
            )
        row_groups.append(
            {
                "num_rows": rg.get(3, 0),
                "total_byte_size": rg.get(2, 0),
                "columns": cols,
            }
        )
    return {
        "version": fmd.get(1),
        "num_rows": fmd.get(3, 0),
        "created_by": dec(fmd.get(6, b"")),
        "columns": columns,
        "row_groups": row_groups,
    }
