"""Pure-Python Avro Object Container File codec (a flat-record
profile), no spark-avro package.

Avro OCF is the other ubiquitous data-engineering wire format next to
parquet, and Spark only reads it through an EXTERNAL package this
environment does not ship — so the engine carries its own reader for
the profile ETL dumps actually use: a flat record schema of
long / double / string / boolean / null-union fields, null, deflate
or snappy codec (snappy via the pure-Python decoder + literal-only
encoder in operators/orcmeta.py, CRC32-checked per the Avro spec). Everything is formula-defined by the public Avro 1.11
spec: zigzag-varint longs, little-endian IEEE doubles, length-
prefixed UTF-8 strings, union branch indices, and the container
framing (magic 'Obj\\x01', metadata map with the schema JSON and
codec, 16-byte sync marker, blocks of <count, byte-size, payload,
sync>).

Arrays and maps of in-profile types read and write with real Avro
block framing (including the negative-count + byte-size skip form on
read); NESTED RECORDS recurse through the same varint walk (any
depth, composing with arrays/maps/unions), enums are symbol-table
index varints, fixed is a sized read, bytes a length-prefixed read.
Named-type REFERENCES resolve: every record/enum/fixed definition
registers its name (and dotted fullname) in a parse-time registry,
and a later type string that names one re-uses the definition —
lazily, so self-referential (recursive) records build and decode the
finite data. Out-of-profile shapes refuse loudly: non-record
top-level schemas, references to UNDEFINED names, unions other than
[null, T], codecs other than null/deflate/snappy, sync-marker
mismatches, and truncated headers/blocks (every length is
bounds-checked before slicing).
"""

from __future__ import annotations

import json
import struct
import zlib

__all__ = ["encode_avro", "decode_avro"]

_MAGIC = b"Obj\x01"
_SYNC = bytes(range(16))  # deterministic writer sync marker


def _zigzag_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(data: bytes, pos: int) -> tuple[int, int]:
    shift = u = 0
    while True:
        if pos >= len(data):
            raise ValueError("Avro varint truncated")
        b = data[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 70:
            raise ValueError("Avro varint too long")
    return (u >> 1) ^ -(u & 1), pos


def _register_named(ftype: dict, names: dict) -> None:
    """Record a named type (record/enum/fixed) in the parse-time
    registry so later fields can reference it by name (Avro spec:
    a type string that is not a primitive names a previously-defined
    type). Registered under the name as given AND, when a namespace
    is present, the dotted fullname; a dotted name also registers its
    bare tail so relative references resolve."""
    nm = ftype.get("name")
    if not isinstance(nm, str) or not nm:
        return
    names[nm] = ftype
    ns = ftype.get("namespace")
    if isinstance(ns, str) and ns:
        names[f"{ns}.{nm}"] = ftype
    if "." in nm:
        names.setdefault(nm.rsplit(".", 1)[1], ftype)


_PRIMITIVES = ("long", "int", "double", "string", "boolean", "bytes")


def _field_writer(ftype, names=None):
    if names is None:
        names = {}
    if ftype == "long" or ftype == "int":
        return lambda v: _zigzag_encode(int(v))
    if ftype == "double":
        return lambda v: struct.pack("<d", float(v))
    if ftype == "string":
        def w(v):
            b = str(v).encode("utf-8")
            return _zigzag_encode(len(b)) + b
        return w
    if ftype == "boolean":
        return lambda v: b"\x01" if v else b"\x00"
    if isinstance(ftype, list) and len(ftype) == 2 and ftype[0] == "null":
        inner = _field_writer(ftype[1], names)

        def wu(v):
            if v is None:
                return _zigzag_encode(0)
            return _zigzag_encode(1) + inner(v)

        return wu
    if isinstance(ftype, dict) and ftype.get("type") == "array":
        if "items" not in ftype:
            raise NotImplementedError("Avro array without /items/")
        item = _field_writer(ftype["items"], names)

        def wa(v):
            v = list(v)
            out = bytearray()
            if v:
                out += _zigzag_encode(len(v))
                for x in v:
                    out += item(x)
            out += _zigzag_encode(0)  # end of array blocks
            return bytes(out)

        return wa
    if isinstance(ftype, dict) and ftype.get("type") == "map":
        if "values" not in ftype:
            raise NotImplementedError("Avro map without /values/")
        val = _field_writer(ftype["values"], names)

        def wm(v):
            out = bytearray()
            if v:
                out += _zigzag_encode(len(v))
                for k, x in v.items():
                    kb = str(k).encode("utf-8")
                    out += _zigzag_encode(len(kb)) + kb
                    out += val(x)
            out += _zigzag_encode(0)  # end of map blocks
            return bytes(out)

        return wm
    if isinstance(ftype, dict) and ftype.get("type") == "record":
        # nested record: the same varint walk, recursed per field —
        # field order is the schema's, values come from a dict.
        # Register BEFORE building sub-writers so self-referential
        # (recursive) records resolve through the lazy ref path.
        _register_named(ftype, names)
        subs = [
            (f["name"], _field_writer(f["type"], names))
            for f in ftype.get("fields", [])
        ]

        def wr(v):
            return b"".join(w(v[name]) for name, w in subs)

        return wr
    if isinstance(ftype, dict) and ftype.get("type") == "enum":
        _register_named(ftype, names)
        symbols = list(ftype.get("symbols", []))
        if not symbols:
            raise NotImplementedError("Avro enum without symbols")
        index = {s: i for i, s in enumerate(symbols)}

        def we(v):
            if v not in index:
                raise ValueError(
                    f"enum value {v!r} not in symbols {symbols}"
                )
            return _zigzag_encode(index[v])

        return we
    if isinstance(ftype, dict) and ftype.get("type") == "fixed":
        _register_named(ftype, names)
        size = ftype.get("size")
        if not isinstance(size, int) or size < 0:
            raise NotImplementedError("Avro fixed without a valid size")

        def wf(v):
            b = bytes(v)
            if len(b) != size:
                raise ValueError(
                    f"fixed value of {len(b)} bytes, schema says {size}"
                )
            return b

        return wf
    if ftype == "bytes":
        def wb(v):
            b = bytes(v)
            return _zigzag_encode(len(b)) + b
        return wb
    if isinstance(ftype, str):
        if ftype in names:
            # named-type REFERENCE: resolve against the parse-time
            # registry, lazily + memoized so recursive records
            # terminate at build time (recursion then follows the
            # finite data at write time)
            defn = names[ftype]
            memo: list = []

            def wref(v):
                if not memo:
                    memo.append(_field_writer(defn, names))
                return memo[0](v)

            return wref
        raise NotImplementedError(
            f"Avro named-type reference {ftype!r} does not name any "
            "previously-defined record/enum/fixed"
        )
    raise NotImplementedError(f"Avro field type {ftype!r} out of profile")


def _field_reader(ftype, names=None):
    if names is None:
        names = {}
    if ftype == "long" or ftype == "int":
        return _zigzag_decode
    if ftype == "double":
        def rd(data, pos):
            if pos + 8 > len(data):
                raise ValueError("Avro double truncated")
            return struct.unpack_from("<d", data, pos)[0], pos + 8
        return rd
    if ftype == "string":
        def rs(data, pos):
            n, pos = _zigzag_decode(data, pos)
            if n < 0 or pos + n > len(data):
                raise ValueError("Avro string truncated")
            return data[pos : pos + n].decode("utf-8"), pos + n
        return rs
    if ftype == "boolean":
        def rb(data, pos):
            if pos >= len(data):
                raise ValueError("Avro boolean truncated")
            return data[pos] != 0, pos + 1
        return rb
    if isinstance(ftype, list) and len(ftype) == 2 and ftype[0] == "null":
        inner = _field_reader(ftype[1], names)

        def ru(data, pos):
            branch, pos = _zigzag_decode(data, pos)
            if branch == 0:
                return None, pos
            if branch != 1:
                raise ValueError(f"Avro union branch {branch} invalid")
            return inner(data, pos)

        return ru
    if isinstance(ftype, dict) and ftype.get("type") == "array":
        if "items" not in ftype:
            raise NotImplementedError("Avro array without /items/")
        item = _field_reader(ftype["items"], names)

        def ra(data, pos):
            out = []
            while True:
                n, pos = _zigzag_decode(data, pos)
                if n == 0:
                    return out, pos
                if n < 0:
                    # spec: a negative count prefixes the block's
                    # byte size (for skipping); items follow normally
                    _, pos = _zigzag_decode(data, pos)
                    n = -n
                for _ in range(n):
                    v, pos = item(data, pos)
                    out.append(v)

        return ra
    if isinstance(ftype, dict) and ftype.get("type") == "map":
        if "values" not in ftype:
            raise NotImplementedError("Avro map without /values/")
        val = _field_reader(ftype["values"], names)
        key_rd = _field_reader("string")

        def rm(data, pos):
            out = {}
            while True:
                n, pos = _zigzag_decode(data, pos)
                if n == 0:
                    return out, pos
                if n < 0:
                    _, pos = _zigzag_decode(data, pos)
                    n = -n
                for _ in range(n):
                    k, pos = key_rd(data, pos)
                    out[k], pos = val(data, pos)

        return rm
    if isinstance(ftype, dict) and ftype.get("type") == "record":
        _register_named(ftype, names)
        subs = [
            (f["name"], _field_reader(f["type"], names))
            for f in ftype.get("fields", [])
        ]

        def rr(data, pos):
            rec = {}
            for name, r in subs:
                rec[name], pos = r(data, pos)
            return rec, pos

        return rr
    if isinstance(ftype, dict) and ftype.get("type") == "enum":
        _register_named(ftype, names)
        symbols = list(ftype.get("symbols", []))
        if not symbols:
            raise NotImplementedError("Avro enum without symbols")

        def re_(data, pos):
            i, pos = _zigzag_decode(data, pos)
            if not 0 <= i < len(symbols):
                raise ValueError(
                    f"enum index {i} out of range for {len(symbols)} "
                    "symbols"
                )
            return symbols[i], pos

        return re_
    if isinstance(ftype, dict) and ftype.get("type") == "fixed":
        _register_named(ftype, names)
        size = ftype.get("size")
        if not isinstance(size, int) or size < 0:
            raise NotImplementedError("Avro fixed without a valid size")

        def rf(data, pos):
            if pos + size > len(data):
                raise ValueError("Avro fixed truncated")
            return data[pos : pos + size], pos + size

        return rf
    if ftype == "bytes":
        def rby(data, pos):
            n, pos = _zigzag_decode(data, pos)
            if n < 0 or pos + n > len(data):
                raise ValueError("Avro bytes truncated")
            return data[pos : pos + n], pos + n
        return rby
    if isinstance(ftype, str):
        if ftype in names:
            # named-type REFERENCE (see _field_writer): lazy +
            # memoized so recursive records terminate at build time
            defn = names[ftype]
            memo: list = []

            def rref(data, pos):
                if not memo:
                    memo.append(_field_reader(defn, names))
                return memo[0](data, pos)

            return rref
        raise NotImplementedError(
            f"Avro named-type reference {ftype!r} does not name any "
            "previously-defined record/enum/fixed"
        )
    raise NotImplementedError(f"Avro field type {ftype!r} out of profile")


def encode_avro(schema: dict, records: list[dict],
                codec: str = "null", block_size: int = 100) -> bytes:
    """Write an Avro OCF: the flat-record schema JSON in the metadata
    map, records in blocks of <= block_size, null or deflate codec."""
    if schema.get("type") != "record":
        raise NotImplementedError("only record top-level schemas")
    if codec not in ("null", "deflate", "snappy"):
        raise NotImplementedError(f"Avro codec {codec!r} unsupported")
    names: dict = {}
    _register_named(schema, names)
    writers = [
        (f["name"], _field_writer(f["type"], names))
        for f in schema["fields"]
    ]
    meta = {
        "avro.schema": json.dumps(schema).encode("utf-8"),
        "avro.codec": codec.encode(),
    }
    out = bytearray(_MAGIC)
    out += _zigzag_encode(len(meta))
    for k, v in meta.items():
        kb = k.encode()
        out += _zigzag_encode(len(kb)) + kb
        out += _zigzag_encode(len(v)) + v
    out += _zigzag_encode(0)  # end of metadata map
    out += _SYNC
    for at in range(0, len(records), block_size):
        block = records[at : at + block_size]
        body = b"".join(
            b"".join(w(rec[name]) for name, w in writers)
            for rec in block
        )
        if codec == "deflate":
            co = zlib.compressobj(9, zlib.DEFLATED, -15)
            body = co.compress(body) + co.flush()
        elif codec == "snappy":
            # Avro snappy: raw snappy block + 4-byte BIG-endian CRC32
            # of the UNCOMPRESSED data (Avro spec); written via the
            # literal-only pure-Python encoder
            from funding_monitoring_spark.operators.orcmeta import (
                snappy_compress_stored,
            )

            crc = zlib.crc32(body) & 0xFFFFFFFF
            body = snappy_compress_stored(body) + crc.to_bytes(4, "big")
        out += _zigzag_encode(len(block))
        out += _zigzag_encode(len(body))
        out += body
        out += _SYNC
    return bytes(out)


def decode_avro(payload: bytes) -> tuple[dict, list[dict]]:
    """Read an Avro OCF: returns (schema, records). Refuses loudly on
    out-of-profile schemas/codecs and on sync-marker mismatches."""
    if payload[:4] != _MAGIC:
        raise ValueError("not an Avro object container file")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _zigzag_decode(payload, pos)
        if n == 0:
            break
        if n < 0:  # negative count prefixes a byte-size (spec); rare
            raise NotImplementedError("negative-count Avro map blocks")
        for _ in range(n):
            kl, pos = _zigzag_decode(payload, pos)
            if kl < 0 or pos + kl > len(payload):
                raise ValueError("Avro header truncated (metadata key)")
            key = payload[pos : pos + kl].decode()
            pos += kl
            vl, pos = _zigzag_decode(payload, pos)
            if vl < 0 or pos + vl > len(payload):
                raise ValueError(
                    "Avro header truncated (metadata value)"
                )
            meta[key] = payload[pos : pos + vl]
            pos += vl
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate", "snappy"):
        raise NotImplementedError(f"Avro codec {codec!r} unsupported")
    if schema.get("type") != "record":
        raise NotImplementedError("only record top-level schemas")
    names: dict = {}
    _register_named(schema, names)
    readers = [
        (f["name"], _field_reader(f["type"], names))
        for f in schema["fields"]
    ]
    sync = payload[pos : pos + 16]
    pos += 16
    records: list[dict] = []
    while pos < len(payload):
        count, pos = _zigzag_decode(payload, pos)
        if count < 0:
            raise NotImplementedError(
                "negative data-block record counts (OCF does not "
                "define them; a container claiming one is malformed)"
            )
        size, pos = _zigzag_decode(payload, pos)
        if size < 0:
            raise ValueError("Avro block size negative")
        body = payload[pos : pos + size]
        if len(body) != size:
            raise ValueError("Avro block truncated")
        pos += size
        if payload[pos : pos + 16] != sync:
            raise ValueError("Avro sync marker mismatch")
        pos += 16
        if codec == "deflate":
            body = zlib.decompress(body, -15)
        elif codec == "snappy":
            from funding_monitoring_spark.operators.orcmeta import (
                snappy_decompress,
            )

            if len(body) < 4:
                raise ValueError("Avro snappy block missing CRC")
            raw, crc = body[:-4], int.from_bytes(body[-4:], "big")
            body = snappy_decompress(raw)
            if (zlib.crc32(body) & 0xFFFFFFFF) != crc:
                raise ValueError("Avro snappy block CRC mismatch")
        bpos = 0
        for _ in range(count):
            rec = {}
            for name, rd in readers:
                rec[name], bpos = rd(body, bpos)
            records.append(rec)
        if bpos != len(body):
            raise ValueError("Avro block has trailing bytes")
    return schema, records
