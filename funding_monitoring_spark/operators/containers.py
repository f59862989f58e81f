"""Pure-Python archive/crawl container codecs: WARC, ZIP, ustar TAR.

A 100 TB corpus does not arrive as loose text files — it arrives as
WARC crawls, ZIP-family documents (docx/epub/jars) and tarballs. The
profiling pass a pipeline runs BEFORE extraction is structural: record
and member counts, types/methods, sizes, checksum validity, and the
payload bytes themselves for fingerprinting. All three formats are
algorithm-defined by public specifications and need nothing beyond
struct + stdlib zlib:

- WARC 1.0 (ISO 28500): version line + MIME-style headers +
  Content-Length framing + CRLF CRLF record separator; the standard
  .warc.gz shape is per-record CONCATENATED gzip members (decoded
  member-by-member via zlib's unused_data).
- ZIP (PKWARE APPNOTE): end-of-central-directory scan from the tail,
  central-directory walk, local-header extraction, methods stored(0)
  and deflate(8, raw -15 window), CRC-32 verification per member.
- TAR (POSIX ustar): 512-byte octal-field headers with the
  space-normalized header checksum, content padded to block size;
  tar.gz is one whole-stream gzip member.

Every parser REFUSES loudly on shapes outside its profile (zip64,
encrypted or non-deflate zip members, non-ustar tar magic, bad
checksums/CRCs, malformed framing) rather than guessing.
"""

from __future__ import annotations

import struct
import zlib

__all__ = [
    "encode_warc", "parse_warc",
    "encode_zip", "parse_zip",
    "encode_tar", "parse_tar",
    "gzip_bytes", "gunzip_members",
]


# -- gzip helpers (stdlib zlib with the gzip wrapper) ------------------------


def gzip_bytes(data: bytes) -> bytes:
    """One gzip member (zlib wbits=31 adds the RFC 1952 wrapper;
    mtime and OS fields are whatever zlib emits — parsers must not
    care)."""
    co = zlib.compressobj(9, zlib.DEFLATED, 31)
    return co.compress(data) + co.flush()


def gunzip_members(data: bytes) -> list[bytes]:
    """Decode CONCATENATED gzip members (the .warc.gz layout: one
    member per record, so a reader can split work at member
    boundaries without decompressing the whole file)."""
    out = []
    rest = data
    while rest:
        dec = zlib.decompressobj(31)
        out.append(dec.decompress(rest))
        out[-1] += dec.flush()
        if not dec.eof:
            raise ValueError("truncated gzip member")
        rest = dec.unused_data
    return out


# -- WARC 1.0 ----------------------------------------------------------------

_CRLF = b"\r\n"


def encode_warc(records: list[tuple[str, dict, bytes]],
                per_record_gzip: bool = False) -> bytes:
    """records: [(warc_type, extra_headers, payload)]. Writes WARC/1.0
    records with Content-Length framing; per_record_gzip=True emits
    the standard .warc.gz concatenated-member layout."""
    chunks = []
    for i, (wtype, extra, payload) in enumerate(records):
        # caller extras first; the FRAMING fields always win — a
        # caller-supplied Content-Length would silently corrupt the
        # record stream
        headers = dict(extra or {})
        headers.update(
            {
                "WARC-Type": wtype,
                "WARC-Record-ID": f"<urn:uuid:rec-{i}>",
                "WARC-Date": "2026-01-01T00:00:00Z",
                "Content-Length": str(len(payload)),
            }
        )
        head = b"WARC/1.0" + _CRLF + b"".join(
            f"{k}: {v}".encode("latin-1") + _CRLF
            for k, v in headers.items()
        ) + _CRLF
        rec = head + payload + _CRLF + _CRLF
        chunks.append(gzip_bytes(rec) if per_record_gzip else rec)
    return b"".join(chunks)


def parse_warc(payload: bytes) -> list[tuple[str, dict, bytes]]:
    """Parse a WARC (plain or per-record-gzip) into
    [(warc_type, headers, payload)]. Framing is strict: version line,
    headers to the blank line, exactly Content-Length payload bytes,
    CRLF CRLF separator."""
    if payload[:2] == b"\x1f\x8b":
        data = b"".join(gunzip_members(payload))
    else:
        data = payload
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos : pos + 5] != b"WARC/":
            raise ValueError(
                f"WARC record at byte {pos} missing version line"
            )
        eol = data.index(_CRLF, pos)
        version = data[pos + 5 : eol].decode("latin-1")
        if not version.startswith("1."):
            raise NotImplementedError(f"WARC version {version}")
        pos = eol + 2
        headers: dict[str, str] = {}
        while data[pos : pos + 2] != _CRLF:
            eol = data.index(_CRLF, pos)
            line = data[pos:eol].decode("latin-1")
            if ":" not in line:
                raise ValueError(f"malformed WARC header {line!r}")
            k, v = line.split(":", 1)
            headers[k.strip()] = v.strip()
            pos = eol + 2
        pos += 2
        try:
            length = int(headers["Content-Length"])
        except (KeyError, ValueError):
            raise ValueError("WARC record missing Content-Length")
        body = data[pos : pos + length]
        if len(body) != length:
            raise ValueError("WARC payload truncated")
        pos += length
        if data[pos : pos + 4] != _CRLF + _CRLF:
            raise ValueError("WARC record separator missing")
        pos += 4
        records.append((headers.get("WARC-Type", ""), headers, body))
    return records


# -- ZIP ----------------------------------------------------------------------

_ZIP_LOCAL = 0x04034B50
_ZIP_CENTRAL = 0x02014B50
_ZIP_EOCD = 0x06054B50
_ZIP_EOCD64 = 0x06064B50
_ZIP_EOCD64_LOC = 0x07064B50


def encode_zip(members: list[tuple[str, bytes, bool]],
               force_zip64: bool = False) -> bytes:
    """members: [(name, data, deflate?)]. Writes local headers +
    data, then the central directory + EOCD — real wire layout,
    no stdlib zipfile. ``force_zip64`` writes the zip64 layout
    (0xFFFFFFFF sentinels + 0x0001 extras per entry, EOCD64 record +
    locator) even for small archives — the same structures a >4 GiB
    crawl dump carries, testable without 4 GiB of bytes."""
    out = bytearray()
    central = bytearray()
    for name, data, deflate in members:
        nm = name.encode("utf-8")
        crc = zlib.crc32(data) & 0xFFFFFFFF
        if deflate:
            co = zlib.compressobj(9, zlib.DEFLATED, -15)
            stored = co.compress(data) + co.flush()
            method = 8
        else:
            stored = data
            method = 0
        offset = len(out)
        common = struct.pack(
            "<HHHHHIII", 20, 0, method, 0, 0,
            crc, len(stored), len(data),
        )
        out += struct.pack("<I", _ZIP_LOCAL) + common + struct.pack(
            "<HH", len(nm), 0
        ) + nm + stored
        # central entry laid out explicitly (46-byte fixed part);
        # zip64 entries park the 32-bit size/offset fields at the
        # 0xFFFFFFFF sentinel and carry the real 64-bit values in a
        # 0x0001 extra field (usize, csize, offset — spec order)
        if force_zip64:
            extra = struct.pack(
                "<HHQQQ", 0x0001, 24, len(data), len(stored), offset
            )
            csz = usz = off32 = 0xFFFFFFFF
        else:
            extra = b""
            csz, usz, off32 = len(stored), len(data), offset
        central_entry = struct.pack(
            "<IHHHHHHIIIHHHHHII",
            _ZIP_CENTRAL,
            45 if force_zip64 else 20,  # version made by
            45 if force_zip64 else 20,  # version needed
            0,       # flags
            method,
            0, 0,    # mod time/date
            crc,
            csz,
            usz,
            len(nm),
            len(extra),
            0,       # comment len
            0,       # disk number
            0,       # internal attrs
            0,       # external attrs
            off32,
        )
        central += central_entry + nm + extra
    cd_at = len(out)
    out += central
    if force_zip64:
        eocd64_at = len(out)
        out += struct.pack(
            "<IQHHIIQQQQ",
            _ZIP_EOCD64,
            44,          # size of the remainder of this record
            45, 45,      # version made by / needed
            0, 0,        # this disk / cd disk
            len(members), len(members),
            len(central), cd_at,
        )
        out += struct.pack(
            "<IIQI", _ZIP_EOCD64_LOC, 0, eocd64_at, 1
        )
        out += struct.pack(
            "<IHHHHIIH",
            _ZIP_EOCD, 0, 0,
            0xFFFF, 0xFFFF,
            0xFFFFFFFF, 0xFFFFFFFF, 0,
        )
    else:
        out += struct.pack(
            "<IHHHHIIH",
            _ZIP_EOCD, 0, 0,
            len(members), len(members),
            len(central), cd_at, 0,
        )
    return bytes(out)


def _find_eocd(payload: bytes) -> int:
    """Locate the end-of-central-directory record: scan backward and
    accept a signature match only when its stated comment length
    reaches EXACTLY end-of-file (the standard EOCD validation) — a
    trailing comment that happens to contain the 4-byte signature can
    no longer mis-anchor the parse (ADVICE r10)."""
    sig = struct.pack("<I", _ZIP_EOCD)
    floor = max(0, len(payload) - (65536 + 22))
    at = payload.rfind(sig, floor)
    while at >= 0:
        if at + 22 <= len(payload):
            (clen,) = struct.unpack_from("<H", payload, at + 20)
            if at + 22 + clen == len(payload):
                return at
        at = payload.rfind(sig, floor, at)
    raise ValueError("ZIP end-of-central-directory not found")


def parse_zip(payload: bytes) -> list[dict]:
    """Walk the central directory and extract + CRC-verify every
    member. Returns [{name, method, size, compressed_size, crc_ok,
    data}]. zip64 archives (EOCD64 record + locator, 0x0001 extras)
    parse; encryption and methods other than stored/deflate refuse."""
    eocd_at = _find_eocd(payload)
    (_, disk, cd_disk, n_here, n_total, cd_size, cd_at, _clen) = (
        struct.unpack_from("<IHHHHIIH", payload, eocd_at)
    )
    if disk != 0 or cd_disk != 0:
        raise NotImplementedError("multi-disk ZIP not supported")
    if (
        n_total == 0xFFFF
        or cd_at == 0xFFFFFFFF
        or cd_size == 0xFFFFFFFF
    ):
        # zip64: the locator sits immediately before the EOCD
        loc_at = eocd_at - 20
        if loc_at < 0 or struct.unpack_from(
            "<I", payload, loc_at
        )[0] != _ZIP_EOCD64_LOC:
            raise ValueError(
                "zip64 sentinel without an EOCD64 locator"
            )
        _lsig, loc_disk, eocd64_at, n_disks = struct.unpack_from(
            "<IIQI", payload, loc_at
        )
        if loc_disk != 0 or n_disks != 1:
            raise NotImplementedError("multi-disk zip64 not supported")
        (
            sig64, _rsz, _vm, _vn, d64, cdd64,
            _n_here64, n_total, cd_size, cd_at,
        ) = struct.unpack_from("<IQHHIIQQQQ", payload, eocd64_at)
        if sig64 != _ZIP_EOCD64:
            raise ValueError("EOCD64 locator points at a non-EOCD64")
        if d64 != 0 or cdd64 != 0:
            raise NotImplementedError("multi-disk zip64 not supported")
    out = []
    pos = cd_at
    for _ in range(n_total):
        fixed = payload[pos : pos + 46]
        if struct.unpack_from("<I", fixed)[0] != _ZIP_CENTRAL:
            raise ValueError("central directory entry corrupt")
        (
            _sig, _made, _need, flags, method, _t, _d, crc,
            csize, usize, nlen, elen, clen, _dn, _ia, _ea, offset,
        ) = struct.unpack("<IHHHHHHIIIHHHHHII", fixed)
        if flags & 0x1:
            raise NotImplementedError("encrypted ZIP member")
        if method not in (0, 8):
            raise NotImplementedError(f"ZIP method {method} unsupported")
        name = payload[pos + 46 : pos + 46 + nlen].decode("utf-8")
        if 0xFFFFFFFF in (csize, usize, offset):
            # the 0x0001 extra carries the 64-bit values, in spec
            # order, ONLY for the fields parked at the sentinel
            extra = payload[
                pos + 46 + nlen : pos + 46 + nlen + elen
            ]
            z64 = None
            e = 0
            while e + 4 <= len(extra):
                eid, esz = struct.unpack_from("<HH", extra, e)
                if eid == 0x0001:
                    z64 = extra[e + 4 : e + 4 + esz]
                    break
                e += 4 + esz
            if z64 is None:
                raise ValueError(
                    f"ZIP member {name!r} has zip64 sentinels but "
                    "no 0x0001 extra field"
                )
            z = 0
            if usize == 0xFFFFFFFF:
                (usize,) = struct.unpack_from("<Q", z64, z)
                z += 8
            if csize == 0xFFFFFFFF:
                (csize,) = struct.unpack_from("<Q", z64, z)
                z += 8
            if offset == 0xFFFFFFFF:
                (offset,) = struct.unpack_from("<Q", z64, z)
                z += 8
        pos += 46 + nlen + elen + clen
        # local header framing for the data
        lfixed = payload[offset : offset + 30]
        if struct.unpack_from("<I", lfixed)[0] != _ZIP_LOCAL:
            raise ValueError(f"local header missing for {name!r}")
        lnlen, lelen = struct.unpack_from("<HH", lfixed, 26)
        data_at = offset + 30 + lnlen + lelen
        raw = payload[data_at : data_at + csize]
        if len(raw) != csize:
            raise ValueError(f"ZIP member {name!r} truncated")
        data = (
            zlib.decompress(raw, -15) if method == 8 else raw
        )
        if len(data) != usize:
            raise ValueError(f"ZIP member {name!r} size mismatch")
        out.append(
            {
                "name": name,
                "method": method,
                "size": usize,
                "compressed_size": csize,
                "crc_ok": (zlib.crc32(data) & 0xFFFFFFFF) == crc,
                "data": data,
            }
        )
    return out


# -- ustar TAR -----------------------------------------------------------------

_TAR_BLOCK = 512


def _octal(value: int, width: int) -> bytes:
    return (f"{value:0{width - 1}o}").encode() + b"\x00"


def _tar_header(name_bytes: bytes, size: int, typeflag: str) -> bytes:
    header = bytearray(_TAR_BLOCK)
    header[0 : len(name_bytes)] = name_bytes
    header[100:108] = _octal(0o644, 8)    # mode
    header[108:116] = _octal(0, 8)        # uid
    header[116:124] = _octal(0, 8)        # gid
    header[124:136] = _octal(size, 12)
    header[136:148] = _octal(0, 12)       # mtime
    header[148:156] = b" " * 8            # checksum placeholder
    header[156] = ord(typeflag)
    header[257:263] = b"ustar\x00"
    header[263:265] = b"00"
    chks = sum(header)
    header[148:156] = f"{chks:06o}".encode() + b"\x00 "
    return bytes(header)


def encode_tar(members: list[tuple[str, bytes]],
               gzip_whole: bool = False) -> bytes:
    """members: [(name, data)] as regular files. POSIX ustar headers
    with correct checksums, two zero-block terminator; gzip_whole
    wraps the stream as .tar.gz. A name longer than 100 bytes emits a
    pax extended header ('x' record carrying ``path``) before the
    member, exactly as POSIX.1-2001 tar does."""
    out = bytearray()
    for name, data in members:
        nm = name.encode("utf-8")
        if len(nm) > 100:
            # pax: "<len> path=<name>\n" where <len> counts ITSELF —
            # a fixed point of ln = digits(ln) + len(rest)
            body = f" path={name}\n".encode("utf-8")
            ln = len(body) + 1
            while len(str(ln)) + len(body) != ln:
                ln = len(str(ln)) + len(body)
            rec = str(ln).encode() + body
            out += _tar_header(b"./PaxHeaders/" + nm[:80], len(rec), "x")
            out += rec + b"\x00" * ((-len(rec)) % _TAR_BLOCK)
            nm = nm[:100]
        out += _tar_header(nm, len(data), "0")
        out += data
        pad = (-len(data)) % _TAR_BLOCK
        out += b"\x00" * pad
    out += b"\x00" * (2 * _TAR_BLOCK)
    return gzip_bytes(bytes(out)) if gzip_whole else bytes(out)


def _tar_size(field: bytes) -> int:
    """Size field: octal text, or GNU base-256 (high bit of byte 0
    set) for members past the 8 GiB octal ceiling."""
    if field[0] & 0x80:
        v = field[0] & 0x7F
        for b in field[1:]:
            v = (v << 8) | b
        return v
    return int(field.rstrip(b"\x00 ") or b"0", 8)


def _pax_records(body: bytes) -> dict[str, str]:
    """Parse pax extended-header records: '<len> key=value\\n' where
    len counts the whole record including itself."""
    out: dict[str, str] = {}
    pos = 0
    while pos < len(body):
        sp = body.index(b" ", pos)
        ln = int(body[pos:sp])
        rec = body[pos : pos + ln]
        if not rec.endswith(b"\n"):
            raise ValueError("pax record does not end in newline")
        k, v = rec[sp - pos + 1 : -1].decode("utf-8").split("=", 1)
        out[k] = v
        pos += ln
    return out


def parse_tar(payload: bytes) -> list[dict]:
    """Walk tar headers: name, size, validated checksum, file data.
    Whole-stream gzip, bz2 and xz wrappers are accepted (.tar.gz /
    .tar.bz2 / .tar.xz — stdlib codecs). Handles the
    real crawl-dump surface beyond plain ustar: pax extended headers
    ('x' per-member and 'g' global — path/size overrides), GNU
    longname records ('L', ././@LongLink), the ustar prefix field for
    long paths, GNU base-256 sizes (> 8 GiB members), and directory
    entries (skipped, as extraction does). Link/device/other member
    types and bad checksums refuse loudly."""
    if payload[:2] == b"\x1f\x8b":
        # RFC 1952 members concatenate to one stream; parallel
        # compressors (pigz) legitimately emit several members per
        # .tar.gz, so join rather than demand exactly one
        payload = b"".join(gunzip_members(payload))
    elif payload[:3] == b"BZh":  # .tar.bz2
        import bz2

        payload = bz2.decompress(payload)
    elif payload[:6] == b"\xfd7zXZ\x00":  # .tar.xz
        import lzma

        payload = lzma.decompress(payload)
    out = []
    pos = 0
    n = len(payload)
    global_over: dict[str, str] = {}
    next_over: dict[str, str] = {}
    saw_terminator = False
    while pos + _TAR_BLOCK <= n:
        header = payload[pos : pos + _TAR_BLOCK]
        if header == b"\x00" * _TAR_BLOCK:
            saw_terminator = True
            break  # terminator
        if header[257:262] != b"ustar":
            raise NotImplementedError("non-ustar tar header")
        stated = int(header[148:156].rstrip(b"\x00 ") or b"0", 8)
        normalized = bytearray(header)
        normalized[148:156] = b" " * 8
        if sum(normalized) != stated:
            raise ValueError("tar header checksum mismatch")
        typeflag = chr(header[156])
        size = _tar_size(header[124:136])
        data = payload[pos + _TAR_BLOCK : pos + _TAR_BLOCK + size]
        if len(data) != size:
            raise ValueError("tar member truncated")
        pos += _TAR_BLOCK + size + ((-size) % _TAR_BLOCK)
        if typeflag == "x":  # pax: overrides for the NEXT member
            next_over.update(_pax_records(data))
            continue
        if typeflag == "g":  # pax: global overrides from here on
            global_over.update(_pax_records(data))
            continue
        if typeflag == "L":  # GNU longname for the NEXT member
            next_over["path"] = data.rstrip(b"\x00").decode("utf-8")
            continue
        if typeflag == "5":  # directory: no data, skip as extraction does
            next_over = {}
            continue
        if typeflag not in ("0", "\x00"):
            raise NotImplementedError(
                f"tar member type {typeflag!r} not supported"
            )
        over = {**global_over, **next_over}
        next_over = {}
        if "path" in over:
            # a pax/longname override supersedes the header name
            # entirely — and the header's 100-byte field may hold a
            # name TRUNCATED mid-multibyte-char (encode_tar writes
            # nm[:100] when a pax record carries the real path), so
            # strict-decoding it first would raise spuriously.
            name = over["path"]
        else:
            name = header[:100].split(b"\x00", 1)[0].decode("utf-8")
            prefix = header[345:500].split(b"\x00", 1)[0].decode("utf-8")
            if prefix:
                name = f"{prefix}/{name}"
        if "size" in over:
            # a pax size override re-frames the data we already read
            true_size = int(over["size"])
            if true_size != size:
                raise ValueError(
                    "pax size override disagrees with header size "
                    f"({true_size} != {size}) — unsupported framing"
                )
        out.append({"name": name, "size": size, "data": data})
    if payload and not out and not saw_terminator:
        # a stream with no members AND no terminator block is not a
        # tar at all (e.g. joined garbage gzip members) — refuse
        # rather than silently return an empty manifest
        raise ValueError("not a tar stream (no headers, no terminator)")
    return out
