"""Pure-Python baseline TIFF codec (TIFF 6.0), no imaging library.

Covers the shapes that dominate scanned/archival corpora: strip-based
8-bit grayscale (PhotometricInterpretation 1) and RGB (2), chunky
planar layout, BOTH byte orders ("II" little / "MM" big), and the
four compressions real archives carry — none (1), LZW (5), Adobe
Deflate (8, stdlib zlib) and PackBits (32773) — plus the horizontal-differencing Predictor (2) that usually
accompanies LZW. Everything here is algorithm-defined by the public
TIFF 6.0 specification (no normative numeric tables): the IFD walk is
struct parsing, PackBits is a two-case run-length scheme, and TIFF LZW
is the MSB-first variable-width LZW with the spec's "early change"
width bump (the code width grows one code EARLIER than the table size
strictly requires — at next-code 511/1023/2047 for 9/10/11 bits).

Out-of-scope shapes refuse loudly (NotImplementedError) instead of
faking pixels: tiled layout, planar configuration 2, bit depths other
than 8, palette/CMYK/YCbCr photometrics, CCITT/JPEG
compressions, floating-point predictors. Reference parity: the
reference pipeline (funding_rates_etl.py) has no media surface; this
extends the north-star LLM-corpus toolkit the same way the BMP/PNG/
JPEG codecs in operators/multimodal.py and operators/jpegcodec.py do.
"""

from __future__ import annotations

import struct

__all__ = [
    "encode_tiff",
    "decode_tiff",
    "packbits_encode",
    "packbits_decode",
    "lzw_encode",
    "lzw_decode",
]

_CLEAR = 256
_EOI = 257
# "early change": bump the code width when the next table slot to be
# assigned reaches (1 << width) - 1, not (1 << width) — TIFF6 §13
_EARLY = 1

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}  # BYTE ASCII SHORT LONG RATIONAL

_T_WIDTH = 256
_T_LENGTH = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SAMPLES = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_COUNTS = 279
_T_PLANAR = 284
_T_PREDICTOR = 317
_T_TILE_WIDTH = 322
_T_TILE_LENGTH = 323
_T_TILE_OFFSETS = 324


# -- PackBits (TIFF 6.0 §9) -------------------------------------------------


def packbits_encode(data: bytes) -> bytes:
    """Apple PackBits: header n in [0,127] copies n+1 literal bytes;
    n in [129,255] (two's-complement -127..-1) repeats the next byte
    257-n times; 128 is a no-op. Runs >= 3 are worth encoding."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        # literal stretch: until the next >=3 run or 128 bytes
        j = i
        while j < n and j - i < 128:
            run = 1
            while j + run < n and run < 3 and data[j + run] == data[j]:
                run += 1
            if run >= 3:
                break
            j += 1
        out.append(j - i - 1)
        out.extend(data[i:j])
        i = j
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while len(out) < expected:
        if i >= n:
            raise ValueError("PackBits stream truncated")
        h = data[i]
        i += 1
        if h == 128:
            continue
        if h < 128:
            if i + h + 1 > n:
                raise ValueError("PackBits literal overruns stream")
            out.extend(data[i : i + h + 1])
            i += h + 1
        else:
            if i >= n:
                raise ValueError("PackBits run overruns stream")
            out.extend(bytes([data[i]]) * (257 - h))
            i += 1
    if len(out) != expected:
        raise ValueError(
            f"PackBits decoded {len(out)} bytes, expected {expected}"
        )
    return bytes(out)


# -- TIFF LZW (TIFF 6.0 §13) ------------------------------------------------


class _BitWriterMSB:
    def __init__(self) -> None:
        self._acc = 0
        self._nbits = 0
        self._out = bytearray()

    def put(self, code: int, width: int) -> None:
        self._acc = (self._acc << width) | code
        self._nbits += width
        while self._nbits >= 8:
            self._nbits -= 8
            self._out.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def done(self) -> bytes:
        if self._nbits:
            self._out.append((self._acc << (8 - self._nbits)) & 0xFF)
            self._acc, self._nbits = 0, 0
        return bytes(self._out)


class _BitReaderMSB:
    def __init__(self, data: bytes) -> None:
        self._data = data
        self._pos = 0  # bit position

    def get(self, width: int) -> int:
        end = self._pos + width
        if end > len(self._data) * 8:
            raise ValueError("LZW bitstream truncated")
        v = 0
        pos = self._pos
        while pos < end:
            byte = self._data[pos >> 3]
            take = min(8 - (pos & 7), end - pos)
            shift = 8 - (pos & 7) - take
            v = (v << take) | ((byte >> shift) & ((1 << take) - 1))
            pos += take
        self._pos = end
        return v


def lzw_encode(data: bytes) -> bytes:
    """TIFF-flavor LZW: MSB-first bit packing, initial 9-bit codes,
    ClearCode=256 / EOI=257, early-change width bumps, table reset
    once the next free slot reaches 4094 (so the decoder never needs
    a 13-bit code)."""
    w = _BitWriterMSB()
    width = 9
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt = 258
    w.put(_CLEAR, width)
    prefix = b""
    for b in data:
        probe = prefix + bytes([b])
        if probe in table:
            prefix = probe
            continue
        w.put(table[prefix], width)
        table[probe] = nxt
        nxt += 1
        if nxt == (1 << width) - _EARLY and width < 12:
            width += 1
        prefix = bytes([b])
        if nxt >= 4094:
            w.put(_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            nxt, width = 258, 9
    if prefix:
        w.put(table[prefix], width)
        # the slot the decoder will assign after this code counts
        # toward ITS width schedule — mirror it before emitting EOI
        nxt += 1
        if nxt == (1 << width) - _EARLY and width < 12:
            width += 1
    w.put(_EOI, width)
    return w.done()


def lzw_decode(data: bytes) -> bytes:
    r = _BitReaderMSB(data)
    out = bytearray()
    width = 9
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    prev: bytes | None = None
    while True:
        code = r.get(width)
        if code == _EOI:
            return bytes(out)
        if code == _CLEAR:
            table = table[:258]
            width, prev = 9, None
            continue
        if prev is None:
            if code >= 256:
                raise ValueError("LZW: first code after clear not literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"LZW: code {code} beyond table")
        out.extend(entry)
        # the decoder's table lags the encoder's by exactly one entry
        # (the entry an emitted code created is only reconstructible
        # when the NEXT code arrives), so it bumps the width one slot
        # earlier than the encoder's nxt == (1<<width)-1 rule
        if len(table) == (1 << width) - _EARLY - 1 and width < 12:
            width += 1
        prev = entry


# -- predictor (TIFF 6.0 §14) -----------------------------------------------


def _diff_rows(rows, samples: int):
    """Horizontal differencing per row, per sample channel (uint8
    modular arithmetic)."""
    import numpy as np

    a = rows.reshape(rows.shape[0], -1, samples).astype(np.int16)
    d = a.copy()
    d[:, 1:, :] -= a[:, :-1, :]
    return (d % 256).astype(np.uint8).reshape(rows.shape)


def _undiff_rows(rows, samples: int):
    import numpy as np

    a = rows.reshape(rows.shape[0], -1, samples).astype(np.uint8)
    return (
        np.cumsum(a.astype(np.int64), axis=1) % 256
    ).astype(np.uint8).reshape(rows.shape)


# -- container --------------------------------------------------------------


def encode_tiff(
    pixels,
    byte_order: str = "<",
    compression: int = 1,
    rows_per_strip: int | None = None,
    predictor: int = 1,
) -> bytes:
    """Encode an (h, w, 3) RGB or (h, w) grayscale uint8 array as a
    strip-based baseline TIFF. byte_order "<" writes II (little
    endian), ">" writes MM (big endian); compression 1/5/8/32773;
    predictor 2 applies horizontal differencing before compression
    (valid with any compression per spec, pointless with none)."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        h, w = px.shape
        samples, photometric = 1, 1
    elif px.ndim == 3 and px.shape[2] == 3:
        h, w, _ = px.shape
        samples, photometric = 3, 2
    else:
        raise ValueError(f"unsupported pixel shape {px.shape}")
    if byte_order not in ("<", ">"):
        raise ValueError("byte_order must be '<' or '>'")
    if compression not in (1, 5, 8, 32773):
        raise ValueError(f"unsupported compression {compression}")
    if predictor not in (1, 2):
        raise ValueError(f"unsupported predictor {predictor}")
    bo = byte_order
    rps = h if rows_per_strip is None else max(1, min(rows_per_strip, h))

    flat = px.reshape(h, w * samples)
    strips = []
    for y0 in range(0, h, rps):
        rows = flat[y0 : y0 + rps]
        if predictor == 2:
            rows = _diff_rows(rows, samples)
        raw = rows.tobytes()
        if compression == 5:
            strips.append(lzw_encode(raw))
        elif compression == 8:
            import zlib

            strips.append(zlib.compress(raw))
        elif compression == 32773:
            # PackBits compresses per ROW per spec §9 note
            strips.append(b"".join(packbits_encode(r.tobytes())
                                   for r in rows))
        else:
            strips.append(raw)

    n_strips = len(strips)
    entries = []  # (tag, type, count, packed-value-or-None, data)

    def short(v):
        return struct.pack(bo + "HH", v, 0)

    def long_(v):
        return struct.pack(bo + "I", v)

    entries.append((_T_WIDTH, 3, 1, short(w), None))
    entries.append((_T_LENGTH, 3, 1, short(h), None))
    if samples == 1:
        entries.append((_T_BITS, 3, 1, short(8), None))
    else:
        entries.append(
            (_T_BITS, 3, 3, None, struct.pack(bo + "HHH", 8, 8, 8))
        )
    entries.append((_T_COMPRESSION, 3, 1, short(compression), None))
    entries.append((_T_PHOTOMETRIC, 3, 1, short(photometric), None))
    if n_strips == 1:
        entries.append((_T_STRIP_OFFSETS, 4, 1, "OFFSETS", None))
    else:
        entries.append((_T_STRIP_OFFSETS, 4, n_strips, None, "OFFSETS"))
    entries.append((_T_SAMPLES, 3, 1, short(samples), None))
    entries.append((_T_ROWS_PER_STRIP, 4, 1, long_(rps), None))
    counts = [len(s) for s in strips]
    if n_strips == 1:
        entries.append((_T_STRIP_COUNTS, 4, 1, long_(counts[0]), None))
    else:
        entries.append(
            (_T_STRIP_COUNTS, 4, n_strips, None,
             struct.pack(bo + f"{n_strips}I", *counts))
        )
    entries.append((_T_PLANAR, 3, 1, short(1), None))
    if predictor == 2:
        entries.append((_T_PREDICTOR, 3, 1, short(predictor), None))
    entries.sort(key=lambda e: e[0])  # IFD entries must be tag-ascending

    header = struct.pack(bo + "2sHI", b"II" if bo == "<" else b"MM", 42, 8)
    ifd_size = 2 + 12 * len(entries) + 4
    data_start = 8 + ifd_size

    # lay out the out-of-line data area: tag payloads, then strips
    blob = bytearray()
    data_offsets = {}
    for tag, typ, cnt, val, data in entries:
        if data is not None and data != "OFFSETS":
            data_offsets[tag] = data_start + len(blob)
            blob.extend(data)
            if len(blob) % 2:
                blob.append(0)  # word-align per spec
    strip_offsets = []
    for s in strips:
        strip_offsets.append(data_start + len(blob))
        blob.extend(s)
        if len(blob) % 2:
            blob.append(0)
    if n_strips > 1:
        offsets_at = data_start + len(blob)
        blob.extend(struct.pack(bo + f"{n_strips}I", *strip_offsets))

    ifd = bytearray(struct.pack(bo + "H", len(entries)))
    for tag, typ, cnt, val, data in entries:
        if val == "OFFSETS":
            val = long_(strip_offsets[0])
        elif data == "OFFSETS":
            val = long_(offsets_at)
        elif data is not None:
            val = long_(data_offsets[tag])
        ifd += struct.pack(bo + "HHI", tag, typ, cnt) + val
    ifd += struct.pack(bo + "I", 0)  # no next IFD
    return header + bytes(ifd) + bytes(blob)


def _read_tag_values(bo, payload, typ, cnt, val_bytes):
    size = _TYPE_SIZES.get(typ)
    if size is None:
        raise NotImplementedError(f"TIFF tag type {typ} unsupported")
    total = size * cnt
    raw = (
        val_bytes[:total]
        if total <= 4
        else payload[
            struct.unpack(bo + "I", val_bytes)[0] :
            struct.unpack(bo + "I", val_bytes)[0] + total
        ]
    )
    if len(raw) != total:
        raise ValueError("TIFF tag data overruns file")
    if typ == 3:
        return list(struct.unpack(bo + f"{cnt}H", raw))
    if typ == 4:
        return list(struct.unpack(bo + f"{cnt}I", raw))
    if typ in (1, 2):  # BYTE / ASCII: caller interprets the bytes
        return list(raw)
    raise NotImplementedError(f"TIFF tag type {typ} unsupported here")


def decode_tiff(payload: bytes):
    """Decode a baseline strip-based TIFF into an (h, w, 3) uint8 RGB
    array (grayscale replicated across channels, matching the PNG
    decoder's RGB output contract). Refuses loudly on tiles, planar
    layout 2, non-8-bit depths, exotic photometrics/compressions."""
    import numpy as np

    if payload[:4] == b"II*\x00":
        bo = "<"
    elif payload[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF stream")
    (ifd_off,) = struct.unpack(bo + "I", payload[4:8])
    if ifd_off + 2 > len(payload):
        raise ValueError("TIFF IFD offset beyond file")
    (n_entries,) = struct.unpack(bo + "H", payload[ifd_off : ifd_off + 2])
    tags = {}
    pos = ifd_off + 2
    for _ in range(n_entries):
        tag, typ, cnt = struct.unpack(bo + "HHI", payload[pos : pos + 8])
        tags[tag] = (typ, cnt, payload[pos + 8 : pos + 12])
        pos += 12

    if _T_TILE_WIDTH in tags or _T_TILE_LENGTH in tags \
            or _T_TILE_OFFSETS in tags:
        raise NotImplementedError("tiled TIFF layout not supported")

    def vals(tag, default=None):
        if tag not in tags:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        typ, cnt, vb = tags[tag]
        return _read_tag_values(bo, payload, typ, cnt, vb)

    w = vals(_T_WIDTH)[0]
    h = vals(_T_LENGTH)[0]
    samples = vals(_T_SAMPLES, [1])[0]
    bits = vals(_T_BITS, [8] * samples)
    compression = vals(_T_COMPRESSION, [1])[0]
    photometric = vals(_T_PHOTOMETRIC)[0]
    planar = vals(_T_PLANAR, [1])[0]
    predictor = vals(_T_PREDICTOR, [1])[0]
    rps = vals(_T_ROWS_PER_STRIP, [h])[0]
    offsets = vals(_T_STRIP_OFFSETS)
    counts = vals(_T_STRIP_COUNTS)

    if any(b != 8 for b in bits):
        raise NotImplementedError(f"TIFF bit depths {bits} not supported")
    if planar != 1:
        raise NotImplementedError("TIFF planar configuration 2 unsupported")
    if photometric not in (1, 2):
        raise NotImplementedError(
            f"TIFF photometric {photometric} not supported"
        )
    if photometric == 2 and samples != 3:
        raise NotImplementedError(
            f"RGB TIFF with {samples} samples unsupported"
        )
    if photometric == 1 and samples != 1:
        raise NotImplementedError(
            f"grayscale TIFF with {samples} samples unsupported"
        )
    if compression not in (1, 5, 8, 32773):
        raise NotImplementedError(
            f"TIFF compression {compression} not supported"
        )
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor} unsupported")
    if len(offsets) != len(counts):
        raise ValueError("strip offsets/counts length mismatch")
    rps = max(1, min(rps, h))

    row_bytes = w * samples
    rows_out = []
    y = 0
    for off, cnt in zip(offsets, counts):
        n_rows = min(rps, h - y)
        raw = payload[off : off + cnt]
        if len(raw) != cnt:
            raise ValueError("TIFF strip overruns file")
        expected = n_rows * row_bytes
        if compression == 5:
            data = lzw_decode(raw)
        elif compression == 8:
            import zlib

            data = zlib.decompress(raw)
        elif compression == 32773:
            data = packbits_decode(raw, expected)
        else:
            data = raw
        if len(data) < expected:
            raise ValueError("TIFF strip shorter than its row span")
        rows = np.frombuffer(
            data[:expected], dtype=np.uint8
        ).reshape(n_rows, row_bytes)
        if predictor == 2:
            rows = _undiff_rows(rows, samples)
        rows_out.append(rows)
        y += n_rows
    if y != h:
        raise ValueError(f"TIFF strips cover {y} rows, image has {h}")
    img = np.concatenate(rows_out, axis=0)
    if samples == 1:
        return np.repeat(img.reshape(h, w, 1), 3, axis=2)
    return img.reshape(h, w, 3)


# -- EXIF (a TIFF IFD embedded in JPEG APP1; Exif 2.x / TIFF 6.0) -------------

EXIF_MAKE = 271
EXIF_MODEL = 272
EXIF_ORIENTATION = 274
EXIF_DATETIME = 306
EXIF_IFD_POINTER = 34665
EXIF_PIXEL_X = 40962
EXIF_PIXEL_Y = 40963


def _pack_ifd(bo: str, entries, ifd_at: int) -> bytes:
    """Pack one IFD (count + tag-ascending 12-byte entries + zero
    next-IFD pointer + out-of-line data blob) for placement at
    absolute offset ifd_at. entries: [(tag, typ, raw_bytes, count)].
    The block length is independent of ifd_at (offsets only change
    4-byte values), which build_exif relies on to pre-compute the
    sub-IFD position."""
    n = len(entries)
    data_at = ifd_at + 2 + 12 * n + 4
    ifd = struct.pack(bo + "H", n)
    blob = b""
    for tag, typ, raw, cnt in sorted(entries):
        if len(raw) <= 4:
            val = raw + b"\x00" * (4 - len(raw))
        else:
            val = struct.pack(bo + "I", data_at + len(blob))
            blob += raw + (b"\x00" if len(raw) % 2 else b"")
        ifd += struct.pack(bo + "HHI", tag, typ, cnt) + val
    return ifd + struct.pack(bo + "I", 0) + blob


def build_exif(
    orientation: int,
    make: str,
    model: str,
    datetime_s: str,
    pixel_x: int,
    pixel_y: int,
    byte_order: str = "<",
) -> bytes:
    """Build the TIFF block of an EXIF APP1 payload: IFD0 with
    Make/Model/Orientation/DateTime and the Exif-IFD pointer, then
    the Exif sub-IFD with PixelXDimension/PixelYDimension."""
    bo = byte_order
    if bo not in ("<", ">"):
        raise ValueError("byte_order must be '<' or '>'")

    def ascii_(tag, s):
        b = s.encode("ascii") + b"\x00"
        return (tag, 2, b, len(b))

    def short(tag, v):
        return (tag, 3, struct.pack(bo + "H", v), 1)

    def long_(tag, v):
        return (tag, 4, struct.pack(bo + "I", v), 1)

    ifd0_base = [
        ascii_(EXIF_MAKE, make),
        ascii_(EXIF_MODEL, model),
        short(EXIF_ORIENTATION, orientation),
        ascii_(EXIF_DATETIME, datetime_s),
    ]
    ifd0_at = 8
    probe = _pack_ifd(bo, ifd0_base + [long_(EXIF_IFD_POINTER, 0)],
                      ifd0_at)
    sub_at = ifd0_at + len(probe)
    ifd0 = _pack_ifd(
        bo, ifd0_base + [long_(EXIF_IFD_POINTER, sub_at)], ifd0_at
    )
    sub = _pack_ifd(
        bo,
        [long_(EXIF_PIXEL_X, pixel_x), long_(EXIF_PIXEL_Y, pixel_y)],
        sub_at,
    )
    header = struct.pack(bo + "2sHI", b"II" if bo == "<" else b"MM",
                         42, 8)
    return header + ifd0 + sub


def _ifd_tags(payload: bytes, bo: str, ifd_off: int) -> dict:
    """{tag: (typ, cnt, val_bytes)} of the IFD at ifd_off."""
    if ifd_off + 2 > len(payload):
        raise ValueError("IFD offset beyond block")
    (n,) = struct.unpack(bo + "H", payload[ifd_off : ifd_off + 2])
    tags = {}
    pos = ifd_off + 2
    for _ in range(n):
        tag, typ, cnt = struct.unpack(bo + "HHI", payload[pos : pos + 8])
        tags[tag] = (typ, cnt, payload[pos + 8 : pos + 12])
        pos += 12
    return tags


def parse_exif(block: bytes) -> dict:
    """Parse an EXIF TIFF block (as carried after 'Exif\\x00\\x00' in
    JPEG APP1): IFD0 fields + the Exif sub-IFD pixel dimensions.
    Missing fields come back None; a malformed block raises."""
    if block[:4] == b"II*\x00":
        bo = "<"
    elif block[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF/EXIF block")
    (ifd_off,) = struct.unpack(bo + "I", block[4:8])
    tags = _ifd_tags(block, bo, ifd_off)

    def val(tags_, tag):
        if tag not in tags_:
            return None
        typ, cnt, vb = tags_[tag]
        got = _read_tag_values(bo, block, typ, cnt, vb)
        if typ == 2:
            return bytes(got).split(b"\x00", 1)[0].decode("ascii")
        return got[0] if got else None

    out = {
        "make": val(tags, EXIF_MAKE),
        "model": val(tags, EXIF_MODEL),
        "orientation": val(tags, EXIF_ORIENTATION),
        "datetime": val(tags, EXIF_DATETIME),
        "pixel_x": None,
        "pixel_y": None,
    }
    ptr = val(tags, EXIF_IFD_POINTER)
    if ptr is not None:
        sub = _ifd_tags(block, bo, int(ptr))
        out["pixel_x"] = val(sub, EXIF_PIXEL_X)
        out["pixel_y"] = val(sub, EXIF_PIXEL_Y)
    return out
