"""GIF87a codec (indexed color, real LZW) — pure Python/numpy.

Rounds out the image-format family next to BMP (struct), PNG
(DEFLATE) and JPEG (DCT): GIF is the indexed-color + LZW corner of
the wire-format space, and its variable-width LSB-first code stream
is a genuinely different decode discipline from all three. Public
spec: CompuServe GIF87a (1987) / W3C GIF89a; the LZW variant is the
one every GIF reader implements.

Scope (honest partial coverage, same policy as the other codecs):
- single image, global color table, no interlace, no transparency;
- encoder emits GIF87a with a caller-supplied 256-color palette and
  real LZW (dictionary growth to 4096 with clear-code reset,
  variable code width 9->12);
- decoder handles arbitrary palette sizes, dictionary resets, and
  the deferred-clear convention; local-palette images
  raise NotImplementedError.

The pixel payload is INDEXED: encode takes an (h, w) uint8 index
array plus a (256, 3) palette; decode returns the reconstructed
(h, w, 3) RGB plus the raw indices — lossless, so roundtrip oracles
can hash exact channel statistics.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODE_WIDTH = 12
_DICT_LIMIT = 1 << _MAX_CODE_WIDTH  # 4096


class _LsbBitWriter:
    """LSB-first bit packer (GIF's order — opposite of JPEG's)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, width: int) -> None:
        self._acc |= (code & ((1 << width) - 1)) << self._n
        self._n += width
        while self._n >= 8:
            self.out.append(self._acc & 0xFF)
            self._acc >>= 8
            self._n -= 8

    def flush(self) -> None:
        if self._n:
            self.out.append(self._acc & 0xFF)
            self._acc = 0
            self._n = 0


class _LsbBitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def read(self, width: int) -> int:
        while self._n < width:
            if self.pos >= len(self.data):
                raise ValueError("LZW stream exhausted")
            self._acc |= self.data[self.pos] << self._n
            self.pos += 1
            self._n += 8
        v = self._acc & ((1 << width) - 1)
        self._acc >>= width
        self._n -= width
        return v


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    bw = _LsbBitWriter()

    def reset():
        return (
            {(i,): i for i in range(clear)},
            end + 1,
            min_code_size + 1,
        )

    table, next_code, width = reset()
    bw.write(clear, width)
    w: tuple = ()
    for k in indices:
        wk = w + (int(k),)
        if wk in table:
            w = wk
            continue
        bw.write(table[w], width)
        table[wk] = next_code
        next_code += 1
        # width grows when the NEXT code to assign no longer fits —
        # mirrored in the decoder, which grows when its next_code
        # hits 2^width
        if next_code > (1 << width) and width < _MAX_CODE_WIDTH:
            width += 1
        if next_code >= _DICT_LIMIT:
            bw.write(clear, width)
            table, next_code, width = reset()
        w = (int(k),)
    if w:
        bw.write(table[w], width)
    bw.write(end, width)
    bw.flush()
    return bytes(bw.out)


def _lzw_decode(
    data: bytes, min_code_size: int, n_pixels: int
) -> list[int]:
    clear = 1 << min_code_size
    end = clear + 1
    br = _LsbBitReader(data)
    out: list[int] = []
    table: list[tuple] = []
    width = min_code_size + 1
    prev: tuple | None = None

    def reset():
        nonlocal table, width, prev
        table = [(i,) for i in range(clear)] + [(), ()]
        width = min_code_size + 1
        prev = None

    reset()
    while len(out) < n_pixels:
        code = br.read(width)
        if code == clear:
            reset()
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            # deferred-clear convention: once the table is full the
            # encoder keeps using existing codes WITHOUT adding — the
            # decoder must stop adding too or the tables desync
            if len(table) < _DICT_LIMIT:
                table.append(prev + (entry[0],))
        elif code == len(table) and len(table) < _DICT_LIMIT:
            entry = prev + (prev[0],)  # the KwKwK case
            table.append(entry)
        else:
            raise ValueError(f"LZW code {code} out of range")
        if prev is not None and len(table) >= (1 << width) and (
            width < _MAX_CODE_WIDTH
        ):
            width += 1
        out.extend(entry)
        prev = entry
    return out[:n_pixels]


def encode_gif(indices, palette) -> bytes:
    """(h, w) uint8 index array + (n<=256, 3) palette -> GIF87a."""
    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    if idx.ndim != 2:
        raise ValueError("encode_gif expects an (h, w) index array")
    if pal.ndim != 2 or pal.shape[1] != 3 or len(pal) > 256:
        raise ValueError("palette must be (n<=256, 3)")
    if idx.size and int(idx.max()) >= len(pal):
        raise ValueError(
            f"pixel index {int(idx.max())} outside the "
            f"{len(pal)}-entry palette"
        )
    h, w = idx.shape
    # global color table size: smallest power of two >= len(pal), >= 2
    bits = max(1, int(np.ceil(np.log2(max(len(pal), 2)))))
    table = np.zeros((1 << bits, 3), dtype=np.uint8)
    table[: len(pal)] = pal
    min_code_size = max(2, bits)
    out = bytearray(b"GIF87a")
    out += struct.pack("<HH", w, h)
    out.append(0x80 | ((bits - 1) << 4) | (bits - 1))  # GCT present
    out += b"\x00\x00"  # bg index, aspect
    out += table.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out.append(min_code_size)
    lzw = _lzw_encode(idx.reshape(-1).tolist(), min_code_size)
    for lo in range(0, len(lzw), 255):
        chunk = lzw[lo : lo + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def decode_gif(payload: bytes):
    """GIF87a/89a bytes -> ((h, w, 3) uint8 RGB, (h, w) uint8
    indices). Single image with a global palette (interlaced rows
    are scattered back per App. E); 89a extension blocks are
    skipped."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh = struct.unpack_from("<HH", payload, 6)
    packed = payload[10]
    pos = 13
    if not packed & 0x80:
        raise NotImplementedError("GIF without a global color table")
    gct_n = 2 << (packed & 0x07)
    table = np.frombuffer(
        payload[pos : pos + 3 * gct_n], dtype=np.uint8
    ).reshape(-1, 3)
    pos += 3 * gct_n
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:  # 89a extension: label + sub-blocks, skipped
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:
            left, top, w, h = struct.unpack_from("<HHHH", payload, pos + 1)
            ipacked = payload[pos + 9]
            pos += 10
            if ipacked & 0x80:  # local color table overrides global
                lct_n = 2 << (ipacked & 0x07)
                table = np.frombuffer(
                    payload[pos : pos + 3 * lct_n], dtype=np.uint8
                ).reshape(-1, 3)
                pos += 3 * lct_n
            interlaced = bool(ipacked & 0x40)
            min_code_size = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                data += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = np.array(
                _lzw_decode(bytes(data), min_code_size, w * h),
                dtype=np.uint8,
            ).reshape(h, w)
            if interlaced:
                # GIF89a App. E: rows arrive in four passes
                # (every 8th from 0, every 8th from 4, every 4th
                # from 2, every 2nd from 1) — scatter back
                order = np.concatenate(
                    [
                        np.arange(0, h, 8),
                        np.arange(4, h, 8),
                        np.arange(2, h, 4),
                        np.arange(1, h, 2),
                    ]
                )
                deint = np.empty_like(idx)
                deint[order] = idx
                idx = deint
            if idx.max(initial=0) >= len(table):
                raise ValueError("pixel index outside the palette")
            return table[idx], idx
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b:02X}")
    raise ValueError("no image block in GIF stream")
