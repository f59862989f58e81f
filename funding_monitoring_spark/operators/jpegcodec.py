"""Pure-Python/numpy baseline JPEG codec (ITU-T T.81 / JFIF).

Why this exists: a training-data pipeline's images are overwhelmingly
JPEG, but this environment has no imaging library — and the engine's
policy is loud refusal over faked pixels. This module removes the
refusal for the dominant case: BASELINE sequential JPEG, 8-bit,
no chroma subsampling (4:4:4), the exact profile the engine's own
encoder emits (operators/multimodal.py encode_jpeg uses Pillow with
subsampling=0 when installed, this codec otherwise). Everything is
the public T.81 spec reduced to its sequential-DCT core:

- Encode: RGB -> JFIF YCbCr, 8x8 edge-padded blocks, orthonormal
  2-D DCT (one matmul pair per plane — numpy does all blocks at
  once), quality-scaled Annex-K quantization tables, zigzag,
  DC-differential + (run, size) AC symbols, canonical Huffman with
  FIXED-LENGTH code tables (4-bit DC, 8-bit AC — a legal JFIF
  stream declares its tables in DHT, so nothing requires the
  Annex-K defaults; fixed lengths cost a little compression and
  remove a transcription-error class), byte-stuffed entropy data.
- Decode: full marker parse (DQT/DHT/SOF0/DRI/SOS, APPn/COM
  skipped), arbitrary DHT tables (canonical reconstruction),
  restart markers, then dequantize -> IDCT -> level shift ->
  YCbCr -> RGB. Progressive (SOF2), 12-bit, arithmetic coding, and
  subsampled scans raise NotImplementedError with the reason —
  honest partial coverage, never garbage pixels.

The codec is deterministic (no library-version dependence), so the
lossy roundtrip oracle's fixed tolerance is stable by construction.

Scale note: this is a per-payload CPU codec invoked inside
Arrow-batched mapInPandas (operators/multimodal.py decode_image);
the Spark-side plumbing — binary columns, batch shapes, fan-out —
is identical whether the bytes go through Pillow or this fallback.
"""

from __future__ import annotations

import struct

import numpy as np

# --- tables ----------------------------------------------------------

#: Annex K.1/K.2 base quantization tables (row-major 8x8).
_QY_BASE = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
)
_QC_BASE = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
)

#: zigzag scan order: _ZIGZAG[k] = row-major index of the k-th
#: zigzag position (computed, not transcribed).
def _zigzag_order() -> np.ndarray:
    order = sorted(
        ((x, y) for x in range(8) for y in range(8)),
        key=lambda p: (
            p[0] + p[1],
            # odd anti-diagonals run top-right -> bottom-left
            # (row ascending), even ones the reverse (T.81 fig. 5)
            p[0] if (p[0] + p[1]) % 2 else p[1],
        ),
    )
    return np.array([x * 8 + y for x, y in order], dtype=np.int64)


_ZIGZAG = _zigzag_order()
_UNZIGZAG = np.argsort(_ZIGZAG)

#: orthonormal DCT-II matrix: F = _DCT @ f @ _DCT.T (T.81 A.3.3).
def _dct_matrix() -> np.ndarray:
    m = np.zeros((8, 8))
    for u in range(8):
        c = np.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            m[u, x] = c * np.cos((2 * x + 1) * u * np.pi / 16)
    return m


_DCT = _dct_matrix()


import functools


@functools.lru_cache(maxsize=16)
def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg-compatible quality scaling of the Annex-K tables
    (cached — callers must treat the returned arrays as read-only)."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (_QY_BASE, _QC_BASE):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int32))
    return out[0], out[1]


# --- fixed-length canonical Huffman tables ---------------------------

_DC_SYMBOLS = list(range(12))  # size categories 0..11, 4-bit codes
_AC_SYMBOLS = (
    [0x00]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    + [0xF0]
)  # EOB + 160 (run,size) + ZRL = 162 symbols, 8-bit codes


def _fixed_table(symbols: list[int], length: int) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length); canonical codes 0..n-1 at one length.
    Legal iff n <= 2^length - 1 (the all-ones code stays unused)."""
    assert len(symbols) <= (1 << length) - 1
    return {s: (i, length) for i, s in enumerate(symbols)}


_ENC_DC = _fixed_table(_DC_SYMBOLS, 4)
_ENC_AC = _fixed_table(_AC_SYMBOLS, 8)


def _dht_payload(table_class: int, table_id: int, enc: dict) -> bytes:
    """DHT body for a canonical table: 16 length counts + symbols in
    code order."""
    bits = [0] * 16
    in_order = sorted(enc.items(), key=lambda kv: (kv[1][1], kv[1][0]))
    for _sym, (_code, ln) in in_order:
        bits[ln - 1] += 1
    syms = bytes(sym for sym, _ in in_order)
    return bytes([(table_class << 4) | table_id] + bits) + syms


#: the four DHT bodies every stream declares — constant, built once
_DHT_PAYLOADS = (
    _dht_payload(0, 0, _ENC_DC),
    _dht_payload(1, 0, _ENC_AC),
    _dht_payload(0, 1, _ENC_DC),
    _dht_payload(1, 1, _ENC_AC),
)


# --- bit I/O ----------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        # drop emitted high bits — the accumulator must stay a small
        # int over an arbitrarily long stream
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # 1-padding per spec


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def _fill(self) -> None:
        # the caller's scan split already unstuffed FF00 -> FF and
        # removed markers, so every byte here is entropy data. The
        # accumulator is masked to its live bits so it stays a small
        # int over an arbitrarily long stream (reads only ever look
        # at the low _n bits).
        if self.pos >= len(self.data):
            raise EOFError("entropy data exhausted")
        self._acc = (
            ((self._acc & ((1 << self._n) - 1)) << 8)
            | self.data[self.pos]
        )
        self.pos += 1
        self._n += 8

    def read_bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        # bulk read: fill the accumulator to >= n bits, slice once
        # (the per-bit loop dominated the decode profile)
        while self._n < n:
            self._fill()
        self._n -= n
        return (self._acc >> self._n) & ((1 << n) - 1)


# --- encode -----------------------------------------------------------


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r = px[..., 0].astype(np.float64)
    g = px[..., 1].astype(np.float64)
    b = px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Edge-pad to 8-multiples and return (n_blocks, 8, 8) in MCU
    (row-major block) order plus the block grid dims."""
    h, w = plane.shape
    bh, bw = -(-h // 8), -(-w // 8)
    padded = np.pad(
        plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge"
    )
    blocks = (
        padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    return blocks, bh, bw


def _size_cat(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _amplitude(v: int, size: int) -> int:
    """One's-complement amplitude bits (T.81 F.1.2.1)."""
    return v if v >= 0 else v + (1 << size) - 1


def encode_baseline_jpeg(
    pixels: np.ndarray, quality: int = 95, restart_interval: int = 0
) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline 4:4:4 JFIF bytes.

    ``restart_interval`` > 0 emits a DRI segment and RSTn markers
    every that-many MCUs (byte-aligned, DC predictors reset) — the
    resynchronization feature real encoders use for error resilience
    and parallel decode; here it keeps the decoder's restart path
    honest instead of dead code."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_baseline_jpeg expects (h, w, 3) RGB")
    h, w = px.shape[:2]
    qy, qc = _quality_tables(quality)
    ycc = _rgb_to_ycbcr(px)

    # quantized zigzag coefficients per component, MCU order
    comp_coeffs = []
    for ci in range(3):
        blocks, _bh, _bw = _blocks(ycc[..., ci] - 128.0)
        coef = np.einsum("ux,nxy,vy->nuv", _DCT, blocks, _DCT)
        q = (qy if ci == 0 else qc).reshape(8, 8)
        quant = np.round(coef / q).astype(np.int64)
        comp_coeffs.append(quant.reshape(-1, 64)[:, _ZIGZAG])

    bw_ = _BitWriter()
    prev_dc = [0, 0, 0]
    n_mcu = comp_coeffs[0].shape[0]
    for mcu in range(n_mcu):
        if restart_interval and mcu and mcu % restart_interval == 0:
            # byte-align, then the marker goes in RAW (markers are
            # the one thing byte stuffing must not escape)
            bw_.flush()
            bw_.out += bytes(
                [0xFF, 0xD0 + ((mcu // restart_interval - 1) % 8)]
            )
            prev_dc = [0, 0, 0]
        for ci in range(3):
            zz = comp_coeffs[ci][mcu]
            diff = int(zz[0]) - prev_dc[ci]
            prev_dc[ci] = int(zz[0])
            s = _size_cat(diff)
            code, ln = _ENC_DC[s]
            bw_.write(code, ln)
            if s:
                bw_.write(_amplitude(diff, s), s)
            run = 0
            last_nz = int(np.nonzero(zz[1:])[0][-1]) + 1 if np.any(
                zz[1:]
            ) else 0
            for k in range(1, last_nz + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = _ENC_AC[0xF0]
                    bw_.write(code, ln)
                    run -= 16
                s = _size_cat(v)
                code, ln = _ENC_AC[(run << 4) | s]
                bw_.write(code, ln)
                bw_.write(_amplitude(v, s), s)
                run = 0
            if last_nz < 63:
                code, ln = _ENC_AC[0x00]
                bw_.write(code, ln)
    bw_.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(
        0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )  # APP0
    out += seg(0xFFDB, bytes([0]) + bytes(qy[_ZIGZAG].tolist()))
    out += seg(0xFFDB, bytes([1]) + bytes(qc[_ZIGZAG].tolist()))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += bytes([cid, 0x11, tq])  # H=1, V=1: 4:4:4
    out += seg(0xFFC0, sof)
    for payload_dht in _DHT_PAYLOADS:
        out += seg(0xFFC4, payload_dht)
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += seg(0xFFDA, sos)
    out += bw_.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decode -----------------------------------------------------------


def _build_decode_table(
    bits: list[int], vals: bytes
) -> tuple[int, dict[tuple[int, int], int]]:
    """(min_code_length, {(length, code) -> symbol}) from a DHT's
    canonical description. The min length lets the decoder grab that
    many bits in ONE bulk read before extending bit by bit — with
    this encoder's fixed-length tables every symbol resolves on the
    first probe."""
    table = {}
    code = 0
    k = 0
    min_len = 17
    for ln in range(1, 17):
        if bits[ln - 1]:
            min_len = min(min_len, ln)
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return (min_len if min_len < 17 else 1), table


def _read_symbol(br: _BitReader, tbl: tuple[int, dict]) -> int:
    min_len, table = tbl
    code = br.read_bits(min_len)
    if (min_len, code) in table:
        return table[(min_len, code)]
    for ln in range(min_len + 1, 17):
        code = (code << 1) | br.read_bit()
        if (ln, code) in table:
            return table[(ln, code)]
    raise ValueError("invalid Huffman code in entropy data")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(
        np.round(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)


def decode_baseline_jpeg(payload: bytes) -> np.ndarray:
    """Baseline sequential 4:4:4 JFIF bytes -> (h, w, 3) uint8 RGB.
    Raises NotImplementedError for progressive / 12-bit / subsampled
    streams and ValueError for malformed ones."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        # T.81 B.1.1.2: markers may be preceded by any number of
        # 0xFF fill bytes — skip padding before the marker id.
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        if pos + 2 > len(payload):
            raise ValueError("truncated JPEG segment header")
        (ln,) = struct.unpack_from(">H", payload, pos)
        if ln < 2:
            raise ValueError(f"malformed segment length {ln}")
        body = payload[pos + 2 : pos + ln]
        pos += ln
        if marker == 0xDB:  # DQT (possibly several tables)
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit DQT")
                t = np.zeros(64, dtype=np.int32)
                t[_ZIGZAG] = np.frombuffer(
                    body[o + 1 : o + 65], dtype=np.uint8
                )
                qtables[tq] = t
                o += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 0xF
                bits = list(body[o + 1 : o + 17])
                n = sum(bits)
                vals = body[o + 17 : o + 17 + n]
                htables[(tc, th)] = _build_decode_table(bits, vals)
                o += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                if hv != 0x11:
                    raise NotImplementedError(
                        "chroma-subsampled JPEG needs Pillow "
                        "(this fallback decodes 4:4:4 baseline only)"
                    )
                comps.append({"id": cid, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9,
                        0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02X}) "
                "needs Pillow"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = body[0]
            scan_sel = {}
            for i in range(ns):
                cs, tda = body[1 + 2 * i], body[2 + 2 * i]
                scan_sel[cs] = (tda >> 4, tda & 0xF)
            # split entropy-coded data: unstuff FF00, stop at a
            # non-RST marker; RSTn resets DC predictors
            data = bytearray()
            rst_breaks = []
            p = pos
            while p < len(payload) - 1:
                b = payload[p]
                if b != 0xFF:
                    data.append(b)
                    p += 1
                    continue
                nxt = payload[p + 1]
                if nxt == 0x00:
                    data.append(0xFF)
                    p += 2
                elif 0xD0 <= nxt <= 0xD7:
                    rst_breaks.append(len(data))
                    p += 2
                else:
                    break
            pos = p
            return _decode_scan(
                frame, scan_sel, qtables, htables, bytes(data),
                rst_breaks, restart_interval,
            )
        # else: APPn / COM / others — skipped
    raise ValueError("no SOS scan found")


def _decode_scan(
    frame: dict,
    scan_sel: dict,
    qtables: dict,
    htables: dict,
    data: bytes,
    rst_breaks: list[int],
    restart_interval: int,
) -> np.ndarray:
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    bh, bw_ = -(-h // 8), -(-w // 8)
    n_mcu = bh * bw_
    nc = len(comps)
    coeffs = [np.zeros((n_mcu, 64), dtype=np.int64) for _ in comps]
    br = _BitReader(data)
    prev_dc = [0] * nc
    mcu = 0
    seg = 0
    while mcu < n_mcu:
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg += 1
            if seg <= len(rst_breaks):
                br = _BitReader(data)
                br.pos = rst_breaks[seg - 1]
            prev_dc = [0] * nc
        for ci, comp in enumerate(comps):
            td, ta = scan_sel[comp["id"]]
            dct = htables.get((0, td))
            act = htables.get((1, ta))
            if dct is None or act is None:
                raise ValueError("scan references undefined DHT table")
            s = _read_symbol(br, dct)
            diff = _extend(br.read_bits(s), s) if s else 0
            prev_dc[ci] += diff
            zz = coeffs[ci][mcu]
            zz[0] = prev_dc[ci]
            k = 1
            while k <= 63:
                rs = _read_symbol(br, act)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r == 15:
                        k += 16
                        continue
                    break  # EOB
                k += r
                if k > 63:
                    raise ValueError("AC run past block end")
                zz[k] = _extend(br.read_bits(s), s)
                k += 1
        mcu += 1

    planes = []
    for ci, comp in enumerate(comps):
        q = qtables.get(comp["tq"])
        if q is None:
            raise ValueError("component references undefined DQT")
        # coeffs are zigzag-ordered; q was un-zigzagged at DQT parse,
        # so permute the coefficients to row-major and multiply by
        # the row-major table
        deq = (coeffs[ci][:, _UNZIGZAG] * q).reshape(
            -1, 8, 8
        ).astype(np.float64)
        # IDCT: f = D.T @ F @ D  ->  f[x,y] = sum D[u,x] F[u,v] D[v,y]
        spatial = np.einsum("ux,nuv,vy->nxy", _DCT, deq, _DCT)
        plane = (
            spatial.reshape(bh, bw_, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw_ * 8)
        )
        planes.append(plane[:h, :w] + 128.0)
    if nc == 3:
        return _ycbcr_to_rgb(np.stack(planes, axis=-1))
    if nc == 1:  # grayscale: replicate
        g = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    raise NotImplementedError(f"{nc}-component JPEG")
