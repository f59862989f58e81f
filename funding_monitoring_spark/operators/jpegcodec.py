"""Pure-Python/numpy baseline JPEG codec (ITU-T T.81 / JFIF).

Why this exists: a training-data pipeline's images are overwhelmingly
JPEG, but this environment has no imaging library — and the engine's
policy is loud refusal over faked pixels. This module covers BASELINE
sequential JPEG, 8-bit, at 4:4:4, 4:2:2 and 4:2:0 chroma sampling —
4:4:4 is the profile the engine's own encoder emits
(operators/multimodal.py encode_jpeg uses Pillow with subsampling=0
when installed, this codec otherwise), and 4:2:0 is what real scraped
web corpora overwhelmingly contain. Everything is the public T.81
spec reduced to its sequential-DCT core:

- Encode: RGB -> JFIF YCbCr, optional chroma box-downsample, 8x8
  edge-padded blocks in MCU-interleaved order, orthonormal 2-D DCT
  (one einsum per plane — numpy does all blocks at once),
  quality-scaled Annex-K quantization tables, zigzag, DC-differential
  + (run, size) AC symbols, canonical Huffman with FIXED-LENGTH code
  tables (4-bit DC, 8-bit AC — a legal JFIF stream declares its
  tables in DHT, so nothing requires the Annex-K defaults; fixed
  lengths cost a little compression and remove a transcription-error
  class), byte-stuffed entropy data. The whole entropy stage is
  vectorized: (run, size) tokens are built with numpy index algebra
  across every block at once and bit-packed via np.packbits — no
  per-coefficient Python loop.
- Decode: full marker parse (DQT/DHT/SOF0/SOF1/SOF2/DRI/SOS,
  APPn/COM skipped), arbitrary DHT tables via a cached 16-bit prefix
  LUT (one list index resolves any code), arbitrary sampling factors
  with integer ratios (1/2/4 — covers 4:4:4, 4:2:2, 4:2:0), restart
  markers, then dequantize -> IDCT -> level shift -> chroma
  replication upsample -> YCbCr -> RGB. PROGRESSIVE (SOF2) streams
  decode for real too — the full Annex-G scan machinery: spectral
  selection, successive approximation (DC and AC refinement with
  correction bits), EOB-run coding, interleaved and single-component
  scans (this file also carries a progressive ENCODER emitting the
  standard 10-scan script, so the roundtrip is exactly testable:
  progressive is a reordering of the same quantized coefficients,
  and its decode equals the baseline decode bit-for-bit). 12-BIT
  precision decodes via SOF1 (extended sequential): 16-bit DQT
  entries, 2048 level shift, /16 reduction to the 8-bit output
  contract — with encode_jpeg12 as the writer half. Arithmetic
  coding, hierarchical, 12-bit progressive, and fractional sampling
  ratios raise NotImplementedError with the reason — honest partial
  coverage, never garbage pixels.

The codec is deterministic (no library-version dependence), so the
lossy roundtrip oracle's fixed tolerance is stable by construction.

Scale note: this is a per-payload CPU codec invoked inside
Arrow-batched mapInPandas (operators/multimodal.py decode_image);
the Spark-side plumbing — binary columns, batch shapes, fan-out —
is identical whether the bytes go through Pillow or this fallback.
"""

from __future__ import annotations

import functools
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
    # EOBn symbols (r<<4, r=1..14) — used only by progressive scans
    # (EOB-run coding, T.81 G.1.2.2); appended last so the baseline
    # symbols keep their canonical codes
    + [r << 4 for r in range(1, 15)]
)  # EOB + 160 (run,size) + ZRL + 14 EOBn = 176 symbols, 8-bit codes


def _fixed_table(symbols: list[int], length: int) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length); canonical codes 0..n-1 at one length.
    Legal iff n <= 2^length - 1 (the all-ones code stays unused)."""
    assert len(symbols) <= (1 << length) - 1
    return {s: (i, length) for i, s in enumerate(symbols)}


_ENC_DC = _fixed_table(_DC_SYMBOLS, 4)
_ENC_AC = _fixed_table(_AC_SYMBOLS, 8)

#: extended-sequential (SOF1, 12-bit) tables: DC categories reach 13
#: and AC sizes 14 at 12-bit amplitudes, beyond the baseline symbol
#: sets — same canonical fixed-length construction, own DHT payloads
_DC_SYMBOLS_12 = list(range(16))  # categories 0..15, 5-bit codes
_AC_SYMBOLS_12 = (
    [0x00]
    + [(r << 4) | s for r in range(16) for s in range(1, 15)]
    + [0xF0]
)  # EOB + 224 (run,size) + ZRL = 226 symbols, 8-bit codes
_ENC_DC_12 = _fixed_table(_DC_SYMBOLS_12, 5)
_ENC_AC_12 = _fixed_table(_AC_SYMBOLS_12, 8)

#: numpy views of the fixed tables for the vectorized token builder
_DC_CODES = np.array([_ENC_DC[s][0] for s in range(12)], dtype=np.int64)
_AC_CODES = np.zeros(256, dtype=np.int64)
for _sym, (_code, _ln) in _ENC_AC.items():
    _AC_CODES[_sym] = _code
_EOB_CODE, _ZRL_CODE = _ENC_AC[0x00][0], _ENC_AC[0xF0][0]
_DC_CODES_12 = np.array(
    [_ENC_DC_12[s][0] for s in range(16)], dtype=np.int64
)
_AC_CODES_12 = np.zeros(256, dtype=np.int64)
for _sym, (_code, _ln) in _ENC_AC_12.items():
    _AC_CODES_12[_sym] = _code

#: |value| -> size category (bit_length); 8-bit baseline DC
#: differentials are bounded by 2048 and AC by 1024; 12-bit extended
#: (quant tables clipped >= 4) by 8192 / 4096 — 16384 covers all.
_SIZE_LUT = np.zeros(16384, dtype=np.int64)
for _i in range(1, 16384):
    _SIZE_LUT[_i] = _i.bit_length()


def _dht_payload(table_class: int, table_id: int, enc: dict) -> bytes:
    """DHT body for a canonical table: 16 length counts + symbols in
    code order."""
    bits = [0] * 16
    in_order = sorted(enc.items(), key=lambda kv: (kv[1][1], kv[1][0]))
    for _sym2, (_code2, ln) in in_order:
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

#: (H, V) per component (Y, Cb, Cr) for each supported subsampling
_SUBSAMPLING_HV = {
    "444": ((1, 1), (1, 1), (1, 1)),
    "422": ((2, 1), (1, 1), (1, 1)),
    "420": ((2, 2), (1, 1), (1, 1)),
}


# --- encode -----------------------------------------------------------


def _rgb_to_ycbcr(px: np.ndarray, offset: float = 128.0) -> np.ndarray:
    r = px[..., 0].astype(np.float64)
    g = px[..., 1].astype(np.float64)
    b = px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + offset
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + offset
    return np.stack([y, cb, cr], axis=-1)


def _downsample(plane: np.ndarray, fy: int, fx: int) -> np.ndarray:
    """Box-mean chroma downsample by integer factors (edge-padded)."""
    if fy == 1 and fx == 1:
        return plane
    h, w = plane.shape
    ph, pw = -(-h // fy) * fy, -(-w // fx) * fx
    p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return p.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))


def _mcu_order_blocks(
    plane: np.ndarray, mcuy: int, mcux: int, v: int, hh: int
) -> np.ndarray:
    """Edge-pad a component plane to its MCU grid and return its 8x8
    blocks in MCU-interleaved scan order: for each MCU (raster), the
    component's v*hh blocks in raster sub-order (T.81 A.2.3)."""
    ph, pw = mcuy * v * 8, mcux * hh * 8
    p = np.pad(
        plane,
        ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
        mode="edge",
    )
    return (
        p.reshape(mcuy, v, 8, mcux, hh, 8)
        .transpose(0, 3, 1, 4, 2, 5)
        .reshape(-1, 8, 8)
    )


def _entropy_tokens(
    zz: np.ndarray,
    dc_diff: np.ndarray,
    bids: np.ndarray,
    dc_codes: np.ndarray = _DC_CODES,
    dc_len: int = 4,
    ac_codes: np.ndarray = _AC_CODES,
    ac_len: int = 8,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized (code, bit-length) token stream for a set of
    blocks. ``zz`` is (M, 64) quantized zigzag coefficients,
    ``dc_diff`` the per-block DC differential, ``bids`` each block's
    global scan position. Returns (codes, lengths, bids_per_token)
    sorted to scan order. The encoder's DC/AC code tables are
    identical for both table ids, so tokens don't depend on the
    component; the table arguments select the baseline (default) or
    the 12-bit extended fixed-length tables."""
    m = zz.shape[0]
    s_dc = _SIZE_LUT[np.abs(dc_diff)]
    amp_dc = np.where(dc_diff >= 0, dc_diff, dc_diff + (1 << s_dc) - 1)
    tok_b = [bids, bids]
    tok_k = [np.zeros(m, np.int64), np.ones(m, np.int64)]
    tok_c = [dc_codes[s_dc], amp_dc]
    tok_l = [np.full(m, dc_len, np.int64), s_dc]

    ac = zz[:, 1:]
    bi, kj = np.nonzero(ac)
    if len(bi):
        ki = kj + 1  # zigzag position 1..63
        v = ac[bi, kj]
        first = np.r_[True, bi[1:] != bi[:-1]]
        prev = np.where(first, 0, np.r_[0, ki[:-1]])
        run = ki - prev - 1
        n_zrl = run >> 4
        rem = run & 15
        s = _SIZE_LUT[np.abs(v)]
        amp = np.where(v >= 0, v, v + (1 << s) - 1)
        # ZRL tokens (16-zero runs) precede their (run, size) symbol
        zb = np.repeat(bi, n_zrl)
        zk = np.repeat(3 * ki, n_zrl)
        tok_b += [bids[zb], bids[bi], bids[bi]]
        tok_k += [zk, 3 * ki + 1, 3 * ki + 2]
        tok_c += [
            np.full(len(zb), ac_codes[0xF0], np.int64),
            ac_codes[(rem << 4) | s],
            amp,
        ]
        tok_l += [
            np.full(len(zb), ac_len, np.int64),
            np.full(len(bi), ac_len, np.int64),
            s,
        ]
        last_nz = np.zeros(m, dtype=np.int64)
        np.maximum.at(last_nz, bi, ki)
    else:
        last_nz = np.zeros(m, dtype=np.int64)
    eob = np.flatnonzero(last_nz < 63)
    tok_b.append(bids[eob])
    tok_k.append(np.full(len(eob), 3 * 64 + 2, np.int64))
    tok_c.append(np.full(len(eob), ac_codes[0x00], np.int64))
    tok_l.append(np.full(len(eob), ac_len, np.int64))

    b = np.concatenate(tok_b)
    k = np.concatenate(tok_k)
    c = np.concatenate(tok_c)
    ln = np.concatenate(tok_l)
    order = np.lexsort((k, b))  # stable: ZRLs keep emission order
    return c[order], ln[order], b[order]


def _pack_tokens(codes: np.ndarray, lengths: np.ndarray) -> bytes:
    """Bit-pack (code, length) tokens MSB-first, 1-pad to a byte
    boundary (T.81 F.1.2.3), then byte-stuff 0xFF -> 0xFF 0x00."""
    total = int(lengths.sum())
    pad = (-total) % 8
    if pad:
        codes = np.append(codes, (1 << pad) - 1)
        lengths = np.append(lengths, pad)
    idx = np.repeat(np.arange(len(codes)), lengths)
    ends = np.cumsum(lengths)
    starts = ends - lengths
    offs = np.arange(ends[-1] if len(ends) else 0) - starts[idx]
    shift = lengths[idx] - 1 - offs
    bits = ((codes[idx] >> shift) & 1).astype(np.uint8)
    by = np.packbits(bits)
    ff = np.flatnonzero(by == 0xFF)
    if len(ff):
        by = np.insert(by, ff + 1, 0)
    return by.tobytes()


def encode_baseline_jpeg(
    pixels: np.ndarray,
    quality: int = 95,
    restart_interval: int = 0,
    subsampling: str = "444",
) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JFIF bytes.

    ``subsampling`` is "444" (default — full-resolution chroma, the
    profile the roundtrip oracles fix their tolerance against),
    "422", or "420" (2x2 box-downsampled chroma, the dominant profile
    of real web corpora). ``restart_interval`` > 0 emits a DRI
    segment and RSTn markers every that-many MCUs (byte-aligned, DC
    predictors reset) — the resynchronization feature real encoders
    use for error resilience and parallel decode; here it keeps the
    decoder's restart path honest instead of dead code."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_baseline_jpeg expects (h, w, 3) RGB")
    if subsampling not in _SUBSAMPLING_HV:
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    hv = _SUBSAMPLING_HV[subsampling]
    hmax = max(c[0] for c in hv)
    vmax = max(c[1] for c in hv)
    h, w = px.shape[:2]
    mcuy, mcux = -(-h // (8 * vmax)), -(-w // (8 * hmax))
    n_mcu = mcuy * mcux
    qy, qc = _quality_tables(quality)
    ycc = _rgb_to_ycbcr(px)

    per_mcu = [ch * cv for ch, cv in hv]
    n_units = sum(per_mcu)
    unit_off = np.cumsum([0] + per_mcu[:-1])

    all_zz, all_diff, all_bids = [], [], []
    for ci in range(3):
        ch_, cv = hv[ci]
        plane = _downsample(
            ycc[..., ci] - 128.0, vmax // cv, hmax // ch_
        )
        blocks = _mcu_order_blocks(plane, mcuy, mcux, cv, ch_)
        coef = _DCT @ blocks @ _DCT.T  # batched BLAS, all blocks at once
        q = (qy if ci == 0 else qc).reshape(8, 8)
        zz = (
            np.round(coef / q).astype(np.int64).reshape(-1, 64)[:, _ZIGZAG]
        )
        dc = zz[:, 0]
        npb = per_mcu[ci]
        j = np.arange(len(dc))
        diff = np.empty_like(dc)
        diff[0] = dc[0]
        if len(dc) > 1:
            diff[1:] = dc[1:] - dc[:-1]
        if restart_interval:
            seg = (j // npb) // restart_interval
            seg_start = np.r_[True, seg[1:] != seg[:-1]]
            diff[seg_start] = dc[seg_start]
        all_zz.append(zz)
        all_diff.append(diff)
        all_bids.append(n_units * (j // npb) + unit_off[ci] + (j % npb))

    codes, lengths, bids = _entropy_tokens(
        np.concatenate(all_zz),
        np.concatenate(all_diff),
        np.concatenate(all_bids),
    )
    if restart_interval:
        mcu_of_tok = bids // n_units
        seg_of_tok = mcu_of_tok // restart_interval
        n_seg = (n_mcu - 1) // restart_interval + 1
        bounds = np.searchsorted(
            seg_of_tok, np.arange(1, n_seg), side="left"
        )
        parts = np.split(np.arange(len(codes)), bounds)
        body = bytearray()
        for si, part in enumerate(parts):
            if si:
                body += bytes([0xFF, 0xD0 + ((si - 1) % 8)])
            body += _pack_tokens(codes[part], lengths[part])
        entropy = bytes(body)
    else:
        entropy = _pack_tokens(codes, lengths)

    def seg_(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg_(
        0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )  # APP0
    out += seg_(0xFFDB, bytes([0]) + bytes(qy[_ZIGZAG].tolist()))
    out += seg_(0xFFDB, bytes([1]) + bytes(qc[_ZIGZAG].tolist()))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for ci, (cid, tq) in enumerate(((1, 0), (2, 1), (3, 1))):
        sof += bytes([cid, (hv[ci][0] << 4) | hv[ci][1], tq])
    out += seg_(0xFFC0, sof)
    for payload_dht in _DHT_PAYLOADS:
        out += seg_(0xFFC4, payload_dht)
    if restart_interval:
        out += seg_(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += seg_(0xFFDA, sos)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_multiscan_jpeg(
    pixels: np.ndarray,
    quality: int = 95,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 3) uint8 RGB -> NON-INTERLEAVED (multi-scan) sequential
    baseline JFIF bytes: the same SOF0 frame as encode_baseline_jpeg
    but with one SOS segment per component (Ns = 1), each coding the
    component's blocks in raster order over its OWN 8x8 block grid
    (T.81 B.2.3 — no MCU padding, per-scan DC predictors). This is a
    legal sequential shape real scraped corpora contain (encoders
    with custom scan scripts emit it), and it exercises the decoder's
    cross-scan coefficient accumulator.

    Every block intersecting the visible image carries exactly the
    same quantized coefficients as the interleaved encoding at the
    same quality/subsampling (per-block DCT + quantization are scan-
    order independent; only the DC differentials re-baseline), so
    decode(multiscan) == decode(baseline) pixel-for-pixel — the
    tolerance-free fixture contract, same pattern as progressive."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_multiscan_jpeg expects (h, w, 3) RGB")
    if subsampling not in _SUBSAMPLING_HV:
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    hv = _SUBSAMPLING_HV[subsampling]
    hmax = max(c[0] for c in hv)
    vmax = max(c[1] for c in hv)
    h, w = px.shape[:2]
    qy, qc = _quality_tables(quality)
    ycc = _rgb_to_ycbcr(px)

    scans = []
    for ci in range(3):
        ch_, cv = hv[ci]
        plane = _downsample(
            ycc[..., ci] - 128.0, vmax // cv, hmax // ch_
        )
        cbh, cbw = -(-plane.shape[0] // 8), -(-plane.shape[1] // 8)
        p = np.pad(
            plane,
            ((0, cbh * 8 - plane.shape[0]), (0, cbw * 8 - plane.shape[1])),
            mode="edge",
        )
        blocks = (
            p.reshape(cbh, 8, cbw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        )
        coef = _DCT @ blocks @ _DCT.T
        q = (qy if ci == 0 else qc).reshape(8, 8)
        zz = (
            np.round(coef / q).astype(np.int64).reshape(-1, 64)[:, _ZIGZAG]
        )
        dc = zz[:, 0]
        diff = np.empty_like(dc)
        diff[0] = dc[0]
        if len(dc) > 1:
            diff[1:] = dc[1:] - dc[:-1]
        j = np.arange(len(dc), dtype=np.int64)
        if restart_interval:
            # restart groups are DATA UNITS in a non-interleaved
            # scan: absolute DC at each segment start
            seg = j // restart_interval
            seg_start = np.r_[True, seg[1:] != seg[:-1]]
            diff[seg_start] = dc[seg_start]
        codes, lengths, bids = _entropy_tokens(zz, diff, j)
        if restart_interval:
            n_seg = (len(dc) - 1) // restart_interval + 1
            bounds = np.searchsorted(
                bids // restart_interval, np.arange(1, n_seg), "left"
            )
            parts = np.split(np.arange(len(codes)), bounds)
            body = bytearray()
            for si, part in enumerate(parts):
                if si:
                    body += bytes([0xFF, 0xD0 + ((si - 1) % 8)])
                body += _pack_tokens(codes[part], lengths[part])
            scans.append(bytes(body))
        else:
            scans.append(_pack_tokens(codes, lengths))

    def seg_(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg_(
        0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )  # APP0
    out += seg_(0xFFDB, bytes([0]) + bytes(qy[_ZIGZAG].tolist()))
    out += seg_(0xFFDB, bytes([1]) + bytes(qc[_ZIGZAG].tolist()))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for ci, (cid, tq) in enumerate(((1, 0), (2, 1), (3, 1))):
        sof += bytes([cid, (hv[ci][0] << 4) | hv[ci][1], tq])
    out += seg_(0xFFC0, sof)
    for payload_dht in _DHT_PAYLOADS:
        out += seg_(0xFFC4, payload_dht)
    if restart_interval:
        out += seg_(0xFFDD, struct.pack(">H", restart_interval))
    for ci, (cid, tda) in enumerate(((1, 0x00), (2, 0x11), (3, 0x11))):
        out += seg_(0xFFDA, bytes([1, cid, tda, 0, 63, 0]))
        out += scans[ci]
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg12(
    pixels: np.ndarray, quality: int = 95
) -> bytes:
    """(h, w, 3) uint16 RGB with 12-bit samples (0..4095) ->
    extended-sequential (SOF1) JFIF bytes at 12-bit precision:
    16-bit quantization tables (DQT Pq=1, the Annex-K tables scaled
    x16 so quality is comparable to the 8-bit encoder, clipped to a
    minimum of 4 which bounds quantized DC differentials under 2^13
    and AC sizes under 14 — inside the extended fixed-length Huffman
    tables), 2048 level shift, 4:4:4 chroma. T.81 restricts BASELINE
    (SOF0) to 8-bit samples; 12-bit rides SOF1 with Huffman coding,
    which is exactly this wire format."""
    px = np.asarray(pixels, dtype=np.uint16)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_jpeg12 expects (h, w, 3) RGB")
    if int(px.max(initial=0)) > 4095:
        raise ValueError("12-bit samples must be in 0..4095")
    h, w = px.shape[:2]
    mcuy, mcux = -(-h // 8), -(-w // 8)
    qy8, qc8 = _quality_tables(quality)
    qy = np.clip(qy8.astype(np.int64) * 16, 4, 65535)
    qc = np.clip(qc8.astype(np.int64) * 16, 4, 65535)
    ycc = _rgb_to_ycbcr(px, offset=2048.0)

    all_zz, all_diff, all_bids = [], [], []
    for ci in range(3):
        blocks = _mcu_order_blocks(
            ycc[..., ci] - 2048.0, mcuy, mcux, 1, 1
        )
        coef = _DCT @ blocks @ _DCT.T
        q = (qy if ci == 0 else qc).reshape(8, 8)
        zz = (
            np.round(coef / q).astype(np.int64).reshape(-1, 64)[:, _ZIGZAG]
        )
        dc = zz[:, 0]
        j = np.arange(len(dc))
        diff = np.empty_like(dc)
        diff[0] = dc[0]
        if len(dc) > 1:
            diff[1:] = dc[1:] - dc[:-1]
        all_zz.append(zz)
        all_diff.append(diff)
        all_bids.append(3 * j + ci)

    codes, lengths, _bids = _entropy_tokens(
        np.concatenate(all_zz),
        np.concatenate(all_diff),
        np.concatenate(all_bids),
        dc_codes=_DC_CODES_12,
        dc_len=5,
        ac_codes=_AC_CODES_12,
        ac_len=8,
    )
    entropy = _pack_tokens(codes, lengths)

    def seg_(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dqt16(tq: int, t: np.ndarray) -> bytes:
        return bytes([(1 << 4) | tq]) + t[_ZIGZAG].astype(
            ">u2"
        ).tobytes()

    out = bytearray(b"\xff\xd8")
    out += seg_(
        0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    out += seg_(0xFFDB, dqt16(0, qy))
    out += seg_(0xFFDB, dqt16(1, qc))
    sof = struct.pack(">BHHB", 12, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += bytes([cid, 0x11, tq])
    out += seg_(0xFFC1, sof)  # SOF1: extended sequential, Huffman
    out += seg_(0xFFC4, _dht_payload(0, 0, _ENC_DC_12))
    out += seg_(0xFFC4, _dht_payload(1, 0, _ENC_AC_12))
    out += seg_(0xFFC4, _dht_payload(0, 1, _ENC_DC_12))
    out += seg_(0xFFC4, _dht_payload(1, 1, _ENC_AC_12))
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += seg_(0xFFDA, sos)
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


# --- decode -----------------------------------------------------------


@functools.lru_cache(maxsize=64)
def _lut_from_dht(bits: tuple, vals: bytes) -> list:
    """16-bit prefix lookup list for a canonical DHT: peeking 16 bits
    and indexing resolves ANY code in one probe — entry is
    (symbol << 5) | code_length, 0 = invalid. Cached on the table
    description because a media column decodes thousands of streams
    sharing identical tables."""
    lut = np.zeros(1 << 16, dtype=np.int32)
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            base = code << (16 - ln)
            lut[base : base + (1 << (16 - ln))] = (vals[k] << 5) | ln
            code += 1
            k += 1
        code <<= 1
    return lut.tolist()


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


def _split_entropy(payload: bytes, pos: int):
    """Unstuff one scan's entropy-coded data starting at ``pos``:
    FF00 -> FF, RSTn markers removed (break offsets recorded), stop
    at any other marker. Vectorized — only 0xFF positions (rare) are
    inspected in Python. Returns (data, rst_breaks, new_pos)."""
    tail = np.frombuffer(payload, dtype=np.uint8, offset=pos)
    ffs = np.flatnonzero(tail == 0xFF)
    drop = []
    rst_at = []
    end = len(tail)
    for fi in ffs.tolist():
        if fi + 1 >= len(tail):
            continue
        nxt = tail[fi + 1]
        if nxt == 0x00:
            drop.append(fi + 1)
        elif 0xD0 <= nxt <= 0xD7:
            drop += [fi, fi + 1]
            rst_at.append(fi)
        else:
            end = fi
            break
    keep = np.ones(end, dtype=bool)
    drop_arr = np.array([d for d in drop if d < end], dtype=np.int64)
    keep[drop_arr] = False
    data = tail[:end][keep].tobytes()
    n_dropped_before = np.searchsorted(drop_arr, rst_at)
    rst_breaks = [
        r - int(nd) for r, nd in zip(rst_at, n_dropped_before)
    ]
    return data, rst_breaks, pos + end


def decode_baseline_jpeg(payload: bytes) -> np.ndarray:
    """Sequential (SOF0/SOF1, 8- or 12-bit) or progressive (SOF2)
    JFIF bytes -> (h, w, 3) uint8 RGB. Handles arbitrary DHT tables,
    restart markers, integer-ratio sampling factors (4:4:4 / 4:2:2 /
    4:2:0), 16-bit DQT entries, and for progressive streams the full
    Annex-G scan machinery (spectral selection, successive
    approximation, EOB runs). Raises NotImplementedError for
    arithmetic / hierarchical / 12-bit-progressive /
    fractional-ratio streams and ValueError for malformed ones."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], list] = {}
    frame = None
    pstate = None  # progressive coefficient state across scans
    sstate = None  # multi-scan sequential coefficient state
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
                t = np.zeros(64, dtype=np.int32)
                if pq:  # 16-bit entries (12-bit precision streams)
                    t[_ZIGZAG] = np.frombuffer(
                        body[o + 1 : o + 129], dtype=">u2"
                    ).astype(np.int32)
                    o += 129
                else:
                    t[_ZIGZAG] = np.frombuffer(
                        body[o + 1 : o + 65], dtype=np.uint8
                    )
                    o += 65
                qtables[tq] = t
        elif marker == 0xC4:  # DHT (possibly several tables)
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 0xF
                bits = tuple(body[o + 1 : o + 17])
                n = sum(bits)
                vals = bytes(body[o + 17 : o + 17 + n])
                htables[(tc, th)] = _lut_from_dht(bits, vals)
                o += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):
            # SOF0 baseline / SOF1 extended sequential / SOF2
            # progressive — all Huffman DCT frames
            prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            if marker == 0xC0 and prec != 8:
                raise ValueError(
                    "baseline (SOF0) frames are 8-bit by definition"
                )
            if marker == 0xC1 and prec not in (8, 12):
                raise ValueError(f"illegal SOF1 precision {prec}")
            if marker == 0xC2 and prec != 8:
                raise NotImplementedError(
                    "12-bit progressive JPEG (the successive-"
                    "approximation state is 8-bit-tuned here)"
                )
            comps = []
            for i in range(nc):
                cid, hvb, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hvb >> 4, "v": hvb & 0xF, "tq": tq}
                )
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            for c in comps:
                if (
                    c["h"] not in (1, 2, 4)
                    or c["v"] not in (1, 2, 4)
                    or hmax % c["h"]
                    or vmax % c["v"]
                ):
                    raise NotImplementedError(
                        f"sampling factors {c['h']}x{c['v']} "
                        "(non-integer chroma ratio) need Pillow"
                    )
            frame = {
                "h": fh,
                "w": fw,
                "comps": comps,
                "progressive": marker == 0xC2,
                "prec": prec,
            }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9,
                        0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02X}) "
                "needs Pillow"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan_sel = {}
            scan_comps = []
            for i in range(ns):
                cs, tda = body[1 + 2 * i], body[2 + 2 * i]
                scan_sel[cs] = (tda >> 4, tda & 0xF)
                scan_comps.append(cs)
            data, rst_breaks, pos = _split_entropy(payload, pos)
            if not frame["progressive"]:
                if sstate is None and len(scan_comps) == len(
                    frame["comps"]
                ):
                    # the dominant single-interleaved-scan shape:
                    # decode with the inlined fast path and return
                    return _decode_scan(
                        frame, scan_sel, qtables, htables, data,
                        rst_breaks, restart_interval,
                    )
                # multi-scan (non-interleaved) sequential: a legal
                # SOF0/SOF1 stream may split components across
                # several SOS segments — accumulate per-component
                # coefficients across scans, reconstruct at EOI
                if sstate is None:
                    sstate = _seq_state(frame)
                _sequential_scan(
                    frame, scan_comps, scan_sel, htables, data,
                    rst_breaks, restart_interval, sstate,
                )
                continue
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            if pstate is None:
                pstate = _progressive_state(frame)
            _progressive_scan(
                frame, pstate, scan_comps, scan_sel, htables, data,
                rst_breaks, restart_interval,
                ss, se, ahal >> 4, ahal & 0xF,
            )
        # else: APPn / COM / others — skipped
    if frame is not None and frame.get("progressive") and pstate:
        return _reassemble_progressive(frame, pstate, qtables)
    if sstate is not None:
        missing = [
            frame["comps"][ci]["id"]
            for ci, ok in enumerate(sstate["coded"])
            if not ok
        ]
        if missing:
            raise ValueError(
                f"sequential frame incomplete: components {missing} "
                "never coded by any scan"
            )
        return _reassemble_sequential(frame, sstate["coeffs"], qtables)
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
    nc = len(comps)
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcuy, mcux = -(-h // (8 * vmax)), -(-w // (8 * hmax))
    n_mcu = mcuy * mcux
    # flat Python lists during the sequential scan (list setitem is
    # ~4x cheaper than a numpy scalar setitem); one np.array at the end
    coeffs = [[0] * (n_mcu * c["h"] * c["v"] * 64) for c in comps]
    # one entry per block of an MCU: (component index, DC LUT, AC LUT)
    if any(c["id"] not in scan_sel for c in comps):
        # a legal SOF0 stream may split components across several SOS
        # segments (non-interleaved sequential); this decoder reads a
        # single interleaved scan only — refuse loudly, not KeyError
        raise NotImplementedError(
            "multi-scan (non-interleaved) sequential JPEG"
        )
    units: list[tuple[int, list, list]] = []
    for ci, comp in enumerate(comps):
        td, ta = scan_sel[comp["id"]]
        dct = htables.get((0, td))
        act = htables.get((1, ta))
        if dct is None or act is None:
            raise ValueError("scan references undefined DHT table")
        units += [(ci, dct, act)] * (comp["h"] * comp["v"])

    # inlined MSB-first bit reader over `data` — local ints only.
    # Reads past the end consume virtual zero bytes; legitimate
    # overrun is bounded by the final <16-bit peek + pad, anything
    # more means the stream was truncated (checked after the loop).
    dlen = len(data)
    pos = 0
    acc = 0
    nb = 0
    prev_dc = [0] * nc
    blk = [0] * nc
    seg = 0
    for mcu in range(n_mcu):
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg += 1
            if seg <= len(rst_breaks):
                pos = rst_breaks[seg - 1]
                acc = 0
                nb = 0
            prev_dc = [0] * nc
        for ci, dct, act in units:
            zz = coeffs[ci]
            base = blk[ci] * 64
            blk[ci] += 1
            # DC: one LUT probe + amplitude bits
            while nb < 16:
                acc = (acc << 8) | (data[pos] if pos < dlen else 0)
                pos += 1
                nb += 8
            e = dct[(acc >> (nb - 16)) & 0xFFFF]
            if not e:
                raise ValueError("invalid Huffman code in entropy data")
            nb -= e & 31
            s = e >> 5
            if s:
                while nb < s:
                    acc = (acc << 8) | (data[pos] if pos < dlen else 0)
                    pos += 1
                    nb += 8
                nb -= s
                bits_v = (acc >> nb) & ((1 << s) - 1)
                prev_dc[ci] += (
                    bits_v
                    if bits_v >= (1 << (s - 1))
                    else bits_v - (1 << s) + 1
                )
            zz[base] = prev_dc[ci]
            acc &= (1 << nb) - 1
            k = 1
            while k <= 63:
                while nb < 16:
                    acc = (acc << 8) | (data[pos] if pos < dlen else 0)
                    pos += 1
                    nb += 8
                e = act[(acc >> (nb - 16)) & 0xFFFF]
                if not e:
                    raise ValueError(
                        "invalid Huffman code in entropy data"
                    )
                nb -= e & 31
                rs = e >> 5
                s = rs & 0xF
                if s == 0:
                    if rs == 0xF0:
                        k += 16
                        continue
                    break  # EOB
                k += rs >> 4
                if k > 63:
                    raise ValueError("AC run past block end")
                while nb < s:
                    acc = (acc << 8) | (data[pos] if pos < dlen else 0)
                    pos += 1
                    nb += 8
                nb -= s
                bits_v = (acc >> nb) & ((1 << s) - 1)
                zz[base + k] = (
                    bits_v
                    if bits_v >= (1 << (s - 1))
                    else bits_v - (1 << s) + 1
                )
                k += 1
            acc &= (1 << nb) - 1
    if pos > dlen + 2:
        raise EOFError("entropy data exhausted")

    # convert MCU-interleaved block order to per-component raster
    # block order and share the reconstruction with the multi-scan
    # path (cost is one O(blocks) transpose, dwarfed by the entropy
    # decode above)
    raster = []
    for ci, comp in enumerate(comps):
        cv, ch_ = comp["v"], comp["h"]
        raster.append(
            np.array(coeffs[ci], dtype=np.int64)
            .reshape(mcuy, mcux, cv, ch_, 64)
            .transpose(0, 2, 1, 3, 4)
            .reshape(-1, 64)
        )
    return _reassemble_sequential(frame, raster, qtables)


def _reassemble_sequential(
    frame: dict, raster_coeffs: list[np.ndarray], qtables: dict
) -> np.ndarray:
    """Dequantize + IDCT + upsample + color-convert per-component
    zigzag coefficients given in RASTER block order over the padded
    MCU grid (rows = mcuy*v, cols = mcux*h blocks). Shared by the
    single-interleaved-scan fast path and the multi-scan accumulator."""
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    nc = len(comps)
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcuy, mcux = -(-h // (8 * vmax)), -(-w // (8 * hmax))
    planes = []
    for ci, comp in enumerate(comps):
        q = qtables.get(comp["tq"])
        if q is None:
            raise ValueError("component references undefined DQT")
        cv, ch_ = comp["v"], comp["h"]
        rows_b, cols_b = mcuy * cv, mcux * ch_
        # coeffs are zigzag-ordered; q was un-zigzagged at DQT parse,
        # so permute the coefficients to row-major and multiply by
        # the row-major table
        cf = np.asarray(raster_coeffs[ci], dtype=np.int64).reshape(
            -1, 64
        )
        deq = (cf[:, _UNZIGZAG] * q).reshape(-1, 8, 8).astype(
            np.float64
        )
        # IDCT: f = D.T @ F @ D  ->  f[x,y] = sum D[u,x] F[u,v] D[v,y]
        spatial = _DCT.T @ deq @ _DCT
        plane = (
            spatial.reshape(rows_b, cols_b, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(rows_b * 8, cols_b * 8)
        )
        comp_h = -(-h * cv // vmax)
        comp_w = -(-w * ch_ // hmax)
        prec = frame.get("prec", 8)
        # level shift at the frame precision, then reduce 12-bit
        # samples to the 8-bit output contract (/16, matching the
        # encoder's x16-scaled quantization tables)
        plane = plane[:comp_h, :comp_w] + (2048.0 if prec == 12 else 128.0)
        if prec == 12:
            plane = plane / 16.0
        fy, fx = vmax // cv, hmax // ch_
        if fy > 1 or fx > 1:  # chroma replication upsample
            plane = np.repeat(np.repeat(plane, fy, axis=0), fx, axis=1)
        planes.append(plane[:h, :w])
    if nc == 3:
        return _ycbcr_to_rgb(np.stack(planes, axis=-1))
    if nc == 1:  # grayscale: replicate
        g = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    raise NotImplementedError(f"{nc}-component JPEG")


def _seq_state(frame: dict) -> dict:
    """Cross-scan coefficient accumulator for multi-scan sequential
    frames: per component, a zigzag coefficient array in raster block
    order over the padded MCU grid (blocks outside a non-interleaved
    scan's component grid stay zero and are cropped away), plus a
    coded flag so an incomplete frame fails loudly at EOI."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcuy = -(-frame["h"] // (8 * vmax))
    mcux = -(-frame["w"] // (8 * hmax))
    return {
        "coeffs": [
            np.zeros((mcuy * c["v"] * mcux * c["h"], 64), np.int64)
            for c in comps
        ],
        "coded": [False] * len(comps),
    }


def _sequential_scan(
    frame: dict,
    scan_comps: list[int],
    scan_sel: dict,
    htables: dict,
    data: bytes,
    rst_breaks: list[int],
    restart_interval: int,
    sstate: dict,
) -> None:
    """Decode ONE scan of a multi-scan sequential (SOF0/SOF1) frame
    into the cross-scan accumulator. T.81 B.2.3: with Ns == 1 the
    data units are the component's blocks in raster order over ITS
    OWN block grid (ceil(comp_h/8) x ceil(comp_w/8) — no MCU
    padding); with Ns > 1 the scan is interleaved over the frame's
    MCU grid, h x v blocks per component per MCU. Restart intervals
    count data units (Ns == 1) or MCUs (Ns > 1). DC predictors are
    per scan. Uses the clarity-first bit reader — real corpora put
    the bulk of their bytes in single-scan streams, which keep the
    inlined fast path in _decode_scan."""
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcuy, mcux = -(-h // (8 * vmax)), -(-w // (8 * hmax))
    id2ci = {c["id"]: i for i, c in enumerate(comps)}
    try:
        cis = [id2ci[cs] for cs in scan_comps]
    except KeyError as exc:
        raise ValueError(f"scan references unknown component {exc}")

    luts = {}
    for ci in cis:
        td, ta = scan_sel[comps[ci]["id"]]
        dct = htables.get((0, td))
        act = htables.get((1, ta))
        if dct is None or act is None:
            raise ValueError("scan references undefined DHT table")
        luts[ci] = (dct, act)
        if sstate["coded"][ci]:
            raise ValueError(
                "component coded twice in a sequential frame"
            )
        sstate["coded"][ci] = True

    # one restart group = one MCU (interleaved) or one data unit
    # (non-interleaved); each group is [(comp index, raster block
    # index), ...]
    groups: list[list[tuple[int, int]]] = []
    if len(cis) == 1:
        ci = cis[0]
        comp = comps[ci]
        cols_b = mcux * comp["h"]
        comp_h = -(-h * comp["v"] // vmax)
        comp_w = -(-w * comp["h"] // hmax)
        cbh, cbw = -(-comp_h // 8), -(-comp_w // 8)
        groups = [
            [(ci, br_ * cols_b + bc)]
            for br_ in range(cbh)
            for bc in range(cbw)
        ]
    else:
        per_mcu = []
        for ci in cis:
            comp = comps[ci]
            cols_b = mcux * comp["h"]
            per_mcu.append((ci, comp["h"], comp["v"], cols_b))
        for my in range(mcuy):
            for mx in range(mcux):
                g = []
                for ci, ch_, cv, cols_b in per_mcu:
                    for by in range(cv):
                        for bx in range(ch_):
                            g.append(
                                (
                                    ci,
                                    (my * cv + by) * cols_b
                                    + mx * ch_ + bx,
                                )
                            )
                groups.append(g)

    br = _PBitReader(data)
    prev_dc = dict.fromkeys(cis, 0)
    seg = 0
    for gi, group in enumerate(groups):
        if restart_interval and gi and gi % restart_interval == 0:
            seg += 1
            if seg <= len(rst_breaks):
                br.reset(rst_breaks[seg - 1])
            prev_dc = dict.fromkeys(cis, 0)
        for ci, bidx in group:
            dct, act = luts[ci]
            zz = sstate["coeffs"][ci]
            s = br.huff(dct)
            if s:
                prev_dc[ci] += _extend(br.bits(s), s)
            zz[bidx, 0] = prev_dc[ci]
            k = 1
            while k <= 63:
                rs = br.huff(act)
                s = rs & 0xF
                if s == 0:
                    if rs == 0xF0:
                        k += 16
                        continue
                    break  # EOB
                k += rs >> 4
                if k > 63:
                    raise ValueError("AC run past block end")
                zz[bidx, k] = _extend(br.bits(s), s)
                k += 1
    if br.pos > len(data) + 2:
        raise EOFError("entropy data exhausted")


# --- progressive JPEG (SOF2: spectral selection + successive
# --- approximation), T.81 Annex G -------------------------------------


class _StuffWriter:
    """MSB-first bit writer with JPEG byte stuffing (FF -> FF 00)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._n += nbits
        while self._n >= 8:
            self._n -= 8
            b = (self._acc >> self._n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # 1-padding per spec


#: libjpeg's standard "simple progression" scan script for 3
#: components: (component indices, Ss, Se, Ah, Al)
_PROGRESSIVE_SCANS = (
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((2,), 1, 63, 0, 1),
    ((1,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((2,), 1, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
    ((0,), 1, 63, 1, 0),
)


def _grid_coefficients(
    px: np.ndarray, quality: int, hv: tuple
) -> tuple[list, int, int, np.ndarray, np.ndarray]:
    """Per-component quantized zigzag coefficients on the FULL
    MCU-padded block grid in RASTER order: comp ci -> int64 array of
    shape (gh, gw, 64) with gh = mcuy*v, gw = mcux*h."""
    h, w = px.shape[:2]
    hmax = max(c[0] for c in hv)
    vmax = max(c[1] for c in hv)
    mcuy, mcux = -(-h // (8 * vmax)), -(-w // (8 * hmax))
    qy, qc = _quality_tables(quality)
    ycc = _rgb_to_ycbcr(px)
    grids = []
    for ci in range(3):
        ch_, cv = hv[ci]
        plane = _downsample(ycc[..., ci] - 128.0, vmax // cv, hmax // ch_)
        gh, gw = mcuy * cv, mcux * ch_
        p = np.pad(
            plane,
            ((0, gh * 8 - plane.shape[0]), (0, gw * 8 - plane.shape[1])),
            mode="edge",
        )
        blocks = (
            p.reshape(gh, 8, gw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        )
        coef = _DCT @ blocks @ _DCT.T
        q = (qy if ci == 0 else qc).reshape(8, 8)
        zz = (
            np.round(coef / q).astype(np.int64).reshape(-1, 64)[:, _ZIGZAG]
        )
        grids.append(zz.reshape(gh, gw, 64))
    return grids, mcuy, mcux, qy, qc


def _emit_eobrun(bw: _StuffWriter, state: dict) -> None:
    run = state["eobrun"]
    if run > 0:
        r = run.bit_length() - 1
        code, ln = _ENC_AC[r << 4]
        bw.write(code, ln)
        if r:
            bw.write(run - (1 << r), r)
        state["eobrun"] = 0
    for bit in state["corr"]:
        bw.write(bit, 1)
    state["corr"] = []


def _encode_ac_first(
    bw: _StuffWriter, blocks: np.ndarray, ss: int, se: int, al: int,
    state: dict,
) -> None:
    """First AC scan of a band (Ah=0): (run, size) symbols with
    EOB-run coding; point transform truncates toward zero."""
    for zz in blocks:
        band = zz[ss : se + 1]
        vals = np.where(
            band >= 0, band >> al, -((-band) >> al)
        )
        nz = np.flatnonzero(vals)
        if len(nz) == 0:
            state["eobrun"] += 1
            if state["eobrun"] == 0x7FFF:
                _emit_eobrun(bw, state)
            continue
        _emit_eobrun(bw, state)
        run = 0
        prev = -1
        for i in nz.tolist():
            run = i - prev - 1
            prev = i
            while run > 15:
                code, ln = _ENC_AC[0xF0]
                bw.write(code, ln)
                run -= 16
            v = int(vals[i])
            s = _size_cat_py(v)
            code, ln = _ENC_AC[(run << 4) | s]
            bw.write(code, ln)
            bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        if prev < se - ss:
            state["eobrun"] += 1
            if state["eobrun"] == 0x7FFF:
                _emit_eobrun(bw, state)


def _encode_ac_refine(
    bw: _StuffWriter, blocks: np.ndarray, ss: int, se: int, al: int,
    state: dict,
) -> None:
    """AC successive-approximation refinement (Ah=Al+1): newly
    significant coefficients get (run, 1) symbols + a sign bit;
    already-nonzero coefficients get buffered correction bits
    (T.81 G.1.2.3 / the classic encode_mcu_AC_refine structure)."""
    for zz in blocks:
        band = zz[ss : se + 1]
        absv = (np.abs(band) >> al).astype(np.int64)
        ones = np.flatnonzero(absv == 1)
        eob = int(ones[-1]) if len(ones) else -1
        r = 0
        corr: list[int] = []
        for k in range(len(band)):
            t = int(absv[k])
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= eob:
                _emit_eobrun(bw, state)
                code, ln = _ENC_AC[0xF0]
                bw.write(code, ln)
                r -= 16
                for bit in corr:
                    bw.write(bit, 1)
                corr = []
            if t > 1:
                corr.append(t & 1)
                continue
            _emit_eobrun(bw, state)
            code, ln = _ENC_AC[(r << 4) | 1]
            bw.write(code, ln)
            bw.write(1 if band[k] >= 0 else 0, 1)
            for bit in corr:
                bw.write(bit, 1)
            corr = []
            r = 0
        if r > 0 or corr:
            state["eobrun"] += 1
            state["corr"] += corr
            if state["eobrun"] == 0x7FFF:
                _emit_eobrun(bw, state)


def _size_cat_py(v: int) -> int:
    return v.bit_length() if v > 0 else (-v).bit_length()


def encode_progressive_jpeg(
    pixels: np.ndarray,
    quality: int = 95,
    subsampling: str = "444",
    scans: tuple = _PROGRESSIVE_SCANS,
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 3) uint8 RGB -> progressive (SOF2) JFIF bytes using the
    standard spectral-selection + successive-approximation scan
    script. The quantized coefficients are IDENTICAL to the baseline
    encoder's at the same quality/subsampling — progressive is a
    reordering of the same data — so `decode` of this stream equals
    `decode(encode_baseline_jpeg(...))` bit-for-bit, which is exactly
    what the roundtrip tests assert."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_progressive_jpeg expects (h, w, 3) RGB")
    if subsampling not in _SUBSAMPLING_HV:
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    hv = _SUBSAMPLING_HV[subsampling]
    h, w = px.shape[:2]
    grids, mcuy, mcux, qy, qc = _grid_coefficients(px, quality, hv)
    hmax = max(c[0] for c in hv)
    vmax = max(c[1] for c in hv)

    def seg_(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg_(
        0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    out += seg_(0xFFDB, bytes([0]) + bytes(qy[_ZIGZAG].tolist()))
    out += seg_(0xFFDB, bytes([1]) + bytes(qc[_ZIGZAG].tolist()))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for ci, (cid, tq) in enumerate(((1, 0), (2, 1), (3, 1))):
        sof += bytes([cid, (hv[ci][0] << 4) | hv[ci][1], tq])
    out += seg_(0xFFC2, sof)  # SOF2: progressive DCT, Huffman
    for payload_dht in _DHT_PAYLOADS:
        out += seg_(0xFFC4, payload_dht)
    if restart_interval:
        out += seg_(0xFFDD, struct.pack(">H", restart_interval))

    def rst_marker(bw, state, n_done):
        # byte-align, flush any pending EOB run first (an EOB run
        # must not cross a restart boundary), then the RAW marker
        _emit_eobrun(bw, state)
        bw.flush()
        bw.out += bytes(
            [0xFF, 0xD0 + ((n_done // restart_interval - 1) % 8)]
        )

    for comps_sel, ss, se, ah, al in scans:
        sos = bytes([len(comps_sel)])
        for ci in comps_sel:
            # component ids are 1-based; DC table 0/1, AC table 0/1
            tbl = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (tbl << 4) | tbl])
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg_(0xFFDA, sos)
        bw = _StuffWriter()
        state = {"eobrun": 0, "corr": []}
        if ss == 0:  # DC scan (interleaved over MCUs)
            if len(comps_sel) == 1:
                # a single-component DC scan is non-interleaved: a
                # decoder iterates the component's own (unpadded)
                # block grid, while the loops below walk the padded
                # MCU grid — only identical grids cannot desync.
                (ci0,) = comps_sel
                ch0, cv0 = hv[ci0]
                nbh0 = -(-(-(-h * cv0 // vmax)) // 8)
                nbw0 = -(-(-(-w * ch0 // hmax)) // 8)
                if (mcuy * cv0, mcux * ch0) != (nbh0, nbw0):
                    raise NotImplementedError(
                        "single-component DC scan over a padded "
                        "component grid (non-MCU-multiple dims)"
                    )
            if ah == 0:
                prev_dc = [0] * len(comps_sel)
                mcu_n = 0
                for my in range(mcuy):
                    for mx in range(mcux):
                        if (
                            restart_interval
                            and mcu_n
                            and mcu_n % restart_interval == 0
                        ):
                            rst_marker(bw, state, mcu_n)
                            prev_dc = [0] * len(comps_sel)
                        mcu_n += 1
                        for si, ci in enumerate(comps_sel):
                            ch_, cv = hv[ci]
                            for by in range(cv):
                                for bx in range(ch_):
                                    dc = int(
                                        grids[ci][
                                            my * cv + by, mx * ch_ + bx, 0
                                        ]
                                    ) >> al
                                    diff = dc - prev_dc[si]
                                    prev_dc[si] = dc
                                    s = _size_cat_py(diff)
                                    code, ln = _ENC_DC[s]
                                    bw.write(code, ln)
                                    if s:
                                        bw.write(
                                            diff
                                            if diff >= 0
                                            else diff + (1 << s) - 1,
                                            s,
                                        )
            else:  # DC refinement: one raw bit per block
                mcu_n = 0
                for my in range(mcuy):
                    for mx in range(mcux):
                        if (
                            restart_interval
                            and mcu_n
                            and mcu_n % restart_interval == 0
                        ):
                            rst_marker(bw, state, mcu_n)
                        mcu_n += 1
                        for ci in comps_sel:
                            ch_, cv = hv[ci]
                            for by in range(cv):
                                for bx in range(ch_):
                                    dc = int(
                                        grids[ci][
                                            my * cv + by, mx * ch_ + bx, 0
                                        ]
                                    )
                                    bw.write((dc >> al) & 1, 1)
        else:  # AC scan: single component, comp-raster block order
            (ci,) = comps_sel
            ch_, cv = hv[ci]
            comp_h = -(-h * cv // vmax)
            comp_w = -(-w * ch_ // hmax)
            nbh, nbw = -(-comp_h // 8), -(-comp_w // 8)
            blocks = grids[ci][:nbh, :nbw].reshape(-1, 64)
            step = restart_interval or len(blocks)
            enc = _encode_ac_first if ah == 0 else _encode_ac_refine
            for gi in range(0, len(blocks), max(step, 1)):
                if gi:
                    rst_marker(bw, state, gi)
                enc(bw, blocks[gi : gi + step], ss, se, al, state)
            _emit_eobrun(bw, state)
        bw.flush()
        out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


class _PBitReader:
    """MSB-first bit reader for progressive scans (marker-stripped
    data). Simpler than the baseline path's inlined reader — the
    progressive algorithms are control-flow-heavy, so clarity wins;
    per-scan data volumes are the same order as baseline."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nb = 0

    def reset(self, pos: int) -> None:
        self.pos = pos
        self.acc = 0
        self.nb = 0

    def bits(self, n: int) -> int:
        while self.nb < n:
            self.acc = (self.acc << 8) | (
                self.data[self.pos] if self.pos < len(self.data) else 0
            )
            self.pos += 1
            self.nb += 8
        self.nb -= n
        v = (self.acc >> self.nb) & ((1 << n) - 1)
        self.acc &= (1 << self.nb) - 1
        return v

    def huff(self, lut: list) -> int:
        while self.nb < 16:
            self.acc = (self.acc << 8) | (
                self.data[self.pos] if self.pos < len(self.data) else 0
            )
            self.pos += 1
            self.nb += 8
        e = lut[(self.acc >> (self.nb - 16)) & 0xFFFF]
        if not e:
            raise ValueError("invalid Huffman code in entropy data")
        self.nb -= e & 31
        self.acc &= (1 << self.nb) - 1
        return e >> 5


def _progressive_state(frame: dict) -> dict:
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcuy = -(-frame["h"] // (8 * vmax))
    mcux = -(-frame["w"] // (8 * hmax))
    dims = []
    coeffs = []
    for c in comps:
        gh, gw = mcuy * c["v"], mcux * c["h"]
        dims.append((gh, gw))
        coeffs.append([0] * (gh * gw * 64))
    return {
        "coeffs": coeffs,
        "dims": dims,
        "mcuy": mcuy,
        "mcux": mcux,
        "hmax": hmax,
        "vmax": vmax,
    }


def _progressive_scan(
    frame, pstate, scan_comps, scan_sel, htables, data, rst_breaks,
    restart_interval, ss, se, ah, al,
) -> None:
    comps = frame["comps"]
    cid_to_ci = {c["id"]: i for i, c in enumerate(comps)}
    sel = [cid_to_ci[cs] for cs in scan_comps]
    br = _PBitReader(data)
    mcuy, mcux = pstate["mcuy"], pstate["mcux"]

    def rst_check(unit: int, state_reset) -> None:
        if restart_interval and unit and unit % restart_interval == 0:
            seg = unit // restart_interval
            if seg <= len(rst_breaks):
                br.reset(rst_breaks[seg - 1])
            state_reset()

    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        prev_dc = [0] * len(sel)

        def dc_reset() -> None:
            for i in range(len(prev_dc)):
                prev_dc[i] = 0

        interleaved = len(sel) > 1
        units = (
            [(ci,) for ci in sel]
            if not interleaved
            else None
        )
        if interleaved:
            unit = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    rst_check(unit, dc_reset)
                    unit += 1
                    for si, ci in enumerate(sel):
                        comp = comps[ci]
                        gh, gw = pstate["dims"][ci]
                        dct = htables.get((0, scan_sel[comp["id"]][0]))
                        if ah == 0 and dct is None:
                            raise ValueError(
                                "scan references undefined DHT table"
                            )
                        for by in range(comp["v"]):
                            for bx in range(comp["h"]):
                                base = (
                                    (my * comp["v"] + by) * gw
                                    + (mx * comp["h"] + bx)
                                ) * 64
                                buf = pstate["coeffs"][ci]
                                if ah == 0:
                                    s = br.huff(dct)
                                    diff = (
                                        _extend(br.bits(s), s) if s else 0
                                    )
                                    prev_dc[si] += diff
                                    buf[base] = prev_dc[si] << al
                                else:
                                    if br.bits(1):
                                        buf[base] |= 1 << al
        else:
            (ci,) = sel
            comp = comps[ci]
            gh, gw = pstate["dims"][ci]
            nbh, nbw = _comp_block_dims(frame, pstate, ci)
            dct = htables.get((0, scan_sel[comp["id"]][0]))
            buf = pstate["coeffs"][ci]
            unit = 0
            for r in range(nbh):
                for ccol in range(nbw):
                    rst_check(unit, dc_reset)
                    unit += 1
                    base = (r * gw + ccol) * 64
                    if ah == 0:
                        if dct is None:
                            raise ValueError(
                                "scan references undefined DHT table"
                            )
                        s = br.huff(dct)
                        diff = _extend(br.bits(s), s) if s else 0
                        prev_dc[0] += diff
                        buf[base] = prev_dc[0] << al
                    else:
                        if br.bits(1):
                            buf[base] |= 1 << al
        return

    # AC scan: exactly one component (T.81 G.1.1)
    if len(sel) != 1:
        raise ValueError("progressive AC scan must be single-component")
    (ci,) = sel
    comp = comps[ci]
    gh, gw = pstate["dims"][ci]
    nbh, nbw = _comp_block_dims(frame, pstate, ci)
    act = htables.get((1, scan_sel[comp["id"]][1]))
    if act is None:
        raise ValueError("scan references undefined DHT table")
    buf = pstate["coeffs"][ci]
    state = {"eobrun": 0}

    def ac_reset() -> None:
        state["eobrun"] = 0

    p1, m1 = 1 << al, -(1 << al)
    unit = 0
    for rrow in range(nbh):
        for ccol in range(nbw):
            rst_check(unit, ac_reset)
            unit += 1
            base = (rrow * gw + ccol) * 64
            if ah == 0:  # first scan of this band
                if state["eobrun"] > 0:
                    state["eobrun"] -= 1
                    continue
                k = ss
                while k <= se:
                    rs = br.huff(act)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r != 15:
                            state["eobrun"] = (1 << r) - 1
                            if r:
                                state["eobrun"] += br.bits(r)
                            break
                        k += 16
                        continue
                    k += r
                    if k > se:
                        raise ValueError("AC run past band end")
                    buf[base + k] = _extend(br.bits(s), s) << al
                    k += 1
            else:  # refinement scan (T.81 G.1.2.3)
                k = ss
                if state["eobrun"] == 0:
                    while k <= se:
                        rs = br.huff(act)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r != 15:
                                state["eobrun"] = 1 << r
                                if r:
                                    state["eobrun"] += br.bits(r)
                                break
                            val = 0
                        else:
                            if s != 1:
                                raise ValueError(
                                    "refinement scan size != 1"
                                )
                            val = p1 if br.bits(1) else m1
                        while k <= se:
                            coef = buf[base + k]
                            if coef != 0:
                                if br.bits(1) and (coef & p1) == 0:
                                    buf[base + k] += (
                                        p1 if coef >= 0 else m1
                                    )
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if val and k <= se:
                            buf[base + k] = val
                        k += 1
                if state["eobrun"] > 0:
                    while k <= se:
                        coef = buf[base + k]
                        if coef != 0:
                            if br.bits(1) and (coef & p1) == 0:
                                buf[base + k] += p1 if coef >= 0 else m1
                        k += 1
                    state["eobrun"] -= 1


def _comp_block_dims(frame, pstate, ci: int) -> tuple[int, int]:
    """Non-interleaved block grid: ceil(comp dims / 8), WITHOUT MCU
    padding (T.81 A.2.2) — smaller than the padded grid for
    subsampled components on non-multiple-of-16 frames."""
    comp = frame["comps"][ci]
    ch = -(-frame["h"] * comp["v"] // pstate["vmax"])
    cw = -(-frame["w"] * comp["h"] // pstate["hmax"])
    return -(-ch // 8), -(-cw // 8)


def _reassemble_progressive(
    frame: dict, pstate: dict, qtables: dict
) -> np.ndarray:
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax, vmax = pstate["hmax"], pstate["vmax"]
    planes = []
    for ci, comp in enumerate(comps):
        q = qtables.get(comp["tq"])
        if q is None:
            raise ValueError("component references undefined DQT")
        gh, gw = pstate["dims"][ci]
        cf = np.array(pstate["coeffs"][ci], dtype=np.int64).reshape(
            -1, 64
        )
        deq = (cf[:, _UNZIGZAG] * q).reshape(-1, 8, 8).astype(
            np.float64
        )
        spatial = _DCT.T @ deq @ _DCT
        plane = (
            spatial.reshape(gh, gw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(gh * 8, gw * 8)
        )
        comp_h = -(-h * comp["v"] // vmax)
        comp_w = -(-w * comp["h"] // hmax)
        plane = plane[:comp_h, :comp_w] + 128.0
        fy, fx = vmax // comp["v"], hmax // comp["h"]
        if fy > 1 or fx > 1:
            plane = np.repeat(np.repeat(plane, fy, axis=0), fx, axis=1)
        planes.append(plane[:h, :w])
    if len(comps) == 3:
        return _ycbcr_to_rgb(np.stack(planes, axis=-1))
    if len(comps) == 1:
        g = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    raise NotImplementedError(f"{len(comps)}-component JPEG")
