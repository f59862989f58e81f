"""Pure-Python FLAC codec (lossless compressed audio).

Why this exists: the engine's compressed-audio coverage (IMA ADPCM,
operators/adpcmcodec.py) is lossy, and the dominant *lossless* audio
format in real training corpora is FLAC — which, unlike MP3/AAC,
is implementable from the public spec with NO normative lookup
tables: everything is algorithmic (fixed/LPC linear prediction,
Rice-coded residuals, CRC-8/16, UTF-8-style frame numbering). That
makes a bit-honest pure implementation feasible in this
no-imaging/no-audio-library sandbox, and because FLAC is lossless
the roundtrip oracle is EXACT — sample-for-sample equality, not a
tolerance flag.

Coverage:
- Encode: 16-bit PCM, 1-2 channels (independent), constant block
  size, per-frame best-of fixed predictors (orders 0-2), one Rice
  partition, STREAMINFO with the spec's MD5 of the raw samples.
- Decode: full frame walk — constant / verbatim / fixed(0-4) / LPC
  (any order) subframes, Rice and Rice2 residual methods, all
  partition orders, escape (raw) partitions, wasted bits, all four
  channel assignments (independent, left/side, right/side,
  mid/side), CRC-8 header and CRC-16 frame verification — so FLAC
  files from OTHER encoders decode too, not just our own.
- 8/16/24-bit sample sizes on decode; encoder emits 16-bit.

Unsupported (loud NotImplementedError, never garbage samples):
variable block-size streams (blocking strategy 1 is parsed — the
sample-number coding differs — but non-constant sizes beyond the
last frame raise), sample sizes other than 8/16/24.

Scale note: like the JPEG/GIF/ADPCM codecs this is a per-payload CPU
codec invoked inside Arrow-batched mapInPandas
(operators/multimodal.py) — embarrassingly parallel across
partitions; the Spark-side plumbing is identical whether the bytes
go through libsndfile or this fallback.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_BLOCK = 4096


# --- CRCs (spec polynomials, table-driven) ----------------------------


def _crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tbl = []
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) if r & top else (r << 1)
        tbl.append(r & mask)
    return tbl


_CRC8_TBL = _crc_table(0x07, 8)
_CRC16_TBL = _crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = _CRC8_TBL[r ^ b]
    return r


def _crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFF) ^ _CRC16_TBL[(r >> 8) ^ b]
    return r


# --- bit I/O (MSB-first) ----------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int) -> None:
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._n += nbits
        while self._n >= 8:
            self._n -= 8
            self.out.append((self._acc >> self._n) & 0xFF)
        self._acc &= (1 << self._n) - 1

    def write_unary(self, q: int) -> None:
        # q zeros then a one (Rice quotient)
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self._n:
            self.write(0, 8 - self._n)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.bytepos = pos
        self._acc = 0
        self._n = 0

    def read(self, nbits: int) -> int:
        while self._n < nbits:
            if self.bytepos >= len(self.data):
                raise EOFError("FLAC bitstream exhausted")
            self._acc = (self._acc << 8) | self.data[self.bytepos]
            self.bytepos += 1
            self._n += 8
        self._n -= nbits
        v = (self._acc >> self._n) & ((1 << nbits) - 1)
        self._acc &= (1 << self._n) - 1
        return v

    def read_unary(self) -> int:
        q = 0
        while True:
            if self._n == 0:
                if self.bytepos >= len(self.data):
                    raise EOFError("FLAC bitstream exhausted")
                self._acc = self.data[self.bytepos]
                self.bytepos += 1
                self._n = 8
            # count leading zeros in the live bits
            while self._n:
                self._n -= 1
                if (self._acc >> self._n) & 1:
                    self._acc &= (1 << self._n) - 1
                    return q
                q += 1
            self._acc = 0

    def align(self) -> None:
        self._n = 0
        self._acc = 0

    def tell(self) -> int:
        return self.bytepos - (self._n + 7) // 8


def _zigzag(res: np.ndarray) -> np.ndarray:
    return np.where(res >= 0, res << 1, ((-res) << 1) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


# --- encode -----------------------------------------------------------

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _rice_param(res: np.ndarray) -> int:
    if len(res) == 0:
        return 0
    mean = float(np.abs(res).mean())
    k = 0
    while (1 << k) < mean + 1 and k < 14:
        k += 1
    return k


def _write_utf8_number(bw: _BitWriter, n: int) -> None:
    """FLAC's UTF-8-style coded number (frame index)."""
    if n < 0x80:
        bw.write(n, 8)
        return
    # determine byte count
    for nbytes, cap in ((2, 1 << 11), (3, 1 << 16), (4, 1 << 21),
                        (5, 1 << 26), (6, 1 << 31), (7, 1 << 36)):
        if n < cap:
            break
    else:
        raise ValueError("frame number too large")
    shift = 6 * (nbytes - 1)
    bw.write((0xFF00 >> nbytes) & 0xFF | (n >> shift), 8)
    for i in range(nbytes - 1):
        shift -= 6
        bw.write(0x80 | ((n >> shift) & 0x3F), 8)


def _read_utf8_number(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    probe = b0
    while probe & 0x40:
        nbytes += 1
        probe <<= 1
    if nbytes < 1 or nbytes > 6:
        raise ValueError("malformed UTF-8-coded frame number")
    n = b0 & (0x3F >> nbytes)
    for _ in range(nbytes):
        b = br.read(8)
        if (b & 0xC0) != 0x80:
            raise ValueError("malformed UTF-8-coded frame number")
        n = (n << 6) | (b & 0x3F)
    return n


def _encode_subframe(bw: _BitWriter, x: np.ndarray, bps: int) -> None:
    """Best-of {constant, fixed 0-2 + Rice} for one channel block."""
    if np.all(x == x[0]):
        bw.write(0, 1)  # zero pad bit
        bw.write(0, 6)  # constant
        bw.write(0, 1)  # no wasted bits
        bw.write(int(x[0]) & ((1 << bps) - 1), bps)
        return
    best = None
    for order in (0, 1, 2):
        if len(x) <= order:
            continue
        res = _fixed_residual(x, order)
        k = _rice_param(res)
        zz = _zigzag(res)
        cost = order * bps + int((zz >> k).sum()) + len(zz) * (k + 1)
        if best is None or cost < best[0]:
            best = (cost, order, res, k)
    _cost, order, res, k = best
    bw.write(0, 1)
    bw.write(0b001000 | order, 6)  # fixed, order
    bw.write(0, 1)  # no wasted bits
    for w in x[:order]:
        bw.write(int(w) & ((1 << bps) - 1), bps)
    # residual: method 0 (4-bit Rice), partition order 0
    bw.write(0, 2)
    bw.write(0, 4)
    bw.write(k, 4)
    zz = _zigzag(res)
    for u in zz.tolist():
        bw.write_unary(u >> k)
        if k:
            bw.write(u & ((1 << k) - 1), k)


_RATE_CODES = {
    88200: 0x1, 176400: 0x2, 192000: 0x3, 8000: 0x4, 16000: 0x5,
    22050: 0x6, 24000: 0x7, 32000: 0x8, 44100: 0x9, 48000: 0xA,
    96000: 0xB,
}


def encode_flac(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """(n,) or (n, channels<=2) int16 PCM -> FLAC bytes (lossless)."""
    pcm = np.asarray(samples, dtype=np.int16)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    n, ch = pcm.shape
    if ch > 2:
        raise ValueError("encode_flac supports 1-2 channels")
    md5 = hashlib.md5(
        pcm.astype("<i2").tobytes()
    ).digest()  # interleaved little-endian per spec
    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = bytearray()
    si += struct.pack(">HH", _BLOCK, _BLOCK)
    si += (0).to_bytes(3, "big") * 2  # min/max frame size unknown
    packed = (sample_rate << 44) | ((ch - 1) << 41) | ((16 - 1) << 36) | n
    si += packed.to_bytes(8, "big")
    si += md5
    out += bytes([0x80]) + len(si).to_bytes(3, "big") + si
    rate_code = _RATE_CODES.get(sample_rate, 0x0)
    # n == 0 encodes as a frame-less stream (STREAMINFO total=0, no
    # frames): a zero-sample frame would otherwise write bs-1 = -1 in
    # the 16-bit block-size field and index x[0] in _encode_subframe.
    for fi in range(0, n, _BLOCK):
        block = pcm[fi : fi + _BLOCK]
        bs = len(block)
        bw = _BitWriter()
        bw.write(0b11111111111110, 14)
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed block size stream
        # block size code: 12 -> 4096; last partial -> 16-bit at end
        if bs == 4096:
            bs_code = 12
        elif bs == 256:
            bs_code = 8
        else:
            bs_code = 7  # 16-bit block size follows header
        bw.write(bs_code, 4)
        bw.write(rate_code, 4)
        bw.write(ch - 1, 4)  # independent channels
        bw.write(0b100, 3)  # 16 bits/sample
        bw.write(0, 1)  # reserved
        _write_utf8_number(bw, fi // _BLOCK)
        if bs_code == 7:
            bw.write(bs - 1, 16)
        if rate_code == 0x0:
            pass  # rate from STREAMINFO
        bw.align()
        hdr = bytes(bw.out)
        bw.write(_crc8(hdr), 8)
        for c in range(ch):
            _encode_subframe(bw, block[:, c].astype(np.int64), 16)
        bw.align()
        body = bytes(bw.out)
        bw.write(_crc16(body), 16)
        out += bw.out
    return bytes(out)


# --- decode -----------------------------------------------------------


def _read_residual(
    br: _BitReader, bs: int, order: int
) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved residual coding method")
    plen = 4 + method  # Rice: 4-bit params; Rice2: 5-bit
    escape = (1 << plen) - 1
    part_order = br.read(4)
    nparts = 1 << part_order
    if bs % nparts:
        raise ValueError("partition order does not divide block size")
    res: list[int] = []
    for p in range(nparts):
        cnt = bs // nparts - (order if p == 0 else 0)
        k = br.read(plen)
        if k == escape:
            raw = br.read(5)
            for _ in range(cnt):
                v = br.read(raw) if raw else 0
                if raw and v >= (1 << (raw - 1)):  # sign-extend
                    v -= 1 << raw
                res.append(v)
        else:
            for _ in range(cnt):
                q = br.read_unary()
                u = (q << k) | (br.read(k) if k else 0)
                res.append(_unzigzag(u))
    return res


def _read_subframe(br: _BitReader, bs: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("subframe padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.read_unary()
    eff = bps - wasted
    signbit = 1 << (eff - 1)

    def _signed(v: int) -> int:
        return v - (1 << eff) if v & signbit else v

    if stype == 0:  # constant
        x = np.full(bs, _signed(br.read(eff)), dtype=np.int64)
    elif stype == 1:  # verbatim
        x = np.array(
            [_signed(br.read(eff)) for _ in range(bs)], dtype=np.int64
        )
    elif 8 <= stype <= 12:  # fixed
        order = stype - 8
        warm = [_signed(br.read(eff)) for _ in range(order)]
        res = _read_residual(br, bs, order)
        coefs = _FIXED_COEFS[order]
        x_l = warm + [0] * (bs - order)
        for i in range(order, bs):
            pred = 0
            for j, cf in enumerate(coefs):
                pred += cf * x_l[i - 1 - j]
            x_l[i] = pred + res[i - order]
        x = np.array(x_l, dtype=np.int64)
    elif stype >= 32:  # LPC
        order = (stype & 0x1F) + 1
        warm = [_signed(br.read(eff)) for _ in range(order)]
        prec = br.read(4)
        if prec == 0xF:
            raise ValueError("invalid LPC precision")
        prec += 1
        shift = br.read(5)
        if shift >= 16:  # 5-bit signed; negative shifts are invalid
            raise ValueError("negative LPC shift")
        coefs = []
        for _ in range(order):
            c = br.read(prec)
            if c >= (1 << (prec - 1)):
                c -= 1 << prec
            coefs.append(c)
        res = _read_residual(br, bs, order)
        x_l = warm + [0] * (bs - order)
        for i in range(order, bs):
            acc = 0
            for j in range(order):
                acc += coefs[j] * x_l[i - 1 - j]
            x_l[i] = (acc >> shift) + res[i - order]
        x = np.array(x_l, dtype=np.int64)
    else:
        raise ValueError(f"reserved subframe type {stype}")
    return x << wasted


_BS_TABLE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}
_RATE_TABLE = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}


def decode_flac(payload: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes -> ((n, channels) int32 PCM, sample_rate). Verifies
    CRC-8/CRC-16 and the STREAMINFO MD5 (16-bit streams)."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (missing fLaC magic)")
    pos = 4
    info = None
    while True:
        hdr = payload[pos : pos + 4]
        if len(hdr) < 4:
            raise ValueError("truncated metadata block header")
        last = hdr[0] >> 7
        btype = hdr[0] & 0x7F
        blen = int.from_bytes(hdr[1:4], "big")
        body = payload[pos + 4 : pos + 4 + blen]
        pos += 4 + blen
        if btype == 0:  # STREAMINFO
            packed = int.from_bytes(body[10:18], "big")
            info = {
                "rate": packed >> 44,
                "ch": ((packed >> 41) & 0x7) + 1,
                "bps": ((packed >> 36) & 0x1F) + 1,
                "total": packed & ((1 << 36) - 1),
                "md5": body[18:34],
            }
        if last:
            break
    if info is None:
        raise ValueError("missing STREAMINFO")
    if info["bps"] not in (8, 16, 24):
        raise NotImplementedError(f"{info['bps']}-bit FLAC")
    chans: list[np.ndarray] = []
    out_blocks: list[np.ndarray] = []
    got = 0
    while pos < len(payload) and (
        info["total"] == 0 or got < info["total"]
    ):
        br = _BitReader(payload, pos)
        sync = br.read(14)
        if sync != 0b11111111111110:
            raise ValueError("lost FLAC frame sync")
        if br.read(1):
            raise ValueError("reserved frame bit set")
        _blocking = br.read(1)
        bs_code = br.read(4)
        rate_code = br.read(4)
        ch_asgn = br.read(4)
        ss_code = br.read(3)
        if br.read(1):
            raise ValueError("reserved frame bit set")
        _num = _read_utf8_number(br)
        if bs_code == 6:
            bs = br.read(8) + 1
        elif bs_code == 7:
            bs = br.read(16) + 1
        elif bs_code in _BS_TABLE:
            bs = _BS_TABLE[bs_code]
        else:
            raise ValueError("reserved block size code")
        if rate_code == 12:
            br.read(8)
        elif rate_code in (13, 14):
            br.read(16)
        elif rate_code == 15:
            raise ValueError("invalid sample rate code")
        # CRC-8 covers the header bytes up to (excluding) the CRC byte
        hdr_end = br.bytepos
        expect8 = br.read(8)
        if _crc8(payload[pos:hdr_end]) != expect8:
            raise ValueError("FLAC frame header CRC mismatch")
        bps = {
            0: info["bps"], 1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32
        }.get(ss_code)
        if bps is None:
            raise ValueError("reserved sample size code")
        if ch_asgn < 8:
            nch = ch_asgn + 1
            chans = [
                _read_subframe(
                    br, bs, bps
                ) for _ in range(nch)
            ]
        elif ch_asgn == 8:  # left/side
            left = _read_subframe(br, bs, bps)
            side = _read_subframe(br, bs, bps + 1)
            chans = [left, left - side]
        elif ch_asgn == 9:  # right/side
            side = _read_subframe(br, bs, bps + 1)
            right = _read_subframe(br, bs, bps)
            chans = [right + side, right]
        elif ch_asgn == 10:  # mid/side
            mid = _read_subframe(br, bs, bps)
            side = _read_subframe(br, bs, bps + 1)
            l = ((mid << 1) | (side & 1)) + side
            chans = [l >> 1, (l - (side << 1)) >> 1]
        else:
            raise ValueError("reserved channel assignment")
        br.align()
        body_end = br.bytepos
        expect16 = br.read(16)
        if _crc16(payload[pos:body_end]) != expect16:
            raise ValueError("FLAC frame CRC-16 mismatch")
        out_blocks.append(np.stack(chans, axis=1))
        got += bs
        pos = br.bytepos
    pcm = (
        np.concatenate(out_blocks, axis=0)
        if out_blocks
        else np.zeros((0, info["ch"]), dtype=np.int64)
    )
    if info["total"]:
        pcm = pcm[: info["total"]]
    if info["bps"] == 16 and info["md5"] != bytes(16):
        digest = hashlib.md5(pcm.astype("<i2").tobytes()).digest()
        if digest != info["md5"]:
            raise ValueError("decoded PCM fails the STREAMINFO MD5")
    return pcm.astype(np.int32), info["rate"]
