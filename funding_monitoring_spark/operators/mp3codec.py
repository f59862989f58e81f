"""Pure-Python/numpy MPEG-1 Layer III (MP3) sample-level codec —
constrained profile, loud refusals outside it.

The metadata scanner (operators/mpegaudio.py) profiles MP3 corpora
without touching PCM; this module is the sample-level path the
round-trip query needs, built the same way as the JPEG/FLAC codecs:
every stage that IS exactly formula-defined in public spec text
(ISO/IEC 11172-3) is implemented for real, and every stage that would
require transcribing large normative TABLES from memory refuses
loudly instead of risking silently-wrong audio.

ISO-exact layers (bit-for-bit the published algorithms):
- frame header + mono/stereo side-info layout (136 / 256 bits),
- count1-region Huffman coding with table B (the 16-entry all-4-bit
  table: code = one's complement of the (v,w,x,y) quadruple index)
  plus per-nonzero sign bits,
- requantization power law |is|^(4/3) * 2^((global_gain-210)/4)
  (zero scalefactors, preflag 0, scalefac_scale 0 -> the full
  normative formula reduces to exactly this),
- aliasing-reduction butterflies with the eight normative ci
  coefficients (csi = 1/sqrt(1+ci^2), cai = ci/sqrt(1+ci^2)),
- the 36-point long-block MDCT/IMDCT pair with the normative sine
  window sin(pi/36 (n+1/2)) and cos(pi/72 (2n+19)(2m+1)) kernel,
- frequency inversion of odd samples in odd subbands.

Documented deviation (the one non-formula stage): the 32-subband
polyphase filterbank prototype. The normative 512-tap window is a
numeric TABLE (ISO 11172-3 Table B.3) with no closed form; policy
here is refusal over a from-memory transcription that could be
subtly wrong, so this codec uses a formula-defined EXACTLY
perfect-reconstruction 32-band cosine-modulated bank instead (MDCT
with N=32 and the sine window — Princen-Bradley TDAC). Streams this
encoder emits are syntactically valid MPEG-1 Layer III (they parse
with any conformant demuxer and with operators/mpegaudio.py), and
the profile this decoder ACCEPTS is exactly the profile this encoder
emits — third-party streams use scalefactors, bigvalues tables and
the bit reservoir and hit the explicit NotImplementedErrors below
long before the filterbank, so the deviation is unreachable from any
accepted foreign stream.

All three MPEG versions are supported at the container level:
MPEG-1 (32/44.1/48 kHz, two granules per frame, 17/32-byte side
info) and MPEG-2 / MPEG-2.5 LSF (16/22.05/24 and 8/11.025/12 kHz,
one granule per frame, 8-bit main_data_begin, 9-bit
scalefac_compress, no scfsi/preflag, 9/17-byte side info); the
spectral pipeline is shared.

Profile refusals (each a hard error, never a guess): bigvalues > 0,
count1 table A, nonzero scalefac_compress / scfsi, window switching
(short blocks), joint stereo, main_data_begin != 0 (bit reservoir),
free format, Layer I/II.
"""

from __future__ import annotations

import numpy as np

#: normative bitrate/rate tables are shared with the independent
#: metadata scanner — ONE definition, so codec and scanner can never
#: disagree on frame geometry
from funding_monitoring_spark.operators.mpegaudio import (  # noqa: E402
    _BITRATES,
    _BITRATES_LSF,
    _RATES,
)

_RATES_V2 = [r // 2 for r in _RATES]  # MPEG-2: 22050/24000/16000
_RATES_V25 = [r // 4 for r in _RATES]  # MPEG-2.5: 11025/12000/8000
_RATES_BY_VERSION = {0b11: _RATES, 0b10: _RATES_V2, 0b00: _RATES_V25}

#: total analysis->synthesis latency in samples: one granule (inner
#: MDCT overlap) + one polyphase block; the encoder emits enough
#: trailing flush frames to push every REAL sample past the trim
_CODEC_DELAY = 576 + 32
_GRANULE = 576
_SB = 32  #: subbands
_SSLIMIT = 18  #: spectral lines per subband per granule

#: aliasing-reduction coefficients ci (ISO 11172-3 2.4.3.4.10.1)
_CI = np.array(
    [-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037]
)
_CS = 1.0 / np.sqrt(1.0 + _CI * _CI)
_CA = _CI / np.sqrt(1.0 + _CI * _CI)

#: long-block MDCT pair: z (36 windowed subband samples) ->
#: X[m] = sum_n z[n] cos(pi/72 (2n+1+18)(2m+1)), m = 0..17
_N_MDCT = np.array(
    [
        [
            np.cos(np.pi / 72.0 * (2 * n + 1 + _SSLIMIT) * (2 * m + 1))
            for n in range(2 * _SSLIMIT)
        ]
        for m in range(_SSLIMIT)
    ]
)
_WIN_LONG = np.sin(np.pi / 36.0 * (np.arange(36) + 0.5))

#: 32-band PR cosine bank (MDCT, N=32): the formula-defined stand-in
#: for the normative Table B.3 prototype (see module docstring)
_N_POLY = np.array(
    [
        [
            np.cos(np.pi / 32.0 * (n + 0.5 + 16.0) * (k + 0.5))
            for n in range(64)
        ]
        for k in range(32)
    ]
)
_WIN_POLY = np.sin(np.pi / 64.0 * (np.arange(64) + 0.5))


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def pad_to_byte(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bit_length(self) -> int:
        return 8 * len(self.buf) + self.nbits


class _BitReader:
    def __init__(self, data: bytes, bitpos: int = 0) -> None:
        self.data = data
        self.pos = bitpos

    def read(self, nbits: int) -> int:
        out = 0
        for _ in range(nbits):
            byte = self.data[self.pos >> 3]
            out = (out << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return out


# ---------------------------------------------------------------------------
# filterbank (encoder analysis + decoder synthesis; exact PR pair)
# ---------------------------------------------------------------------------


def _analysis(x: np.ndarray) -> np.ndarray:
    """(n,) float -> (n//32, 32) subband samples via the PR bank.
    Input length must be a multiple of 32; one leading block of zero
    history is assumed (matching _synthesis's zero initial overlap)."""
    n = len(x)
    nblk = n // _SB
    padded = np.concatenate([np.zeros(_SB), x])
    # windows of 64 samples hopping by 32
    idx = np.arange(64)[None, :] + _SB * np.arange(nblk)[:, None]
    frames = padded[idx] * _WIN_POLY[None, :]
    return frames @ _N_POLY.T


def _synthesis(s: np.ndarray) -> np.ndarray:
    """(nblk, 32) subband samples -> (nblk*32,) samples. Exact
    inverse of _analysis up to one block of latency: output sample t
    equals input sample t - 32 (checked by tests)."""
    nblk = len(s)
    frames = (s @ _N_POLY) * _WIN_POLY[None, :] * (2.0 / _SB)
    out = np.zeros(_SB * (nblk + 1))
    for t in range(nblk):
        out[_SB * t : _SB * t + 64] += frames[t]
    return out[:_SB * nblk]


def _mdct_granules(sub: np.ndarray) -> np.ndarray:
    """(nblk, 32) subband samples -> (ngr, 576) spectral lines; the
    normative 36-sample long-block MDCT with 18-sample overlap (zero
    history before the first granule)."""
    nblk = len(sub)
    ngr = nblk // _SSLIMIT
    hist = np.zeros((_SSLIMIT, _SB))
    out = np.empty((ngr, _GRANULE))
    for g in range(ngr):
        cur = sub[g * _SSLIMIT : (g + 1) * _SSLIMIT]
        z = np.concatenate([hist, cur], axis=0) * _WIN_LONG[:, None]
        out[g] = (_N_MDCT @ z).T.reshape(-1)  # subband-major
        hist = cur
    return out


def _imdct_granules(spec: np.ndarray) -> np.ndarray:
    """(ngr, 576) spectral lines -> (ngr*18, 32) subband samples via
    the normative IMDCT + windowed overlap-add. Latency: one granule
    (output granule g reconstructs input granule g-1)."""
    ngr = len(spec)
    out = np.zeros(((ngr + 1) * _SSLIMIT, _SB))
    for g in range(ngr):
        lines = spec[g].reshape(_SB, _SSLIMIT).T  # (18, 32)
        z = (_N_MDCT.T @ lines) * _WIN_LONG[:, None] * (4.0 / 36.0)
        out[g * _SSLIMIT : g * _SSLIMIT + 36] += z
    return out[:ngr * _SSLIMIT]


def _antialias(spec: np.ndarray, inverse: bool = False) -> np.ndarray:
    """Aliasing-reduction butterflies across subband boundaries
    (decoder direction), or their exact inverse (encoder)."""
    out = spec.copy()
    sign = -1.0 if inverse else 1.0
    for sb in range(1, _SB):
        lo = sb * _SSLIMIT - 1 - np.arange(8)
        hi = sb * _SSLIMIT + np.arange(8)
        a, b = out[..., lo].copy(), out[..., hi].copy()
        out[..., lo] = a * _CS - sign * _CA * b
        out[..., hi] = b * _CS + sign * _CA * a
    return out


def _freq_invert(sub: np.ndarray) -> np.ndarray:
    """Multiply every odd time sample of every odd subband by -1
    (decoder side; the encoder applies the same involution)."""
    out = sub.copy()
    out[1::2, 1::2] *= -1.0
    return out


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _quantize_granule(x: np.ndarray) -> tuple[int, np.ndarray]:
    """Pick global_gain and two-level quantize: is in {-1, 0, +1}.

    The normative quantizer is |is| = nint((|x|/step)^(3/4) - 0.0946)
    with step = 2^((gg-210)/4); this encoder's profile restricts to
    |is| <= 1 (so the whole spectrum codes in the count1 region) and
    chooses, among every legal gg, the one minimizing the granule's
    reconstructed-energy error — encoder freedom the spec allows."""
    amax = float(np.abs(x).max())
    if amax <= 0.0:
        return 210, np.zeros(_GRANULE, dtype=np.int64)
    best = None
    e_src = float((x * x).sum())
    a34 = np.abs(x) ** 0.75
    # skip provably-infeasible gg: |is| <= 1 needs
    # (amax/step)^(3/4) < 1.5 + 0.0946, i.e. step > amax/1.5946^(4/3)
    # and gg = 210 + 4 log2(step) — start two below the bound (a safe
    # UNDERestimate: the q.max() guard below still rejects, so the
    # first feasible gg — and therefore the result — is unchanged;
    # scanning from 0 wasted ~190 full-array iterations per granule)
    gg_min = max(
        0,
        int(np.floor(210.0 + 4.0 * np.log2(amax / 1.8629))) - 2,
    )
    for gg in range(gg_min, 256):
        step = 2.0 ** ((gg - 210) / 4.0)
        q = np.rint(a34 / step**0.75 - 0.0946)
        if q.max() > 1:
            continue
        nz = q > 0
        n_nz = int(nz.sum())
        err = abs(n_nz * step * step - e_src)
        if best is None or err < best[0]:
            best = (err, gg, nz)
        if n_nz == 0:
            # every larger gg also quantizes to all-zero — nothing
            # further can change. (e_dec = count*step^2 is NOT
            # monotone in gg: count falls stepwise while step^2
            # grows, so an energy-threshold early exit would stop
            # before the true minimizer on top-heavy spectra.)
            break
    _, gg, nz = best
    return gg, np.where(nz, np.sign(x), 0.0).astype(np.int64)


def _code_granule(bw: _BitWriter, q: np.ndarray) -> int:
    """count1-region Huffman coding of a {-1,0,1} spectrum with
    table B (code = ~idx & 0xF, 4 bits) + sign bits (1 = negative).
    Returns the huffman bit count (= part2_3_length: zero scalefactor
    bits in this profile)."""
    nz = np.flatnonzero(q)
    last = (int(nz[-1]) // 4 + 1) * 4 if len(nz) else 0
    start = bw.bit_length()
    for base in range(0, last, 4):
        v, w, x, y = (int(abs(t)) for t in q[base : base + 4])
        idx = (v << 3) | (w << 2) | (x << 1) | y
        bw.write(~idx & 0xF, 4)
        for t in q[base : base + 4]:
            if t:
                bw.write(1 if t < 0 else 0, 1)
    return bw.bit_length() - start


def _version_params(sample_rate: int) -> tuple[int, list[int], int, int]:
    """(version_bits, bitrate_table, samples_per_frame,
    frame_length_factor) for the MPEG version this rate belongs to.
    MPEG-1 frames carry two granules (1152 samples, 144000*kbps/rate
    bytes); MPEG-2/2.5 LSF frames carry ONE granule (576 samples,
    72000*kbps/rate bytes)."""
    if sample_rate in _RATES:
        return 0b11, _BITRATES, 1152, 144000
    if sample_rate in _RATES_V2:
        return 0b10, _BITRATES_LSF, 576, 72000
    if sample_rate in _RATES_V25:
        return 0b00, _BITRATES_LSF, 576, 72000
    raise ValueError(
        "Layer III sample rate must be one of 32/44.1/48k (MPEG-1), "
        "16/22.05/24k (MPEG-2) or 8/11.025/12k (MPEG-2.5)"
    )


def _rate_index(sample_rate: int, version: int) -> int:
    return _RATES_BY_VERSION[version].index(sample_rate)


def _frame_header(
    bitrate_kbps: int, sample_rate: int, nch: int
) -> int:
    version, btable, _, _ = _version_params(sample_rate)
    return (
        (0x7FF << 21)
        | (version << 19)
        | (0b01 << 17)  # Layer III
        | (1 << 16)  # no CRC
        | (btable.index(bitrate_kbps) << 12)
        | (_rate_index(sample_rate, version) << 10)
        | (0 << 9)  # no padding
        | ((0b11 if nch == 1 else 0b00) << 6)  # mono / stereo
    )


def _write_granule_side(
    side: _BitWriter, ln: int, gg: int, lsf: bool
) -> None:
    side.write(ln, 12)  # part2_3_length (0 scalefactor bits)
    side.write(0, 9)  # big_values = 0: count1-only spectrum
    side.write(gg, 8)  # global_gain
    # scalefac_compress: 4 bits (MPEG-1) / 9 bits (LSF); 0 -> zero
    # scalefactor bits under either version's slen mapping
    side.write(0, 9 if lsf else 4)
    side.write(0, 1)  # window_switching_flag (long blocks)
    side.write(0, 15)  # table_select x3 (unused: bigvalues=0)
    side.write(0, 4)  # region0_count
    side.write(0, 3)  # region1_count
    if not lsf:
        side.write(0, 1)  # preflag (MPEG-1 only; LSF folds it
        # into the scalefac_compress semantics)
    side.write(0, 1)  # scalefac_scale
    side.write(1, 1)  # count1table_select = 1 (table B)


def encode_mp3(
    samples: np.ndarray,
    sample_rate: int = 32000,
    bitrate_kbps: int = 128,
) -> bytes:
    """(n,) or (n, ch<=2) int16 PCM -> MPEG-1 or MPEG-2/2.5 (LSF)
    Layer III bytes in this module's profile (long blocks, zero
    scalefactors, count1-only spectrum, no bit reservoir). The stream
    is syntactically valid MP3; decode_mp3 inverts it to PCM whose
    error is bounded by the two-level quantizer (see tests for the
    measured bounds)."""
    version, btable, frame_len, flen_factor = _version_params(
        sample_rate
    )
    lsf = version != 0b11
    if bitrate_kbps not in btable or bitrate_kbps == 0:
        raise ValueError(f"illegal bitrate for this MPEG version: "
                         f"{bitrate_kbps} kbps")
    pcm = np.asarray(samples, dtype=np.int16)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    n, nch = pcm.shape
    if nch > 2:
        raise ValueError("encode_mp3 supports 1-2 channels")
    # pad past the filterbank latency: the decoder trims its first
    # _CODEC_DELAY output samples (analysis+synthesis latency), so
    # without flush room the LAST 608 real samples would never leave
    # the overlap state — a single-granule clip would decode EMPTY
    nfrm = max(1, -(-(n + _CODEC_DELAY) // frame_len))
    padded = np.zeros((nfrm * frame_len, nch))
    padded[:n] = pcm.astype(np.float64) / 32768.0
    # analysis chain per channel: polyphase -> freq-invert ->
    # granule MDCT -> inverse antialias (so the decoder's normative
    # antialias restores the spectrum exactly)
    spec = []
    for c in range(nch):
        sub = _freq_invert(_analysis(padded[:, c]))
        spec.append(_antialias(_mdct_granules(sub), inverse=True))
    gr_per_frame = frame_len // _GRANULE

    out = bytearray()
    hdr = _frame_header(bitrate_kbps, sample_rate, nch)
    frame_bytes = flen_factor * bitrate_kbps // sample_rate
    if lsf:
        side_bytes = 9 if nch == 1 else 17
    else:
        side_bytes = 17 if nch == 1 else 32
    for f in range(nfrm):
        main = _BitWriter()
        lens, gains = [], []
        for g in range(gr_per_frame * f, gr_per_frame * (f + 1)):
            for c in range(nch):
                gg, q = _quantize_granule(spec[c][g])
                lens.append(_code_granule(main, q))
                gains.append(gg)
        main.pad_to_byte()
        side = _BitWriter()
        # main_data_begin: 9 bits (MPEG-1) / 8 bits (LSF); always 0
        side.write(0, 8 if lsf else 9)
        if lsf:
            side.write(0, 1 if nch == 1 else 2)  # private_bits
        else:
            side.write(0, 5 if nch == 1 else 3)  # private_bits
            for _ in range(nch):
                side.write(0, 4)  # scfsi: scalefactors never shared
        for ln, gg in zip(lens, gains):
            _write_granule_side(side, ln, gg, lsf)
        body = bytes(side.buf) + bytes(main.buf)
        if side_bytes + len(main.buf) + 4 > frame_bytes:
            raise ValueError(
                "granule data overflows the frame; raise bitrate_kbps"
            )
        out += hdr.to_bytes(4, "big")
        out += body
        out += bytes(frame_bytes - 4 - len(body))  # ancillary fill
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _parse_side_info(data: bytes, nch: int, lsf: bool) -> list[dict]:
    br = _BitReader(data)
    if br.read(8 if lsf else 9) != 0:
        raise NotImplementedError(
            "main_data_begin != 0: the bit reservoir is outside this "
            "decoder's profile"
        )
    if lsf:
        br.read(1 if nch == 1 else 2)
    else:
        br.read(5 if nch == 1 else 3)
        for _ in range(nch):
            if br.read(4) != 0:
                raise NotImplementedError(
                    "nonzero scfsi (shared scalefactors) unsupported"
                )
    grs = []
    for _ in range((1 if lsf else 2) * nch):
        g = {
            "part2_3_length": br.read(12),
            "big_values": br.read(9),
            "global_gain": br.read(8),
            "scalefac_compress": br.read(9 if lsf else 4),
            "window_switching": br.read(1),
        }
        if g["window_switching"]:
            raise NotImplementedError(
                "window switching (short blocks) needs the normative "
                "scalefactor-band tables; long-block profile only"
            )
        g["table_select"] = (br.read(5), br.read(5), br.read(5))
        g["region0_count"] = br.read(4)
        g["region1_count"] = br.read(3)
        g["preflag"] = 0 if lsf else br.read(1)
        g["scalefac_scale"] = br.read(1)
        g["count1table_select"] = br.read(1)
        if g["big_values"]:
            raise NotImplementedError(
                "bigvalues Huffman tables (1..31) are normative "
                "tables this decoder does not transcribe; profile "
                "codes the whole spectrum in the count1 region"
            )
        if g["scalefac_compress"]:
            raise NotImplementedError(
                "nonzero scalefactors need the normative scalefactor-"
                "band tables; profile is zero-scalefactor"
            )
        if g["count1table_select"] == 0:
            raise NotImplementedError(
                "count1 table A is a normative Huffman table this "
                "decoder does not transcribe (table B is algebraic)"
            )
        grs.append(g)
    return grs


def _decode_granule(br: _BitReader, g: dict) -> np.ndarray:
    """count1-region Huffman decode -> requantized spectral lines."""
    end = br.pos + g["part2_3_length"]
    if end > 8 * len(br.data):
        raise ValueError(
            "part2_3_length runs past the frame's main data"
        )
    q = np.zeros(_GRANULE, dtype=np.float64)
    line = 0
    while br.pos + 4 <= end and line + 4 <= _GRANULE:
        idx = ~br.read(4) & 0xF
        for k in range(4):
            v = (idx >> (3 - k)) & 1
            if v:
                if br.pos >= end:
                    raise ValueError("count1 sign bit past part2_3_length")
                if br.read(1):
                    v = -v
            q[line + k] = v
        line += 4
    if br.pos != end:
        br.pos = end  # stuffing bits inside part2_3_length are legal
    step = 2.0 ** ((g["global_gain"] - 210) / 4.0)
    return q * step  # |is|^(4/3) == |is| for two-level spectra


def decode_mp3(payload: bytes) -> tuple[np.ndarray, int]:
    """MPEG-1 or MPEG-2/2.5 Layer III bytes (this module's profile;
    see refusals in _parse_side_info) -> ((n, ch) int16 PCM,
    sample_rate). The filterbank latency (_CODEC_DELAY = 32 samples
    polyphase + 576 granule MDCT) is trimmed so sample 0 of the
    output aligns with sample 0 of the encoder's input; the encoder
    pads past that latency with flush frames, so EVERY real sample
    survives the trim and only trailing padding remains, as in any
    MP3 (no sample-count field in the format)."""
    pos = 0
    if payload[:3] == b"ID3":
        size = sum(
            (payload[6 + i] & 0x7F) << (7 * (3 - i)) for i in range(4)
        )
        pos = 10 + size
        if payload[5] & 0x10:
            # ID3v2.4 footer flag: a 10-byte footer follows the tag
            # and is NOT counted in the syncsafe size — without this
            # the scan desyncs 10 bytes early (ADVICE r9)
            pos += 10
    spec: list[list[np.ndarray]] = []
    rate = None
    nch = None
    ver = None
    while pos + 4 <= len(payload):
        if payload[pos] == 0 and not payload[pos:].strip(b"\x00"):
            break  # trailing zero fill
        hdr = int.from_bytes(payload[pos : pos + 4], "big")
        if hdr >> 21 != 0x7FF:
            raise ValueError("lost MP3 frame sync")
        f_ver = (hdr >> 19) & 3
        if f_ver == 0b01:
            raise ValueError("reserved MPEG version bits")
        if (hdr >> 17) & 3 != 0b01:
            raise NotImplementedError(
                "only Layer III is decoded (Layer I/II need their own "
                "subband quantizer tables)"
            )
        lsf = f_ver != 0b11
        bi, ri = (hdr >> 12) & 0xF, (hdr >> 10) & 3
        if bi == 0 or bi == 15 or ri == 3:
            raise NotImplementedError("free-format/invalid header")
        if not (hdr >> 16) & 1:
            raise NotImplementedError("CRC-protected frames unsupported")
        mode = (hdr >> 6) & 3
        if mode in (1, 2):
            raise NotImplementedError(
                "joint/dual stereo unsupported; mono or plain stereo"
            )
        f_nch = 1 if mode == 3 else 2
        f_rate = _RATES_BY_VERSION[f_ver][ri]
        if rate is None:
            rate, nch, ver = f_rate, f_nch, f_ver
            spec = [[] for _ in range(nch)]
        elif (f_rate, f_nch, f_ver) != (rate, nch, ver):
            raise ValueError("frame parameter change mid-stream")
        kbps = (_BITRATES if not lsf else _BITRATES_LSF)[bi]
        flen = (144000 if not lsf else 72000) * kbps // f_rate
        flen += (hdr >> 9) & 1
        if lsf:
            side_bytes = 9 if nch == 1 else 17
        else:
            side_bytes = 17 if nch == 1 else 32
        frame = payload[pos : pos + flen]
        if len(frame) < flen:
            raise ValueError("truncated MP3 frame")
        grs = _parse_side_info(frame[4 : 4 + side_bytes], nch, lsf)
        br = _BitReader(frame, 8 * (4 + side_bytes))
        for gi, g in enumerate(grs):
            spec[gi % nch].append(_decode_granule(br, g))
        pos += flen
    if rate is None:
        raise ValueError("no MP3 frames found")
    chans = []
    for c in range(nch):
        lines = _antialias(np.stack(spec[c]))
        sub = _freq_invert(_imdct_granules(lines))
        chans.append(_synthesis(sub))
    pcm = np.stack(chans, axis=1)
    pcm = pcm[_CODEC_DELAY:]
    pcm = np.clip(np.rint(pcm * 32768.0), -32768, 32767)
    return pcm.astype(np.int16), rate
