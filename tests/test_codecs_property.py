"""Property tests for the pure-Python codecs (JPEG / GIF / ADPCM):
roundtrip invariants under randomized shapes and content, with
Hypothesis shrinking pathological cases. No Spark session — these run
in milliseconds and guard the bit-level paths (Huffman/LZW/nibble
packing) that fixed-seed tests can miss."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from funding_monitoring_spark.operators.adpcmcodec import (
    decode_adpcm_wav,
    encode_adpcm_wav,
)
from funding_monitoring_spark.operators.gifcodec import (
    decode_gif,
    encode_gif,
)
from funding_monitoring_spark.operators.jpegcodec import (
    decode_baseline_jpeg,
    encode_baseline_jpeg,
)

_PAL = np.stack(
    [np.arange(256), (np.arange(256) * 3) % 256,
     (np.arange(256) * 7) % 256],
    axis=1,
).astype(np.uint8)


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    seed=st.integers(0, 2**31 - 1),
    quality=st.sampled_from([60, 80, 95, 100]),
)
def test_jpeg_roundtrip_shape_and_bound(h, w, seed, quality):
    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    back = decode_baseline_jpeg(encode_baseline_jpeg(px, quality))
    assert back.shape == px.shape
    err = np.abs(back.astype(int) - px.astype(int)).mean()
    # worst case is noise at quality 60 — still far from garbage
    # (independent uint8 pairs average ~85 apart)
    assert err < 48, (h, w, quality, err)


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
    ncolors=st.sampled_from([2, 3, 16, 200, 256]),
)
def test_gif_roundtrip_exact(h, w, seed, ncolors):
    rng = np.random.RandomState(seed)
    idx = rng.randint(0, ncolors, size=(h, w)).astype(np.uint8)
    pal = _PAL[:ncolors]
    rgb, back = decode_gif(encode_gif(idx, pal))
    assert np.array_equal(back, idx)
    assert np.array_equal(rgb, pal[idx])


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(1, 1200),
    seed=st.integers(0, 2**31 - 1),
    amp=st.sampled_from([300, 4000, 15000]),
    period=st.sampled_from([20, 60, 200]),
)
def test_adpcm_roundtrip_shape_and_tracking(n, seed, amp, period):
    rng = np.random.RandomState(seed)
    phase = rng.uniform(0, 2 * np.pi)
    sig = (
        (amp * np.sin(2 * np.pi * np.arange(n) / period + phase))
        .astype(np.int16)
        .reshape(-1, 1)
    )
    out, rate = decode_adpcm_wav(encode_adpcm_wav(sig, 8000))
    assert rate == 8000 and out.shape == sig.shape
    if n >= 64:  # past cold-start adaptation
        err = np.abs(out.astype(int) - sig.astype(int)).mean()
        # step sizes track the slope: error stays a small fraction
        # of the amplitude
        assert err < max(64, amp * 0.2), (n, amp, period, err)


def test_gif_encode_rejects_out_of_palette_index():
    idx = np.full((4, 4), 5, dtype=np.uint8)
    pal = np.zeros((4, 3), dtype=np.uint8)  # indices must be < 4
    with pytest.raises(ValueError, match="outside the"):
        encode_gif(idx, pal)


# --- FLAC (operators/flaccodec.py) -----------------------------------

from funding_monitoring_spark.operators.flaccodec import (  # noqa: E402
    _BitWriter as _FlacBW,
    _crc8 as _flac_crc8,
    _crc16 as _flac_crc16,
    decode_flac,
    encode_flac,
)


@given(
    n=st.integers(1, 9000),
    ch=st.integers(1, 2),
    seed=st.integers(0, 2**16),
)
@settings(max_examples=25, deadline=None)
def test_flac_roundtrip_lossless(n, ch, seed):
    rng = np.random.RandomState(seed)
    kind = seed % 3
    if kind == 0:
        x = rng.randint(-32768, 32768, size=(n, ch)).astype(np.int16)
    elif kind == 1:
        t = np.linspace(0, n / 50.0, n)
        x = np.stack(
            [(3000 * np.sin(t + c)).astype(np.int16) for c in range(ch)],
            axis=1,
        )
    else:
        x = np.full((n, ch), seed % 100 - 50, dtype=np.int16)
    pcm, rate = decode_flac(encode_flac(x, 8000))
    assert rate == 8000
    assert np.array_equal(pcm, x.astype(np.int32))


def test_flac_empty_pcm_roundtrips_as_frameless_stream():
    # zero samples -> STREAMINFO-only stream, no frames (the old path
    # wrote a bogus 16-bit block size of -1 then crashed on x[0])
    for shape in ((0,), (0, 1), (0, 2)):
        data = encode_flac(np.zeros(shape, dtype=np.int16), 8000)
        pcm, rate = decode_flac(data)
        assert rate == 8000
        assert pcm.shape[0] == 0


def test_flac_compresses_smooth_signals():
    x = (2000 * np.sin(np.linspace(0, 20, 5000))).astype(np.int16)
    data = encode_flac(x, 8000)
    assert len(data) < 0.3 * x.size * 2  # far below raw PCM


def test_flac_rejects_malformed():
    x = np.arange(100, dtype=np.int16)
    data = bytearray(encode_flac(x, 8000))
    with pytest.raises(ValueError, match="fLaC magic"):
        decode_flac(b"RIFFnope")
    # corrupt one entropy byte -> a CRC catches it (16 covers frames)
    data[-3] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(data))


def test_flac_decodes_foreign_lpc_mid_side_stream():
    """Hand-built frame using features OUR encoder never emits — LPC
    subframe + mid/side stereo + rice2 residuals + a raw-escape
    partition — so the decoder is proven against the spec, not just
    against its own writer."""
    import struct as _st

    n = 16
    left = np.array(
        [(37 * i * i - 900 * i + 400) % 4001 - 2000 for i in range(n)],
        dtype=np.int64,
    )
    right = np.array(
        [(23 * i * i + 700 * i - 300) % 3001 - 1500 for i in range(n)],
        dtype=np.int64,
    )
    mid = (left + right) >> 1
    side = left - right

    def subframe_lpc(bw, x, bps):
        """order-1 LPC with coef=1, shift=0 (pred = prev sample)."""
        bw.write(0, 1)
        bw.write(0b100000, 6)  # LPC order 1
        bw.write(0, 1)  # no wasted bits
        bw.write(int(x[0]) & ((1 << bps) - 1), bps)  # warmup
        bw.write(3, 4)  # precision-1 = 3 -> 4-bit coefs
        bw.write(0, 5)  # shift 0
        bw.write(1, 4)  # coef = +1
        res = np.diff(x)
        bw.write(1, 2)  # rice2 (5-bit params)
        bw.write(0, 4)  # partition order 0
        bw.write(31, 5)  # escape -> raw
        raw = 18
        bw.write(raw, 5)
        for v in res.tolist():
            bw.write(int(v) & ((1 << raw) - 1), raw)

    # STREAMINFO: 16-bit, 2ch, 8000 Hz, n samples, zero MD5 (unset)
    si = bytearray()
    si += _st.pack(">HH", n, n)
    si += (0).to_bytes(3, "big") * 2
    packed = (8000 << 44) | (1 << 41) | (15 << 36) | n
    si += packed.to_bytes(8, "big")
    si += bytes(16)
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(si).to_bytes(3, "big") + si
    bw = _FlacBW()
    bw.write(0b11111111111110, 14)
    bw.write(0, 2)
    bw.write(6, 4)  # block size: 8-bit at end
    bw.write(4, 4)  # 8000 Hz
    bw.write(10, 4)  # mid/side
    bw.write(0b100, 3)  # 16 bps
    bw.write(0, 1)
    bw.write(0, 8)  # frame 0 (UTF-8 single byte)
    bw.write(n - 1, 8)
    hdr = bytes(bw.out)
    bw.write(_flac_crc8(hdr), 8)
    subframe_lpc(bw, mid, 16)
    subframe_lpc(bw, side, 17)  # side channel carries +1 bit
    bw.align()
    body = bytes(bw.out)
    bw.write(_flac_crc16(body), 16)
    out += bw.out
    pcm, rate = decode_flac(bytes(out))
    assert rate == 8000
    assert np.array_equal(pcm[:, 0], left)
    assert np.array_equal(pcm[:, 1], right)


# --- MP3 structural metadata (operators/mpegaudio.py) -----------------

from funding_monitoring_spark.operators.mpegaudio import (  # noqa: E402
    build_id3v2,
    build_mp3_frame,
    parse_mp3_metadata,
)


@given(
    bi=st.integers(1, 14),
    ri=st.integers(0, 2),
    n=st.integers(1, 12),
    id3=st.integers(-1, 200),
)
@settings(max_examples=40, deadline=None)
def test_mp3_metadata_scan_exact(bi, ri, n, id3):
    from funding_monitoring_spark.operators.mpegaudio import (
        _BITRATES,
        _RATES,
    )

    kbps, rate = _BITRATES[bi], _RATES[ri]
    buf = bytearray()
    if id3 >= 0:
        buf += build_id3v2(id3)
    for f in range(n):
        buf += build_mp3_frame(kbps, rate, pad=f % 2 == 0)
    m = parse_mp3_metadata(bytes(buf))
    assert m["n_frames"] == n
    assert m["bitrate_kbps"] == kbps
    assert m["sample_rate"] == rate
    assert m["duration_ms"] == n * 1152 * 1000 // rate
    assert m["id3v2_bytes"] == (10 + id3 if id3 >= 0 else 0)


def test_mp3_metadata_vbr_and_errors():
    buf = build_mp3_frame(128, 44100) + build_mp3_frame(320, 44100)
    assert parse_mp3_metadata(buf)["bitrate_kbps"] == -1  # VBR
    with pytest.raises(ValueError, match="sync"):
        parse_mp3_metadata(
            build_mp3_frame(128, 44100) + b"\x00\x00\x00\x00"
        )
    with pytest.raises(ValueError, match="truncated"):
        parse_mp3_metadata(build_mp3_frame(128, 44100) + b"\xff\xfb")
    hdr = bytearray(build_mp3_frame(128, 44100))
    hdr[1] = 0xEB  # version bits 01 (reserved), Layer III kept
    with pytest.raises(ValueError, match="reserved"):
        parse_mp3_metadata(bytes(hdr))


def test_mp3_metadata_mpeg2_lsf_frames():
    # MPEG-2 LSF: 64 kbps @ 22050 Hz -> 72000*64//22050 = 208-byte
    # frames, 576 samples each; build two by hand
    hdr = (
        (0x7FF << 21) | (0b10 << 19) | (0b01 << 17) | (1 << 16)
        | (8 << 12) | (0 << 10) | (0b11 << 6)
    )
    frame = hdr.to_bytes(4, "big") + bytes(72000 * 64 // 22050 - 4)
    m = parse_mp3_metadata(frame * 3)
    assert m["n_frames"] == 3
    assert m["bitrate_kbps"] == 64
    assert m["sample_rate"] == 22050
    assert m["duration_ms"] == 3 * 576 * 1000 // 22050


def test_mp3_metadata_real_world_mpeg2_file():
    # a genuine third-party MPEG-2 stream (shipped with gsutil's test
    # data in this image) must walk frame-exact
    import os

    path = (
        "/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/"
        "test_data/test.mp3"
    )
    if not os.path.exists(path):
        pytest.skip("no third-party mp3 on this machine")
    m = parse_mp3_metadata(open(path, "rb").read())
    assert m["sample_rate"] == 22050
    assert m["n_frames"] == 45
    assert m["id3v2_bytes"] == 32


def test_gif_interlaced_decode():
    """GIF89a interlacing: rows arrive in four passes; craft the
    stream by encoding pass-ordered rows and setting the interlace
    flag — decode must scatter them back exactly."""
    rng = np.random.RandomState(5)
    h, w = 13, 6
    idx = rng.randint(0, 8, size=(h, w)).astype(np.uint8)
    pal = rng.randint(0, 256, size=(8, 3)).astype(np.uint8)
    order = np.concatenate(
        [np.arange(0, h, 8), np.arange(4, h, 8),
         np.arange(2, h, 4), np.arange(1, h, 2)]
    )
    data = bytearray(encode_gif(idx[order], pal))
    data[data.index(0x2C) + 9] |= 0x40  # set the interlace flag
    rgb, back = decode_gif(bytes(data))
    assert np.array_equal(back, idx)
    assert np.array_equal(rgb, pal[idx])


def test_gif_local_color_table_overrides_global():
    """A local color table replaces the global one for its image —
    craft the stream by splicing an LCT into an encoded GIF and
    check pixels resolve against the LOCAL palette."""
    rng = np.random.RandomState(6)
    idx = rng.randint(0, 4, size=(5, 7)).astype(np.uint8)
    g_pal = np.zeros((4, 3), dtype=np.uint8)  # global: all black
    l_pal = rng.randint(0, 256, size=(4, 3)).astype(np.uint8)
    data = bytearray(encode_gif(idx, g_pal))
    i = data.index(0x2C)
    lct_bits = 1  # 2 << 1 = 4 entries
    data[i + 9] |= 0x80 | lct_bits
    data[i + 10 : i + 10] = l_pal.tobytes()  # splice LCT after descriptor
    rgb, back = decode_gif(bytes(data))
    assert np.array_equal(back, idx)
    assert np.array_equal(rgb, l_pal[idx])


# --- G.711 companding (operators/multimodal.py) -----------------------

from funding_monitoring_spark.operators.multimodal import (  # noqa: E402
    _alaw_to_linear,
    _linear_to_alaw,
    _linear_to_ulaw,
    _ulaw_to_linear,
    decode_wav,
    encode_g711_wav,
)


def test_g711_decode_anchors_and_idempotence():
    codes = np.arange(256, dtype=np.uint8)
    du = _ulaw_to_linear(codes)
    da = _alaw_to_linear(codes)
    # classic anchors: mu-law 0xFF is +0, 0x7F is -0; A-law 0x55 = -8
    assert int(du[0xFF]) == 0 and int(du[0x7F]) == 0
    assert int(da[0x55]) == -8
    # encode(decode(code)) returns every code — A-law exactly, mu-law
    # up to the canonical dual zero (0x7F normalizes to 0xFF)
    ra = _linear_to_alaw(da.astype(np.int16))
    assert np.array_equal(ra, codes)
    ru = _linear_to_ulaw(du.astype(np.int16))
    mism = np.flatnonzero(ru != codes)
    assert mism.tolist() == [0x7F] and ru[0x7F] == 0xFF


def test_g711_roundtrip_error_bounded_by_segment_step():
    xs = np.arange(-32768, 32768, dtype=np.int16)
    for enc, dec in (
        (_linear_to_ulaw, _ulaw_to_linear),
        (_linear_to_alaw, _alaw_to_linear),
    ):
        err = np.abs(
            dec(enc(xs)).astype(np.int64) - xs.astype(np.int64)
        )
        # top segment step is 1024 (A-law) / includes the mu-law bias
        # clip at full scale; half-step plus clip stays under 650
        assert err.max() <= 650, err.max()


def test_g711_wav_roundtrip_both_laws():
    pcm = (
        8000.0 * np.sin(np.arange(600, dtype=np.float64) / 9.0)
    ).astype(np.int16).reshape(-1, 2)
    for law in ("ulaw", "alaw"):
        out, rate = decode_wav(encode_g711_wav(pcm, 8000, law))
        assert rate == 8000 and out.shape == pcm.shape
        mae = np.abs(out.astype(np.float64) - pcm).mean()
        assert mae <= 150, (law, mae)
