"""Pure-Python baseline JPEG codec (operators/jpegcodec.py): encode ->
decode roundtrip error bounds across shapes and qualities, padding /
cropping at non-multiple-of-8 dims, honest refusal of non-baseline
features, and malformed-stream rejection."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from funding_monitoring_spark.operators.jpegcodec import (
    _quality_tables,
    _zigzag_order,
    decode_baseline_jpeg,
    encode_baseline_jpeg,
    encode_jpeg12,
    encode_multiscan_jpeg,
)


def test_zigzag_is_a_permutation_with_known_anchors():
    z = _zigzag_order()
    assert sorted(z.tolist()) == list(range(64))
    # T.81 figure 5 anchors: DC first, then (0,1), (1,0), (2,0) ...
    assert z[0] == 0 and z[1] == 1 and z[2] == 8 and z[3] == 16
    assert z[63] == 63


def test_quality_scaling_monotone():
    q50, _ = _quality_tables(50)
    q95, _ = _quality_tables(95)
    q100, _ = _quality_tables(100)
    assert (q95 <= q50).all() and (q100 <= q95).all()
    assert q100.min() >= 1 and q50.max() <= 255


@pytest.mark.parametrize(
    "shape", [(1, 1), (2, 2), (5, 7), (8, 8), (13, 19), (32, 24)]
)
def test_roundtrip_noise_within_quantization_error(shape):
    rng = np.random.RandomState(hash(shape) % (2**31))
    px = rng.randint(0, 256, size=(*shape, 3), dtype=np.uint8)
    back = decode_baseline_jpeg(encode_baseline_jpeg(px, quality=95))
    assert back.shape == px.shape
    err = np.abs(back.astype(int) - px.astype(int))
    # noise is JPEG's worst case; q95 4:4:4 stays well-bounded
    assert err.mean() < 8, err.mean()
    chan = np.abs(
        back.reshape(-1, 3).mean(0) - px.reshape(-1, 3).mean(0)
    )
    assert (chan < 8).all(), chan  # roundtrip oracle uses +-16


def test_roundtrip_smooth_near_lossless():
    y, x = np.mgrid[0:24, 0:40]
    img = np.stack(
        [(x * 2) % 256, (y * 3) % 256, (x + y) % 256], axis=-1
    ).astype(np.uint8)
    back = decode_baseline_jpeg(encode_baseline_jpeg(img, 95))
    assert np.abs(back.astype(int) - img.astype(int)).max() <= 2


def test_roundtrip_flat_lossless():
    img = np.full((10, 10, 3), 200, np.uint8)
    back = decode_baseline_jpeg(encode_baseline_jpeg(img, 95))
    assert np.array_equal(back, img)


def test_quality_degrades_gracefully():
    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, size=(24, 24, 3), dtype=np.uint8)
    errs = [
        np.abs(
            decode_baseline_jpeg(
                encode_baseline_jpeg(px, q)
            ).astype(int)
            - px.astype(int)
        ).mean()
        for q in (25, 75, 100)
    ]
    assert errs[0] > errs[1] > errs[2]
    assert errs[2] < 1  # q100 on the identity quant floor


def test_rejects_non_baseline_and_malformed():
    rng = np.random.RandomState(4)
    px = rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
    data = bytearray(encode_baseline_jpeg(px, 95))
    # flip SOF0 -> SOF3 (lossless): honest refusal, not garbage
    # (SOF2/progressive decodes for real since round 8)
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC3
    with pytest.raises(NotImplementedError, match="non-baseline"):
        decode_baseline_jpeg(bytes(data))
    with pytest.raises(ValueError):
        decode_baseline_jpeg(b"\x00\x01")  # no SOI
    with pytest.raises(ValueError):
        decode_baseline_jpeg(b"\xff\xd8\xff\xe0\x00\x00garbage")


@pytest.mark.parametrize("sub", ["444", "422", "420"])
@pytest.mark.parametrize("shape", [(8, 8), (33, 47), (17, 9), (40, 24)])
def test_multiscan_decode_equals_baseline(sub, shape):
    # non-interleaved sequential is a REORDERING of the same
    # quantized coefficients (only the DC differentials re-baseline
    # per scan), so the strongest roundtrip test is exact pixel
    # equality with the interleaved decode — no tolerance
    rng = np.random.RandomState(11)
    px = rng.randint(0, 256, size=(*shape, 3), dtype=np.uint8)
    inter = decode_baseline_jpeg(encode_baseline_jpeg(px, 85, subsampling=sub))
    multi = decode_baseline_jpeg(
        encode_multiscan_jpeg(px, 85, subsampling=sub)
    )
    np.testing.assert_array_equal(inter, multi)


@pytest.mark.parametrize("interval", [1, 3, 7])
def test_multiscan_restart_markers_roundtrip(interval):
    # restart groups are DATA UNITS in a non-interleaved scan (T.81
    # B.2.3) — per-scan DC predictor resets + byte-aligned RSTn
    rng = np.random.RandomState(12)
    px = rng.randint(0, 256, size=(24, 40, 3), dtype=np.uint8)
    plain = decode_baseline_jpeg(encode_multiscan_jpeg(px, 85))
    rst = encode_multiscan_jpeg(px, 85, restart_interval=interval)
    assert b"\xff\xd0" in rst or b"\xff\xd1" in rst
    np.testing.assert_array_equal(plain, decode_baseline_jpeg(rst))


def test_partial_interleaved_scan_decodes():
    # Ns=2 subset-interleaved scan (Cb+Cr together, Y alone): legal
    # per T.81 B.2.3 — hand-assembled from the encoder's own token
    # machinery, must decode identically to the all-interleaved form
    from funding_monitoring_spark.operators.jpegcodec import (
        _DCT,
        _ZIGZAG,
        _entropy_tokens,
        _pack_tokens,
        _rgb_to_ycbcr,
    )

    rng = np.random.RandomState(13)
    h, w = 24, 16
    px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    ref_stream = encode_baseline_jpeg(px, 85)  # 444 interleaved
    qy, qc = _quality_tables(85)
    ycc = _rgb_to_ycbcr(px)
    cbh, cbw = h // 8, w // 8

    def comp_zz(ci):
        plane = ycc[..., ci] - 128.0
        blocks = (
            plane.reshape(cbh, 8, cbw, 8)
            .transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8)
        )
        coef = _DCT @ blocks @ _DCT.T
        q = (qy if ci == 0 else qc).reshape(8, 8)
        return np.round(coef / q).astype(np.int64).reshape(-1, 64)[:, _ZIGZAG]

    def chained_diff(dc):
        d = np.empty_like(dc)
        d[0] = dc[0]
        d[1:] = dc[1:] - dc[:-1]
        return d

    zzs = [comp_zz(ci) for ci in range(3)]
    nb = cbh * cbw
    # scan 1: Y alone, raster order
    c1, l1, _ = _entropy_tokens(
        zzs[0], chained_diff(zzs[0][:, 0]), np.arange(nb)
    )
    # scan 2: Cb+Cr interleaved per frame MCU (444: one block each)
    zz2 = np.concatenate([zzs[1], zzs[2]])
    diff2 = np.concatenate(
        [chained_diff(zzs[1][:, 0]), chained_diff(zzs[2][:, 0])]
    )
    bids2 = np.concatenate([2 * np.arange(nb), 2 * np.arange(nb) + 1])
    c2, l2, _ = _entropy_tokens(zz2, diff2, bids2)

    # splice: reuse the reference stream's headers up to its SOS
    i = ref_stream.find(b"\xff\xda")
    out = bytearray(ref_stream[:i])
    out += struct.pack(">HH", 0xFFDA, 8) + bytes([1, 1, 0x00, 0, 63, 0])
    out += _pack_tokens(c1, l1)
    out += struct.pack(">HH", 0xFFDA, 10) + bytes(
        [2, 2, 0x11, 3, 0x11, 0, 63, 0]
    )
    out += _pack_tokens(c2, l2)
    out += b"\xff\xd9"
    np.testing.assert_array_equal(
        decode_baseline_jpeg(bytes(out)), decode_baseline_jpeg(ref_stream)
    )


def test_multiscan_incomplete_frame_is_loud():
    # a stream whose scans never cover all frame components must
    # fail with a named ValueError at EOI, not return garbage
    rng = np.random.RandomState(14)
    px = rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
    data = encode_multiscan_jpeg(px, 85)
    # keep only the first SOS (Y): cut at the second SOS marker
    first = data.find(b"\xff\xda")
    second = data.find(b"\xff\xda", first + 2)
    truncated = data[:second] + b"\xff\xd9"
    with pytest.raises(ValueError, match="never coded"):
        decode_baseline_jpeg(truncated)
    # and a component coded twice is rejected too
    dup = data[:second] + data[first:second] + data[second:]
    with pytest.raises(ValueError, match="coded twice"):
        decode_baseline_jpeg(dup)


def test_progressive_encoder_rejects_desyncing_dc_scan():
    # single-component DC scans are non-interleaved: with 4:2:0
    # subsampling and non-MCU-multiple dims the encoder's padded MCU
    # walk and a decoder's unpadded component walk would desync
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(17, 23, 3), dtype=np.uint8)
    scans = [
        ([0], 0, 0, 0, 1), ([1], 0, 0, 0, 1), ([2], 0, 0, 0, 1),
        ([0], 0, 0, 1, 0), ([1], 0, 0, 1, 0), ([2], 0, 0, 1, 0),
        ([0], 1, 63, 0, 0), ([1], 1, 63, 0, 0), ([2], 1, 63, 0, 0),
    ]
    with pytest.raises(NotImplementedError, match="single-component"):
        encode_progressive_jpeg(px, 90, subsampling="420", scans=scans)
    # luma-only DC scan on a non-subsampled frame: grids match, so
    # the stream encodes and decodes exactly like the baseline path
    data = encode_progressive_jpeg(px, 90, subsampling="444", scans=scans)
    base = decode_baseline_jpeg(
        encode_baseline_jpeg(px, 90, subsampling="444")
    )
    assert np.array_equal(decode_baseline_jpeg(data), base)


def test_jpeg12_roundtrip_within_quantization_error():
    # extended sequential (SOF1) at 12-bit precision: smooth content
    # reconstructs within a few 8-bit codes after the /16 reduction
    for shape in [(8, 8), (16, 16), (17, 23)]:
        h, w = shape
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
        base = 2048 + 1500 * np.sin(yy / 6.0) + 1200 * np.cos(xx / 7.0)
        px = np.clip(
            np.stack([base, base * 0.8 + 300, base * 0.6 + 800], -1),
            0,
            4095,
        ).astype(np.uint16)
        out = decode_baseline_jpeg(encode_jpeg12(px, 95))
        err = np.abs(out.astype(np.float64) - px / 16.0)
        assert err.max() <= 8.0, (shape, err.max())


def test_jpeg12_structure_and_refusals():
    px = np.full((8, 8, 3), 2048, dtype=np.uint16)
    data = encode_jpeg12(px)
    assert b"\xff\xc1" in data  # SOF1, not SOF0
    i = data.find(b"\xff\xdb")
    assert data[i + 4] >> 4 == 1  # DQT Pq=1: 16-bit entries
    with pytest.raises(ValueError, match="0..4095"):
        encode_jpeg12(np.full((8, 8, 3), 5000, dtype=np.uint16))
    # SOF0 must stay 8-bit by definition
    d8 = bytearray(encode_baseline_jpeg(np.zeros((8, 8, 3), np.uint8)))
    j = d8.find(b"\xff\xc0")
    d8[j + 4] = 12
    with pytest.raises(ValueError, match="8-bit by definition"):
        decode_baseline_jpeg(bytes(d8))
    # 12-bit progressive stays a loud refusal
    d12 = bytearray(data)
    k = d12.find(b"\xff\xc1")
    d12[k + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="12-bit progressive"):
        decode_baseline_jpeg(bytes(d12))


def test_rejects_unsupported_sampling_factors():
    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
    data = bytearray(encode_baseline_jpeg(px, 95))
    i = data.find(b"\xff\xc0")
    # component 1's H/V byte lives at SOF body offset 7 (marker+len=4,
    # prec/h/w/nc=6, comp id=1): H=3 is outside the supported set
    data[i + 4 + 6 + 1] = 0x33
    with pytest.raises(NotImplementedError, match="sampling factors"):
        decode_baseline_jpeg(bytes(data))


@pytest.mark.parametrize("sub", ["420", "422"])
@pytest.mark.parametrize("shape", [(64, 64), (17, 23), (9, 8), (15, 31)])
def test_subsampled_roundtrip_within_tolerance(sub, shape):
    """4:2:0 / 4:2:2: encode with box-downsampled chroma, decode with
    replication upsample — smooth fields stay within a small fixed
    error, and the stream is smaller than its 4:4:4 twin."""
    hh, ww = shape
    gx = np.linspace(0, 5, hh)[:, None]
    gy = np.linspace(0, 5, ww)[None, :]
    img = (127 + 60 * np.sin(gx) * np.cos(gy)).astype(np.uint8)
    px = np.stack([img, np.flipud(img), 255 - img], axis=-1)
    full = encode_baseline_jpeg(px, 90, subsampling="444")
    data = encode_baseline_jpeg(px, 90, subsampling=sub)
    if hh >= 32 and ww >= 32:  # tiny frames pad up to the 16px MCU
        assert len(data) < len(full)
    back = decode_baseline_jpeg(data)
    assert back.shape == px.shape
    assert np.abs(back.astype(int) - px.astype(int)).mean() < 16


def test_subsampled_grid_alignment_exact_on_flat_image():
    """A constant image survives 4:2:0 losslessly — any MCU/upsample
    misalignment would smear block borders and break this."""
    px = np.full((24, 40, 3), 200, dtype=np.uint8)
    back = decode_baseline_jpeg(
        encode_baseline_jpeg(px, 95, subsampling="420")
    )
    assert np.array_equal(back, px)


def test_subsampled_restart_markers_roundtrip():
    x = np.linspace(0, 6, 48)
    img = (127 + 60 * np.sin(x)[:, None] * np.cos(x)[None, :]).astype(
        np.uint8
    )
    px = np.stack([img, img.T, 255 - img], axis=-1)
    data = encode_baseline_jpeg(
        px, 85, restart_interval=2, subsampling="420"
    )
    assert b"\xff\xd0" in data or b"\xff\xd1" in data
    back = decode_baseline_jpeg(data)
    assert np.abs(back.astype(int) - px.astype(int)).mean() < 8


def test_stuffed_ff_bytes_survive():
    """Entropy data containing 0xFF bytes must byte-stuff on encode
    and unstuff on decode; random noise at high quality reliably
    produces them — assert the stream actually contains FF00."""
    rng = np.random.RandomState(0)  # seed chosen to hit a stuffed FF
    px = rng.randint(0, 256, size=(32, 32, 3), dtype=np.uint8)
    data = encode_baseline_jpeg(px, 98)
    assert b"\xff\x00" in data
    back = decode_baseline_jpeg(data)
    assert back.shape == px.shape
    assert np.abs(back.astype(int) - px.astype(int)).mean() < 8


@pytest.mark.parametrize("interval", [1, 2, 3])
def test_restart_markers_roundtrip(interval):
    """DRI + RSTn: byte-aligned restarts with DC-predictor resets must
    decode identically to the marker-free stream — exercises the
    decoder's resynchronization path (real encoders emit these for
    error resilience / parallel decode)."""
    rng = np.random.RandomState(9)
    px = rng.randint(0, 256, size=(24, 40, 3), dtype=np.uint8)  # 15 MCUs
    plain = decode_baseline_jpeg(encode_baseline_jpeg(px, 95))
    data = encode_baseline_jpeg(px, 95, restart_interval=interval)
    assert b"\xff\xdd" in data  # DRI present
    assert any(bytes([0xFF, 0xD0 + j]) in data for j in range(8))
    with_rst = decode_baseline_jpeg(data)
    assert np.array_equal(with_rst, plain)


def test_ff_fill_bytes_before_marker_tolerated():
    """T.81 B.1.1.2 allows any number of 0xFF fill bytes before a
    marker id; another encoder's spec-legal padding must parse."""
    rng = np.random.RandomState(11)
    px = rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
    data = encode_baseline_jpeg(px, 90)
    i = data.find(b"\xff\xdb")  # pad before the first DQT
    padded = data[:i] + b"\xff\xff\xff" + data[i:]
    back = decode_baseline_jpeg(padded)
    assert np.array_equal(back, decode_baseline_jpeg(data))


# --- progressive (SOF2) ------------------------------------------------

from funding_monitoring_spark.operators.jpegcodec import (  # noqa: E402
    encode_progressive_jpeg,
)


@pytest.mark.parametrize("sub", ["444", "420", "422"])
@pytest.mark.parametrize("quality", [75, 95])
def test_progressive_decode_equals_baseline(sub, quality):
    """Progressive is a REORDERING of the same quantized
    coefficients: decoding the 10-scan SOF2 stream must equal the
    baseline decode bit-for-bit — any error in spectral selection,
    successive approximation, EOB runs, or correction bits breaks
    coefficient equality and therefore this exact comparison."""
    x = np.linspace(0, 6, 64)
    img = (127 + 60 * np.sin(x)[:, None] * np.cos(x)[None, :]).astype(
        np.uint8
    )
    px = np.stack([img, img.T, 255 - img], axis=-1)
    base = decode_baseline_jpeg(
        encode_baseline_jpeg(px, quality, subsampling=sub)
    )
    prog = decode_baseline_jpeg(
        encode_progressive_jpeg(px, quality, subsampling=sub)
    )
    assert np.array_equal(base, prog)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("shape", [(8, 8), (17, 23), (32, 24), (15, 31)])
def test_progressive_noise_and_odd_shapes(seed, shape):
    """Noise maximizes nonzero AC coefficients (stressing ZRL /
    newly-significant paths); odd shapes stress the non-interleaved
    component grids, which are SMALLER than the MCU-padded grid for
    subsampled components."""
    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, size=(*shape, 3), dtype=np.uint8)
    for sub in ("444", "420"):
        base = decode_baseline_jpeg(
            encode_baseline_jpeg(px, 90, subsampling=sub)
        )
        prog = decode_baseline_jpeg(
            encode_progressive_jpeg(px, 90, subsampling=sub)
        )
        assert np.array_equal(base, prog), (seed, shape, sub)


def test_progressive_flat_image_sparse_scans():
    """A flat image drives every AC scan through pure EOB runs."""
    px = np.full((24, 40, 3), 130, dtype=np.uint8)
    prog = decode_baseline_jpeg(encode_progressive_jpeg(px, 95))
    assert np.array_equal(prog, px)


@pytest.mark.parametrize("interval", [1, 2, 3])
def test_progressive_restart_markers_roundtrip(interval):
    """Progressive scans with RSTn: byte-aligned restarts reset DC
    predictors AND flush EOB runs (an EOB run must not cross a
    restart boundary); decode must still equal the baseline decode
    exactly — this exercises the progressive decoder's restart
    resynchronization path with real markers."""
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(32, 24, 3), dtype=np.uint8)
    for sub in ("444", "420"):
        base = decode_baseline_jpeg(
            encode_baseline_jpeg(px, 90, subsampling=sub)
        )
        data = encode_progressive_jpeg(
            px, 90, subsampling=sub, restart_interval=interval
        )
        assert b"\xff\xdd" in data
        assert any(bytes([0xFF, 0xD0 + j]) in data for j in range(8))
        assert np.array_equal(decode_baseline_jpeg(data), base)
