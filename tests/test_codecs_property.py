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
