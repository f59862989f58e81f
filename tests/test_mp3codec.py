"""Pure Layer III codec (operators/mp3codec.py): PR algebra of every
filterbank stage, end-to-end roundtrip bounds, stream validity
against the independent metadata scanner, and loud profile refusals.
"""

from __future__ import annotations

import numpy as np
import pytest

from funding_monitoring_spark.operators import mp3codec as M
from funding_monitoring_spark.operators.mpegaudio import (
    parse_mp3_metadata,
)


def test_polyphase_pair_is_perfect_reconstruction():
    rng = np.random.RandomState(0)
    x = rng.randn(32 * 40)
    y = M._synthesis(M._analysis(x))
    # one block (32 samples) of TDAC latency, then exact
    assert np.abs(y[32:] - x[:-32]).max() < 1e-10


def test_granule_mdct_pair_is_perfect_reconstruction():
    rng = np.random.RandomState(1)
    sub = rng.randn(18 * 10, 32)
    rec = M._imdct_granules(M._mdct_granules(sub))
    # one granule (18 subband rows) of latency, then exact
    assert np.abs(rec[18:] - sub[:-18]).max() < 1e-10


def test_antialias_butterflies_invert_and_are_rotations():
    rng = np.random.RandomState(2)
    s = rng.randn(4, 576)
    back = M._antialias(M._antialias(s, inverse=True))
    assert np.abs(back - s).max() < 1e-12
    # cs^2 + ca^2 = 1 for each normative ci
    assert np.abs(M._CS**2 + M._CA**2 - 1.0).max() < 1e-12


def test_count1_table_b_is_the_nibble_complement():
    # every quadruple index codes in 4 bits as its one's complement —
    # trivially prefix-free; encoder and decoder share this table
    bw = M._BitWriter()
    q = np.zeros(576, dtype=np.int64)
    q[0], q[1], q[3] = 1, -1, 1  # quad (1,1,0,1) -> idx 13 -> code 2
    nbits = M._code_granule(bw, q)
    assert nbits == 4 + 3  # one codeword + three sign bits
    assert bw.acc == (2 << 3 | 0b010)  # code 0010, signs +,-,+


@pytest.mark.parametrize("ch", [1, 2])
@pytest.mark.parametrize("seed", [3, 4, 5])
def test_roundtrip_smooth_tones_within_bounds(ch, seed):
    rng = np.random.RandomState(seed)
    n = int(rng.randint(1500, 4000))
    j = np.arange(n, dtype=np.float64)[:, None]
    c = np.arange(ch, dtype=np.float64)[None, :]
    src = (
        8000.0 * np.sin(2.0 * np.pi * (seed * 13 + j + 7 * c) / 64.0)
    ).astype(np.int16)
    data = M.encode_mp3(src, 32000)
    pcm, rate = M.decode_mp3(data)
    assert rate == 32000 and pcm.shape[1] == ch
    assert abs(len(pcm) - n) <= 2 * 1152
    m = min(len(pcm), n)
    got = pcm[:m].astype(np.float64)
    ref = src[:m].astype(np.float64)
    ratio = (got**2).mean() / (ref**2).mean()
    assert 0.5 <= ratio <= 2.0, ratio
    for cc in range(ch):
        assert np.corrcoef(got[:, cc], ref[:, cc])[0, 1] >= 0.9


def test_streams_parse_with_the_independent_scanner():
    src = (6000.0 * np.sin(np.arange(2304) / 5.0)).astype(np.int16)
    for rate in (32000, 44100, 48000):
        meta = parse_mp3_metadata(M.encode_mp3(src, rate))
        assert meta["sample_rate"] == rate
        assert meta["bitrate_kbps"] == 128
        # 2304 samples + the 608-sample flush pad -> 3 MPEG-1 frames
        assert meta["n_frames"] == 3
        assert meta["id3v2_bytes"] == 0


@pytest.mark.parametrize(
    "rate,kbps",
    [(16000, 128), (22050, 128), (24000, 128),
     (8000, 64), (11025, 64), (12000, 64)],
)
def test_lsf_roundtrip_all_rates(rate, kbps):
    # MPEG-2 / MPEG-2.5 LSF: one granule per frame, 8/9-bit side-info
    # fields; the spectral pipeline is shared with MPEG-1
    n = 3000
    src = (
        8000.0 * np.sin(2.0 * np.pi * np.arange(n) * 437.0 / rate)
    ).astype(np.int16)
    data = M.encode_mp3(src, rate, bitrate_kbps=kbps)
    meta = parse_mp3_metadata(data)
    assert meta["sample_rate"] == rate
    assert meta["bitrate_kbps"] == kbps
    pcm, r2 = M.decode_mp3(data)
    assert r2 == rate
    m = min(len(pcm), n)
    g = pcm[:m, 0].astype(np.float64)
    s = src[:m].astype(np.float64)
    assert 0.5 <= (g**2).mean() / (s**2).mean() <= 2.0
    assert np.corrcoef(g, s)[0, 1] >= 0.8


def test_no_tail_loss_every_real_sample_survives_the_trim():
    # regression (round-9 review): the decoder trims its 608-sample
    # filterbank latency, so the encoder must pad past it with flush
    # frames — a single-granule LSF clip used to decode to ZERO
    # samples, and exact-multiple clips lost their last 608 samples
    for rate, n in [(16000, 576), (32000, 1152), (16000, 100)]:
        src = (
            8000.0 * np.sin(2.0 * np.pi * np.arange(n) * 437.0 / rate)
        ).astype(np.int16)
        pcm, _ = M.decode_mp3(M.encode_mp3(src, rate))
        assert len(pcm) >= n, (rate, n, len(pcm))
        g = pcm[:n, 0].astype(np.float64)
        s = src.astype(np.float64)
        assert np.corrcoef(g, s)[0, 1] >= 0.8  # tail included, aligned


def test_quantizer_scans_past_nonmonotone_energy():
    # regression (round-9 review): e_dec = count*step^2 is NOT
    # monotone in gg, so an energy-threshold early exit stopped
    # before the true minimizer on top-heavy spectra (one dominant
    # line + many sub-threshold lines decoded ~8 dB quiet)
    x = np.zeros(576)
    x[0] = 1.0
    x[1:21] = 0.26
    gg, q = M._quantize_granule(x)
    step = 2.0 ** ((gg - 210) / 4.0)
    e_dec = float((q != 0).sum()) * step * step
    e_src = float((x * x).sum())
    assert 0.5 <= e_dec / e_src <= 2.0, (gg, e_dec / e_src)


def test_overlong_part2_3_length_is_a_loud_value_error():
    # a 36-byte 8 kbps MPEG-2.5-rate... use MPEG-2 16k @ 8 kbps: the
    # frame is 36 bytes, so a part2_3_length of 4095 bits provably
    # overruns it — must be ValueError, never a raw IndexError (the
    # dispatch fallback in multimodal.decode_audio catches ValueError)
    data = bytearray(
        M.encode_mp3(np.zeros(576, dtype=np.int16), 16000, bitrate_kbps=8)
    )
    # LSF mono side info at byte 4: main_data_begin(8), private(1),
    # then part2_3_length(12); keep big_values' bits zero
    data[5] = (data[5] & 0x80) | 0x7F  # p23 bits 11..5 = 1111111
    data[6] = 0xF8  # p23 bits 4..0 = 11111, big_values[8:6] = 000
    with pytest.raises(ValueError, match="part2_3_length"):
        M.decode_mp3(bytes(data))


def test_silence_and_length_edges():
    pcm, rate = M.decode_mp3(
        M.encode_mp3(np.zeros(10, dtype=np.int16), 32000)
    )
    assert rate == 32000
    assert np.abs(pcm).max() == 0  # all-zero granules stay zero


def test_profile_refusals_are_loud():
    src = (4000.0 * np.sin(np.arange(1152) / 7.0)).astype(np.int16)
    data = bytearray(M.encode_mp3(src, 32000))
    with pytest.raises(ValueError, match="sample rate"):
        M.encode_mp3(src, 21000)  # not a Layer III rate at any version
    with pytest.raises(ValueError, match="bitrate"):
        M.encode_mp3(src, 16000, bitrate_kbps=320)  # MPEG-1-only rate
    # flip count1table_select (last bit of each granule's side info)
    # to table A: granule 0's side info starts at byte 4+2+... — do it
    # by re-encoding the side-info block: easier to corrupt the mode
    # bits to joint stereo and check the refusal path
    data[3] = (data[3] & 0x3F) | (0b01 << 6)
    with pytest.raises(NotImplementedError, match="stereo"):
        M.decode_mp3(bytes(data))
    # truncated stream
    with pytest.raises(ValueError, match="truncated"):
        M.decode_mp3(bytes(M.encode_mp3(src, 32000))[:100])
    # bad sync
    with pytest.raises(ValueError, match="sync"):
        M.decode_mp3(b"\x12\x34\x56\x78" * 4)


def test_decoder_refuses_bit_reservoir_and_table_a():
    src = (4000.0 * np.sin(np.arange(1152) / 7.0)).astype(np.int16)
    data = bytearray(M.encode_mp3(src, 32000))
    # main_data_begin lives in the first 9 bits after the header
    data[4] = 0x80
    with pytest.raises(NotImplementedError, match="reservoir"):
        M.decode_mp3(bytes(data))


def test_real_world_mpeg2_stream_refused_not_garbled():
    # a genuine third-party MP3 (MPEG-2 LSF) must refuse loudly at
    # the version check, never produce fake samples
    import os

    path = (
        "/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/"
        "test_data/test.mp3"
    )
    if not os.path.exists(path):
        pytest.skip("no third-party mp3 on this machine")
    payload = open(path, "rb").read()
    with pytest.raises(NotImplementedError):
        M.decode_mp3(payload)


def test_id3v24_footer_flag_skips_ten_extra_bytes():
    # ID3v2.4 footer flag (header byte 5 bit 4): a 10-byte footer
    # follows the tag body and is NOT counted in the syncsafe size.
    # Both the decoder and the independent scanner must skip it, or
    # the frame-sync scan desyncs 10 bytes early (ADVICE r9).
    src = (6000.0 * np.sin(np.arange(2304) / 5.0)).astype(np.int16)
    mp3 = M.encode_mp3(src, 32000)
    body = bytes(64)
    ss = bytes([(64 >> 21) & 0x7F, (64 >> 14) & 0x7F, (64 >> 7) & 0x7F, 64 & 0x7F])
    tag = b"ID3\x04\x00\x10" + ss + body + b"3DI\x04\x00\x10" + ss
    tagged = tag + mp3

    meta = parse_mp3_metadata(tagged)
    assert meta["id3v2_bytes"] == len(tag)
    assert meta["n_frames"] == 3
    assert meta["sample_rate"] == 32000

    pcm, rate = M.decode_mp3(tagged)
    ref, _ = M.decode_mp3(mp3)
    assert rate == 32000
    np.testing.assert_array_equal(pcm, ref)

    # footer flag ABSENT: the old path must be unchanged
    tag23 = b"ID3\x03\x00\x00" + ss + body
    meta23 = parse_mp3_metadata(tag23 + mp3)
    assert meta23["id3v2_bytes"] == len(tag23)
    assert meta23["n_frames"] == 3


def test_id3v2_frame_roundtrip_versions_and_encodings():
    from funding_monitoring_spark.operators.mpegaudio import (
        build_id3v2_frames,
        build_mp3_frame,
        parse_id3v2_frames,
        parse_mp3_metadata,
    )

    frames = {"TIT2": "Song", "TPE1": "Artist", "TRCK": "7/12"}
    for version, encoding in ((2, 0), (2, 1), (3, 0), (3, 1), (4, 0),
                              (4, 1), (4, 3)):
        tag = build_id3v2_frames(frames, version=version,
                                 encoding=encoding)
        stream = tag + 2 * build_mp3_frame(128, 44100)
        assert parse_id3v2_frames(stream) == frames, (version, encoding)
        # the structural walker still counts frames past the tag
        assert parse_mp3_metadata(stream)["n_frames"] == 2


def test_id3v2_unicode_and_padding_and_nontext():
    import struct

    from funding_monitoring_spark.operators.mpegaudio import (
        build_id3v2_frames,
        parse_id3v2_frames,
    )

    tag = build_id3v2_frames({"TIT2": "Ärtïst — ünïcode"}, version=4,
                             encoding=3)
    assert parse_id3v2_frames(tag)["TIT2"] == "Ärtïst — ünïcode"
    # inject a non-text frame (APIC-like) before a text frame: it
    # must be skipped structurally, not decoded
    apic = b"APIC" + struct.pack(">I", 5) + b"\x00\x00" + b"\x00imgs"
    body_at = 10
    doctored = bytearray(build_id3v2_frames({"TIT2": "x"}, version=3))
    inner = bytes(doctored[body_at:])
    new_body = apic + inner
    ss = bytes([(len(new_body) >> s) & 0x7F for s in (21, 14, 7, 0)])
    rebuilt = b"ID3\x03\x00\x00" + ss + new_body
    assert parse_id3v2_frames(rebuilt) == {"TIT2": "x"}
    # trailing padding terminates the walk cleanly
    padded = rebuilt[:6] + bytes(
        [(len(new_body) + 16 >> s) & 0x7F for s in (21, 14, 7, 0)]
    ) + new_body + bytes(16)
    assert parse_id3v2_frames(padded) == {"TIT2": "x"}


def test_id3v2_refusals_are_loud():
    import pytest

    from funding_monitoring_spark.operators.mpegaudio import (
        build_id3v2_frames,
        parse_id3v2_frames,
    )

    assert parse_id3v2_frames(b"\xff\xfbnotag") == {}
    # v2.2 COMPRESSION flag (bit 6) refuses; plain v2.2 now parses
    with pytest.raises(NotImplementedError):
        parse_id3v2_frames(
            b"ID3\x02\x00\x40\x00\x00\x00\x00"
        )
    # v2.2 knows text encodings 0/1 only
    with pytest.raises(ValueError):
        build_id3v2_frames({"TIT2": "x"}, version=2, encoding=3)
    # an unmappable v2.3 frame id must be NAMED in the error
    # (ADVICE r12: the message used to interpolate None)
    with pytest.raises(ValueError, match="ZZZZ"):
        build_id3v2_frames({"ZZZZ": "x"}, version=2)
    with pytest.raises(ValueError):
        parse_id3v2_frames(b"ID3\x05\x00\x00\x00\x00\x00\x00")
    tag = bytearray(build_id3v2_frames({"TIT2": "x"}, version=4))
    tag[14] |= 0x80  # corrupt the v2.4 frame size to non-syncsafe
    with pytest.raises(ValueError):
        parse_id3v2_frames(bytes(tag))


def test_id3v2_frame_overrunning_tag_is_loud():
    """A frame size that overruns the TAG (but not the file) must
    raise, not decode audio bytes as tag text (review r10)."""
    import struct

    import pytest

    from funding_monitoring_spark.operators.mpegaudio import (
        build_mp3_frame,
        parse_id3v2_frames,
    )

    frame = b"TIT2" + struct.pack(">I", 40) + b"\x00\x00" + b"\x00hi"
    body = frame  # declared 40, tag holds ~13
    ss = bytes([(len(body) >> s) & 0x7F for s in (21, 14, 7, 0)])
    tag = b"ID3\x03\x00\x00" + ss + body
    with pytest.raises(ValueError):
        parse_id3v2_frames(tag + build_mp3_frame(128, 44100))


def test_id3v2_unsynchronisation_refuses():
    import pytest

    from funding_monitoring_spark.operators.mpegaudio import (
        build_id3v2_frames,
        parse_id3v2_frames,
    )

    tag = bytearray(build_id3v2_frames({"TIT2": "x"}))
    tag[5] |= 0x80
    with pytest.raises(NotImplementedError):
        parse_id3v2_frames(bytes(tag))


def test_id3v22_three_char_frames_map_to_canonical_ids():
    """A v2.2 tag (3-char ids, 3-byte sizes, 6-byte headers) parses
    and surfaces TT2/TP1/TAL/TRK/TYE under the canonical v2.3+ ids;
    the structural walker still counts audio frames past it."""
    from funding_monitoring_spark.operators.mpegaudio import (
        build_id3v2_frames,
        build_mp3_frame,
        parse_id3v2_frames,
        parse_mp3_metadata,
    )

    # 4-char input ids down-map on write, up-map on read
    frames = {"TIT2": "Song", "TPE1": "Artist", "TALB": "Album",
              "TRCK": "3/9", "TYER": "1999"}
    tag = build_id3v2_frames(frames, version=2, encoding=1)
    # the wire carries 3-char ids and no flag bytes
    assert b"TT2" in tag and b"TIT2" not in tag
    stream = tag + 2 * build_mp3_frame(128, 44100)
    assert parse_id3v2_frames(stream) == frames
    assert parse_mp3_metadata(stream)["n_frames"] == 2
    # an unmapped v2.2 text frame surfaces under its own 3-char id
    tag2 = build_id3v2_frames({"TXX": "misc"}, version=2)
    assert parse_id3v2_frames(tag2) == {"TXX": "misc"}
