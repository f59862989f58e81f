"""AIFF / AIFF-C codec tests (operators/multimodal.py): 80-bit
extended-float field, chunk roundtrips across the three uncompressed
profiles, 8-bit signed widening, and loud refusals."""

import struct

import numpy as np
import pytest

from funding_monitoring_spark.operators.multimodal import (
    _f80_decode,
    _f80_encode,
    decode_aiff,
    decode_audio,
    encode_aiff,
)


@pytest.mark.parametrize(
    "rate", [0, 1, 2, 3, 8000, 11025, 22050, 44100, 48000, 96000, 192000]
)
def test_f80_roundtrip(rate):
    assert _f80_decode(_f80_encode(rate)) == rate


def test_f80_known_encoding_44100():
    # 44100 = 0b1010110001000100 (16 bits) -> exponent 16383+15,
    # mantissa 44100 << 48 — the classic bytes every AIFF carries
    assert _f80_encode(44100) == bytes.fromhex("400eac44000000000000")


def test_f80_negative_sign_bit():
    b = bytearray(_f80_encode(8000))
    b[0] |= 0x80
    assert _f80_decode(bytes(b)) == -8000


@pytest.mark.parametrize("form,little", [(b"AIFF", False), (b"AIFC", False),
                                         (b"AIFC", True)])
@pytest.mark.parametrize("n,ch", [(1, 1), (50, 1), (37, 2)])
def test_pcm_roundtrip(form, little, n, ch):
    rng = np.random.RandomState(n * ch)
    pcm = rng.randint(-32768, 32768, (n, ch)).astype(np.int16)
    payload = encode_aiff(pcm, 8000, form=form, little_endian=little)
    out, rate = decode_aiff(payload)
    assert rate == 8000
    assert (out == pcm).all()
    # and through the magic-byte dispatch
    out2, _ = decode_audio(payload)
    assert (out2 == pcm).all()


def test_ssnd_offset_honored():
    pcm = np.arange(10, dtype=np.int16).reshape(5, 2)
    payload = encode_aiff(pcm, 8000)
    # rebuild with 4 junk bytes of SSND offset
    idx = payload.index(b"SSND")
    (ln,) = struct.unpack(">L", payload[idx + 4 : idx + 8])
    data = payload[idx + 16 : idx + 8 + ln]
    new_body = struct.pack(">LL", 4, 0) + b"\xde\xad\xbe\xef" + data
    rebuilt = (
        payload[:idx]
        + b"SSND"
        + struct.pack(">L", len(new_body))
        + new_body
    )
    rebuilt = rebuilt[:4] + struct.pack(">L", len(rebuilt) - 8) + rebuilt[8:]
    out, _ = decode_aiff(rebuilt)
    assert (out == pcm).all()


def test_8bit_is_signed_and_widened():
    pcm = np.array([[-128], [0], [127]], dtype=np.int16)
    payload = encode_aiff(pcm, 8000)
    # rewrite COMM sampleSize to 8 and shrink SSND to int8
    idx = payload.index(b"COMM")
    comm = bytearray(payload)
    comm[idx + 8 + 6 : idx + 8 + 8] = struct.pack(">h", 8)
    sidx = payload.index(b"SSND")
    body = struct.pack(">LL", 0, 0) + np.array(
        [-128, 0, 127], dtype=np.int8
    ).tobytes() + b"\x00"  # word-align pad
    rebuilt = (
        bytes(comm[:sidx])
        + b"SSND"
        + struct.pack(">L", len(body) - 1)
        + body
    )
    rebuilt = rebuilt[:4] + struct.pack(">L", len(rebuilt) - 8) + rebuilt[8:]
    out, _ = decode_aiff(rebuilt)
    assert out.tolist() == [[-32768], [0], [32512]]


def test_refusals_are_loud():
    pcm = np.zeros((4, 1), dtype=np.int16)
    payload = encode_aiff(pcm, 8000, form=b"AIFC")
    bad = bytearray(payload)
    i = payload.index(b"NONE")
    bad[i : i + 4] = b"ima4"
    with pytest.raises(NotImplementedError):
        decode_aiff(bytes(bad))
    with pytest.raises(ValueError):
        decode_aiff(b"FORM\x00\x00\x00\x04WAVE")
    with pytest.raises(ValueError):
        encode_aiff(pcm, 8000, form=b"AIFF", little_endian=True)
    truncated = payload[: payload.index(b"SSND")]
    with pytest.raises(ValueError):
        decode_aiff(
            truncated[:4]
            + struct.pack(">L", len(truncated) - 8)
            + truncated[8:]
        )


def test_fixture_field_matches_wav_samples():
    from funding_monitoring_spark.operators.multimodal import (
        _wav_samples,
        _wav_shape,
    )

    for mid in [0, 1, 2, 3, 7, 100]:
        n, ch = _wav_shape(mid)
        pcm = _wav_samples(mid, n, ch)
        form = (b"AIFF", b"AIFC", b"AIFC")[mid % 3]
        payload = encode_aiff(pcm, 8000, form=form,
                              little_endian=(mid % 3 == 2))
        out, rate = decode_audio(payload)
        assert rate == 8000 and (out == pcm).all()
