"""IMA ADPCM WAV codec (WAVE format tag 0x11) — pure Python/numpy.

PCM WAV (operators/multimodal.py encode_wav/decode_wav) covers the
uncompressed audio wire format; this module adds a real COMPRESSED
one: IMA/DVI ADPCM, the classic 4-bits-per-sample adaptive-delta
codec (public spec: IMA Digital Audio Focus and Technical Working
Groups recommendation, 1992; the same tables every implementation
ships). 4x compression, deterministic integer arithmetic on both
encode and decode — no library-version dependence, so the lossy
roundtrip oracle's tolerance is stable by construction.

Wire format (mono):
- fmt chunk: tag 0x11, bits_per_sample 4, cbSize 2 extension holding
  samples_per_block; block_align bytes per block.
- fact chunk: exact total sample count (ADPCM decode would otherwise
  over-read the last block's padding).
- each data block: 4-byte header (predictor int16 = the block's
  first sample verbatim, step index uint8, reserved), then packed
  4-bit nibbles, low nibble first.

Stereo raises NotImplementedError (honest partial coverage — the
engine's fixtures are mono for the compressed-audio path).
"""

from __future__ import annotations

import struct

import numpy as np

#: the IMA step-size table (89 entries) and index-adaptation table —
#: fixed by the public spec, identical in every implementation
STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
    143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
    494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
    1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
    4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
    11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
    27086, 29794, 32767,
]
INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]

#: mono block layout: 4-byte header + (BLOCK_ALIGN - 4) nibble bytes
BLOCK_ALIGN = 256
SAMPLES_PER_BLOCK = (BLOCK_ALIGN - 4) * 2 + 1  # header sample + nibbles


def _clamp16(v: int) -> int:
    return -32768 if v < -32768 else (32767 if v > 32767 else v)


def _encode_nibble(diff: int, step: int) -> tuple[int, int]:
    """(nibble, reconstructed delta) for one sample difference."""
    nibble = 0
    if diff < 0:
        nibble = 8
        diff = -diff
    delta = step >> 3
    if diff >= step:
        nibble |= 4
        diff -= step
        delta += step
    if diff >= step >> 1:
        nibble |= 2
        diff -= step >> 1
        delta += step >> 1
    if diff >= step >> 2:
        nibble |= 1
        delta += step >> 2
    return nibble, (-delta if nibble & 8 else delta)


def encode_adpcm_wav(samples, sample_rate: int = 8000) -> bytes:
    """(n, 1) int16 -> IMA ADPCM WAV bytes (mono)."""
    pcm = np.asarray(samples, dtype=np.int16)
    if pcm.ndim != 2 or pcm.shape[1] != 1:
        raise NotImplementedError(
            "IMA ADPCM path encodes mono (n, 1) only"
        )
    flat = [int(v) for v in pcm[:, 0]]
    n = len(flat)
    blocks = bytearray()
    index = 0
    for lo in range(0, n, SAMPLES_PER_BLOCK):
        chunk = flat[lo : lo + SAMPLES_PER_BLOCK]
        predictor = chunk[0]
        blocks += struct.pack("<hBB", predictor, index, 0)
        nibbles = []
        for s in chunk[1:]:
            step = STEP_TABLE[index]
            nib, delta = _encode_nibble(s - predictor, step)
            predictor = _clamp16(predictor + delta)
            index = min(max(index + INDEX_TABLE[nib], 0), 88)
            nibbles.append(nib)
        # pad the final block's nibble area to the fixed block size
        nibbles += [0] * ((BLOCK_ALIGN - 4) * 2 - len(nibbles))
        for i in range(0, len(nibbles), 2):
            blocks.append(nibbles[i] | (nibbles[i + 1] << 4))
    byte_rate = (
        sample_rate * BLOCK_ALIGN + SAMPLES_PER_BLOCK - 1
    ) // SAMPLES_PER_BLOCK
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, sample_rate, byte_rate,
        BLOCK_ALIGN, 4, 2, SAMPLES_PER_BLOCK,
    )
    fact = struct.pack("<I", n)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(blocks)) + bytes(blocks)
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_adpcm_wav(payload: bytes):
    """IMA ADPCM WAV bytes -> ((n, 1) int16, sample_rate). Walks the
    RIFF chunks (fmt/fact/data), validates the format extension, and
    trims the final block's padding with the fact count."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, fact_n, data = 12, None, None, None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", payload, pos + 4)
        chunk = payload[pos + 8 : pos + 8 + ln]
        if tag == b"fmt ":
            fmt = chunk
        elif tag == b"fact":
            (fact_n,) = struct.unpack_from("<I", chunk, 0)
        elif tag == b"data":
            data = chunk
        pos += 8 + ln + (ln & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    tag_code, ch, rate, _br, block_align, bits = struct.unpack_from(
        "<HHIIHH", fmt, 0
    )
    if tag_code != 0x11 or bits != 4:
        raise NotImplementedError(
            f"not IMA ADPCM (format={tag_code}, bits={bits})"
        )
    if ch != 1:
        raise NotImplementedError("IMA ADPCM path decodes mono only")
    (spb,) = struct.unpack_from("<H", fmt, 18)
    out: list[int] = []
    for lo in range(0, len(data), block_align):
        block = data[lo : lo + block_align]
        predictor, index, _ = struct.unpack_from("<hBB", block, 0)
        index = min(max(index, 0), 88)
        out.append(predictor)
        produced = 1
        for b in block[4:]:
            for nib in (b & 0xF, b >> 4):
                if produced >= spb:
                    break
                step = STEP_TABLE[index]
                delta = step >> 3
                if nib & 4:
                    delta += step
                if nib & 2:
                    delta += step >> 1
                if nib & 1:
                    delta += step >> 2
                predictor = _clamp16(
                    predictor + (-delta if nib & 8 else delta)
                )
                index = min(max(index + INDEX_TABLE[nib], 0), 88)
                out.append(predictor)
                produced += 1
    if fact_n is not None:
        out = out[:fact_n]
    return np.array(out, dtype=np.int16).reshape(-1, 1), rate
