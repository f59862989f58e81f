"""MPEG audio (MP3) frame-header metadata scanner — no PCM decode.

The dominant compressed-audio format's FULL-profile decode needs
normative Huffman/scalefactor-band tables this repo will not
transcribe from memory (policy: loud refusal over faked samples —
sample-level decode lives in operators/mp3codec.py for the
constrained profile it documents, and full-profile streams ride the
optional soundfile dependency, operators/multimodal.py decode_mp3).
But a large-scale media pipeline's FIRST pass over an audio corpus
is not decode — it's metadata profiling: codec, bitrate, sample
rate, duration, tag presence, for routing/filtering/cost estimates.
That pass IS implementable exactly from the public header layout
(ISO/IEC 11172-3 frame header + the ID3v2 tag envelope), and this
module does it for real:

- ID3v2: 'ID3' magic, version/flags, 4-byte SYNCSAFE size (7 bits
  per byte) — skipped, reported.
- Frame walk: 11-bit sync, MPEG version, Layer III, bitrate index
  (MPEG-1: 32..320 kbps; MPEG-2/2.5 LSF: 8..160 kbps), sample-rate
  index (44100/48000/32000, halved for MPEG-2, quartered for 2.5),
  padding bit; frame byte length = 144000*kbps/rate (MPEG-1, 1152
  samples/frame) or 72000*kbps/rate (LSF, 576 samples/frame) plus
  padding. Every frame's header is validated — a broken offset
  desyncs immediately and raises.
- VBR detection: bitrate reported as the exact kbps when constant,
  -1 (VBR) when frames disagree.

Free-format (bitrate index 0) and Layer I/II raise
NotImplementedError with the reason.

Sample-level decode lives in operators/mp3codec.py (dependency-free
MPEG-1 Layer III in a documented constrained profile; full-profile
streams ride the optional soundfile path in operators/multimodal.py).
"""

from __future__ import annotations

#: MPEG-1 Layer III bitrates by header index (kbps); 0 = free format
_BITRATES = [
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
]
_RATES = [44100, 48000, 32000]
_SAMPLES_PER_FRAME = 1152

#: MPEG-2/2.5 (LSF) Layer III bitrates by header index (kbps)
_BITRATES_LSF = [
    0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160,
]


def build_mp3_frame(
    bitrate_kbps: int, sample_rate: int, pad: bool = False
) -> bytes:
    """One syntactically-valid MPEG-1 Layer III frame (header + zero
    main data) — the writer half of the metadata-scan round trip.
    The payload is NOT decodable audio and is never claimed to be;
    the frame STRUCTURE (sync, indices, computed length) is real."""
    bi = _BITRATES.index(bitrate_kbps)
    ri = _RATES.index(sample_rate)
    hdr = (
        (0x7FF << 21)
        | (0b11 << 19)  # MPEG-1
        | (0b01 << 17)  # Layer III
        | (1 << 16)  # no CRC
        | (bi << 12)
        | (ri << 10)
        | (int(pad) << 9)
        | (0b11 << 6)  # mono
    )
    length = 144000 * bitrate_kbps // sample_rate + int(pad)
    return hdr.to_bytes(4, "big") + bytes(length - 4)


def build_id3v2(size: int) -> bytes:
    """A minimal ID3v2.3 tag envelope of ``size`` payload bytes
    (syncsafe-coded length), zero-filled frames area."""
    if size < 0 or size >= 1 << 28:
        raise ValueError("ID3v2 size out of syncsafe range")
    ss = bytes(
        [(size >> 21) & 0x7F, (size >> 14) & 0x7F,
         (size >> 7) & 0x7F, size & 0x7F]
    )
    return b"ID3\x03\x00\x00" + ss + bytes(size)


def parse_mp3_metadata(payload: bytes) -> dict:
    """Walk the stream and return exact structural metadata:
    {n_frames, bitrate_kbps (-1 if VBR), sample_rate, duration_ms,
    id3v2_bytes}. Raises ValueError on desync/truncation and
    NotImplementedError on non-MPEG-1-Layer-III profiles."""
    pos = 0
    id3 = 0
    if payload[:3] == b"ID3":
        if len(payload) < 10:
            raise ValueError("truncated ID3v2 header")
        ss = payload[6:10]
        if any(b & 0x80 for b in ss):
            raise ValueError("non-syncsafe ID3v2 size")
        id3 = 10 + (
            (ss[0] << 21) | (ss[1] << 14) | (ss[2] << 7) | ss[3]
        )
        if payload[5] & 0x10:
            # ID3v2.4 footer flag: 10 extra bytes after the tag,
            # excluded from the syncsafe size (ADVICE r9)
            id3 += 10
        pos = id3
    n_frames = 0
    bitrates: set[int] = set()
    rate = None
    ver_bits = None
    spf = 1152
    while pos < len(payload):
        if pos + 4 > len(payload):
            raise ValueError(f"truncated frame header at byte {pos}")
        hdr = int.from_bytes(payload[pos : pos + 4], "big")
        if (hdr >> 21) & 0x7FF != 0x7FF:
            raise ValueError(f"lost MP3 frame sync at byte {pos}")
        version = (hdr >> 19) & 0x3
        layer = (hdr >> 17) & 0x3
        if version == 0b01:
            raise ValueError("reserved MPEG version bits")
        if layer != 0b01:
            raise NotImplementedError(
                "only Layer III (MP3) frames are scanned"
            )
        bi = (hdr >> 12) & 0xF
        ri = (hdr >> 10) & 0x3
        if bi == 0:
            raise NotImplementedError("free-format bitrate")
        if bi == 0xF or ri == 0x3:
            raise ValueError("invalid bitrate/sample-rate index")
        if version == 0b11:  # MPEG-1: 1152 samples, 144*k/r frames
            kbps = _BITRATES[bi]
            r = _RATES[ri]
            spf, flen = 1152, 144000 * kbps
        else:  # MPEG-2 (10) / MPEG-2.5 (00) LSF: 576 samples
            kbps = _BITRATES_LSF[bi]
            r = _RATES[ri] // (2 if version == 0b10 else 4)
            spf, flen = 576, 72000 * kbps
        if ver_bits is None:
            ver_bits = version
        elif ver_bits != version:
            raise ValueError("MPEG version changes mid-stream")
        if rate is None:
            rate = r
        elif rate != r:
            raise ValueError("sample rate changes mid-stream")
        bitrates.add(kbps)
        pad = (hdr >> 9) & 1
        pos += flen // r + pad
        n_frames += 1
    if n_frames == 0:
        raise ValueError("no MP3 frames found")
    return {
        "n_frames": n_frames,
        "bitrate_kbps": bitrates.pop() if len(bitrates) == 1 else -1,
        "sample_rate": rate,
        "duration_ms": n_frames * spf * 1000 // rate,
        "id3v2_bytes": id3,
    }


# -- ID3v2 text frames (id3.org informal standard, v2.3/v2.4) ---------------

#: text-information frame encodings (frame byte 0)
_ID3_ENCODINGS = {
    0: "latin-1",
    1: "utf-16",     # with BOM
    2: "utf-16-be",  # v2.4, no BOM
    3: "utf-8",      # v2.4
}


#: v2.2 three-char text frames → their canonical v2.3+ four-char ids
#: (the upgrade mapping every tag library applies); unknown v2.2 text
#: frames surface under their own 3-char id
_ID3V22_TO_V23 = {
    "TT2": "TIT2",  # title
    "TP1": "TPE1",  # artist
    "TAL": "TALB",  # album
    "TRK": "TRCK",  # track
    "TYE": "TYER",  # year
    "TCO": "TCON",  # genre
    "TEN": "TENC",  # encoder
    "TCM": "TCOM",  # composer
}
_ID3V23_TO_V22 = {v: k for k, v in _ID3V22_TO_V23.items()}


def build_id3v2_frames(frames: dict[str, str], version: int = 3,
                       encoding: int = 0) -> bytes:
    """An ID3v2.2/2.3/2.4 tag carrying text-information frames
    ({frame_id: text}, e.g. {'TIT2': title}): 10-byte header with the
    syncsafe tag size, then one frame per entry — v2.3/2.4: 4-char
    id, 4-byte size (PLAIN 32-bit in v2.3, SYNCSAFE in v2.4 — the
    classic divergence), 2 flag bytes; v2.2: 3-char id, 3-byte plain
    size, NO flag bytes (a 4-char id is down-mapped where a v2.2
    equivalent exists). Then the encoding byte + encoded text
    (v2.2 knows encodings 0/1 only)."""
    if version not in (2, 3, 4):
        raise ValueError("only ID3v2.2/2.3/2.4 supported")
    if version == 2 and encoding not in (0, 1):
        raise ValueError("ID3v2.2 text encodings are 0/1 only")
    body = b""
    for fid, text in frames.items():
        if version == 2:
            if len(fid) == 4:
                mapped = _ID3V23_TO_V22.get(fid)
                if mapped is None:
                    raise ValueError(
                        f"no ID3v2.2 equivalent for frame {fid!r}"
                    )
                fid = mapped
            if len(fid) != 3:
                raise ValueError(f"bad v2.2 frame id {fid!r}")
        elif len(fid) != 4:
            raise ValueError(f"bad frame id {fid!r}")
        enc = _ID3_ENCODINGS[encoding]
        data = bytes([encoding]) + text.encode(enc)
        size = len(data)
        if version == 2:
            body += fid.encode("latin-1") + size.to_bytes(3, "big") + data
            continue
        if version == 4:
            sz = bytes(
                [(size >> s) & 0x7F for s in (21, 14, 7, 0)]
            )
        else:
            sz = size.to_bytes(4, "big")
        body += fid.encode("latin-1") + sz + b"\x00\x00" + data
    if len(body) >= 1 << 28:
        raise ValueError("ID3v2 size out of syncsafe range")
    ss = bytes([(len(body) >> s) & 0x7F for s in (21, 14, 7, 0)])
    return b"ID3" + bytes([version, 0, 0]) + ss + body


def parse_id3v2_frames(payload: bytes) -> dict[str, str]:
    """Extract the text-information frames (T***) of a leading ID3v2
    tag: {frame_id: decoded text}. Honors the v2.2 6-byte / v2.3
    10-byte frame-header divergence, the v2.3 plain / v2.4 syncsafe
    frame-size divergence and the footer flag; text encodings 0/1/2/3
    decode (latin-1, UTF-16 BOM, UTF-16BE, UTF-8 — v2.2 validates
    0/1 only); v2.2 three-char ids surface under their canonical
    v2.3+ ids; non-text frames are skipped structurally;
    no tag -> {}."""
    if payload[:3] != b"ID3":
        return {}
    if len(payload) < 10:
        raise ValueError("truncated ID3v2 header")
    version = payload[3]
    if version not in (2, 3, 4):
        raise ValueError(f"ID3v2.{version} unsupported")
    if version == 2 and payload[5] & 0x40:
        # v2.2's bit 6 is the COMPRESSION flag (not an extended
        # header) — no scheme is defined by the informal standard
        raise NotImplementedError(
            "ID3v2.2 compression flag not supported"
        )
    if payload[5] & 0x80:
        # unsynchronisation stuffs 0x00 after every 0xFF — frame
        # sizes and text would mis-read without de-stuffing; refuse
        # rather than guess
        raise NotImplementedError(
            "ID3v2 unsynchronisation not supported"
        )
    if any(b & 0x80 for b in payload[6:10]):
        raise ValueError("non-syncsafe ID3v2 size")
    tag_size = (
        (payload[6] << 21) | (payload[7] << 14)
        | (payload[8] << 7) | payload[9]
    )
    end = 10 + tag_size
    pos = 10
    if payload[5] & 0x40:  # extended header: skip by its own size
        if version == 4:
            ext = (
                (payload[10] << 21) | (payload[11] << 14)
                | (payload[12] << 7) | payload[13]
            )
        else:
            ext = int.from_bytes(payload[10:14], "big") + 4
        pos += ext
    out: dict[str, str] = {}
    # v2.2 frame headers are 6 bytes (3-char id + 3-byte plain size,
    # no flags); v2.3/2.4 are 10 (4-char id + 4-byte size + 2 flags)
    id_len = 3 if version == 2 else 4
    head_len = 6 if version == 2 else 10
    while pos + head_len <= end:
        fid = payload[pos : pos + id_len]
        if fid == b"\x00" * id_len:
            break  # padding
        raw_sz = payload[pos + id_len : pos + head_len - (0 if version == 2 else 2)]
        if version == 4:
            if any(b & 0x80 for b in raw_sz):
                raise ValueError("non-syncsafe v2.4 frame size")
            size = (
                (raw_sz[0] << 21) | (raw_sz[1] << 14)
                | (raw_sz[2] << 7) | raw_sz[3]
            )
        else:
            size = int.from_bytes(raw_sz, "big")
        if pos + head_len + size > end:  # the TAG boundary, not the
            # file — otherwise audio bytes silently decode as tag text
            raise ValueError("ID3v2 frame overruns tag")
        data = payload[pos + head_len : pos + head_len + size]
        pos += head_len + size
        if not (fid[:1] == b"T" and fid.isalnum()):
            continue  # non-text frame: skipped structurally
        if not data:
            continue
        enc = _ID3_ENCODINGS.get(data[0])
        if enc is None:
            raise ValueError(f"unknown ID3 text encoding {data[0]}")
        if version == 2 and data[0] not in (0, 1):
            raise ValueError(
                f"ID3v2.2 text encoding {data[0]} invalid (0/1 only)"
            )
        text = data[1:].decode(enc).rstrip("\x00")
        key = fid.decode("latin-1")
        if version == 2:
            # surface under the canonical v2.3+ id where one exists
            key = _ID3V22_TO_V23.get(key, key)
        out[key] = text
    return out
