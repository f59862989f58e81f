"""Multimodal column plumbing (north-star extension).

Design: media are opaque ``binary`` columns plus a typed metadata
struct (modality, mime, width/height/duration, …). All Spark-side
plumbing — schema, Arrow-batched Pandas UDFs over ``mapInPandas``,
partition sizing — is real and tested. Codecs: every UNCOMPRESSED
wire format decodes FOR REAL in pure numpy/struct + stdlib zlib —
24-bit BMP, PNG across the real-corpus surface (chunk CRCs, IDAT
inflate, all five scanline unfilters; grayscale / truecolor /
palette at bit depths 1-8 / alpha variants / Adam7 interlace — only
16-bit depths refuse), 16-bit PCM WAV (RIFF chunk walk, deinterleave),
and raw-DIB AVI video (avih/strh/strf headers, movi frame chunks,
idx1); oracle-verified round trips in `multimodal_{bmp,png,wav}_
roundtrip` and `multimodal_avi_framesample`. JPEG decodes
EVERYWHERE since round 7: Pillow when installed (probed at call time
so executors resolve it against their own environment), the
pure-Python baseline codec (operators/jpegcodec.py) otherwise —
since round 8 the pure codec handles 4:4:4, 4:2:2 AND 4:2:0 chroma
sampling (the dominant real-corpus profile), so scraped web JPEGs
decode without Pillow too. encode_jpeg / decode_image and the
per-frame codec of MJPG AVI streams all ride that dispatch, and
`multimodal_jpeg_roundtrip` / `multimodal_jpeg420_roundtrip` /
`multimodal_mjpg_framesample` register unconditionally. soundfile
(with an MP3-capable libsndfile) backs MP3 (encode_mp3 / decode_mp3 /
decode_audio): with it installed the roundtrip query registers
itself (`multimodal_mp3_roundtrip`); without it, the codec raises
loudly — refusing, never faking. Remaining
formats (AAC, MPEG video) follow the same seam: swapping in ffmpeg
changes ONE function, not the pipeline.

Scale notes (100 TB): media rows are large, so the operators use
``mapInPandas`` (streaming Arrow batches, no row materialization of
the whole partition), and callers should size partitions by bytes
(``spark.sql.files.maxPartitionBytes``) not rows. Feature extraction
is a narrow map — no shuffle; downstream joins happen on the small
extracted-feature table, never on the binary payload.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata struct carried alongside every media payload
MEDIA_META = T.StructType(
    [
        T.StructField("modality", T.StringType()),  # image|audio|video
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("header_hex", T.StringType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def register_module_by_value(module_name: str = __name__) -> None:
    """cloudpickle the named module BY VALUE so mapInPandas closures
    defined in it ship to executors without an installed package —
    the shared form of the try-block every codec wrapper needs (one
    place to change the exception policy, not thirty)."""
    try:
        import sys as _sys

        from pyspark import cloudpickle as _cp

        _cp.register_pickle_by_value(_sys.modules[module_name])
    except Exception:
        pass


def fused_map(frame: DataFrame, run, schema) -> DataFrame:
    """mapInPandas with PIPELINE FUSION across consecutive media
    stages (optimization guide §4: eliminate JVM↔Python boundary
    crossings).

    Consecutive mapInPandas nodes each pay a full Arrow
    serialize → Python worker → Arrow deserialize round trip of the
    ENTIRE media payload column — a synthesize→resize→decode chain
    ships every image across the boundary three times. But every
    media operator's ``run`` is a pure
    ``Iterator[pd.DataFrame] → Iterator[pd.DataFrame]`` generator, so
    a chain composes losslessly in Python: this wrapper tags each
    output frame with its (base frame, run list); when the NEXT media
    operator receives a tagged frame it re-derives from the base with
    the composed generator — ONE mapInPandas node, one boundary
    crossing, identical per-row computation (the intermediate frame
    is lazy and simply never executed). Any non-media transformation
    in between (select/filter/join/parquet round trip) drops the tag
    and the chain restarts there, so fusion is always safe.

    Row-level results are bit-identical to the unfused chain: each
    ``run`` already consumes exactly the dict/bytes shapes its
    upstream yields (Arrow hands struct columns to pandas as dicts
    and binary as bytes — the same objects the synth stages yield)."""
    chain = getattr(frame, "_media_fusion_chain", None)
    if chain is None:
        base, runs = frame, (run,)
    else:
        base, prev = chain
        runs = prev + (run,)
    if len(runs) == 1:
        composed = run
    else:
        def composed(batches, _runs=runs):
            it = batches
            for r in _runs:
                it = r(it)
            return it

    out = base.mapInPandas(composed, schema=schema)
    out._media_fusion_chain = (base, runs)
    return out


def _pil_image_module():
    """The optional imaging dependency, or None. JPEG support rides
    on Pillow when it is installed; everything else in this module is
    dependency-free."""
    try:
        from PIL import Image  # noqa: PLC0415 — optional dependency

        return Image
    except ImportError:
        return None


def decode_image(payload: bytes) -> object:
    """Image decode dispatch by magic bytes. Uncompressed 24-bit BMP,
    PNG (gray/truecolor/palette/alpha, Adam7) and baseline TIFF
    (II/MM, strips, none/LZW/PackBits, predictor 2 —
    operators/tiffcodec.py) decode HERE, for
    real (pure numpy/struct +
    stdlib zlib — no imaging library needed). JPEG decodes through
    Pillow when installed (probed at call time so executors resolve
    it against their own environment) and through the pure-Python
    baseline codec (operators/jpegcodec.py) otherwise; any other
    compressed format raises loudly instead of faking pixels."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:3] == b"\xff\xd8\xff":
        Image = _pil_image_module()
        if Image is None:
            # pure-Python baseline fallback (operators/jpegcodec.py):
            # decodes sequential 8-bit streams at 4:4:4 / 4:2:2 /
            # 4:2:0 chroma sampling and raises NotImplementedError
            # for progressive/12-bit rather than faking pixels
            from funding_monitoring_spark.operators.jpegcodec import (
                decode_baseline_jpeg,
            )

            return decode_baseline_jpeg(payload)
        import io

        import numpy as np

        with Image.open(io.BytesIO(payload)) as img:
            return np.asarray(img.convert("RGB"), dtype=np.uint8)
    if payload[:4] == b"GIF8":
        from funding_monitoring_spark.operators.gifcodec import (
            decode_gif,
        )

        return decode_gif(payload)[0]
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        from funding_monitoring_spark.operators.tiffcodec import (
            decode_tiff,
        )

        return decode_tiff(payload)
    raise NotImplementedError(
        "compressed-image codec not available in this "
        "environment; swap in PIL/torchvision here"
    )


def encode_jpeg(pixels, quality: int = 95) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as baseline JPEG — Pillow
    when installed, the pure-Python baseline codec
    (operators/jpegcodec.py) otherwise, so JPEG coverage no longer
    depends on the environment.

    subsampling=0 (4:4:4) is load-bearing on BOTH paths: default
    chroma subsampling on the tiny synthetic test images makes
    per-channel error depend on the libjpeg build, which would make
    the roundtrip oracle's fixed tolerance flaky across
    environments; full-resolution chroma at quality>=95 bounds
    quantization error independently of the encoder (the pure codec
    measures ~3 mean per-pixel error at q95 even on noise images —
    far inside the roundtrip check's +-16 channel-mean tolerance)."""
    Image = _pil_image_module()
    if Image is None:
        from funding_monitoring_spark.operators.jpegcodec import (
            encode_baseline_jpeg,
        )

        return encode_baseline_jpeg(pixels, quality=quality)
    import io

    import numpy as np

    buf = io.BytesIO()
    Image.fromarray(np.asarray(pixels, dtype=np.uint8), "RGB").save(
        buf, format="JPEG", quality=quality, subsampling=0
    )
    return buf.getvalue()


#: BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER (40 bytes)
_BMP_OFFSET = 54


def encode_bmp(pixels) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array (top-down row order) as an
    uncompressed 24-bit BMP: BGR channel order, bottom-up rows, rows
    padded to 4-byte boundaries — the real wire format."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    pad = (4 - (w * 3) % 4) % 4
    img_size = (w * 3 + pad) * h
    header = struct.pack(
        "<2sIHHI", b"BM", _BMP_OFFSET + img_size, 0, 0, _BMP_OFFSET
    )
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    body = bytearray()
    padding = b"\x00" * pad
    for y in range(h - 1, -1, -1):  # bottom-up
        body += px[y, :, ::-1].tobytes() + padding  # RGB → BGR
    return header + info + bytes(body)


def decode_bmp(payload: bytes):
    """Decode an uncompressed 24-bit or 32-bit BMP into an (h, w, 3)
    uint8 RGB array (top-down). Handles row padding, BGR(A) order,
    both bottom-up (h > 0) and top-down (h < 0) row directions, and
    BI_BITFIELDS 32-bit headers with the standard byte-aligned masks
    (the common screenshot format — the alpha/padding byte is
    dropped); anything fancier (RLE compression, palette depths,
    non-standard bitfields) is rejected loudly."""
    import numpy as np

    magic, _, _, _, offset = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    _, w, h, _, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp not in (24, 32) or comp not in (0, 3):
        raise NotImplementedError(
            f"only uncompressed 24/32-bit BMP supported (bpp={bpp}, "
            f"compression={comp})"
        )
    if comp == 3:  # BI_BITFIELDS: accept only the standard masks
        if bpp != 32:
            raise NotImplementedError("bitfields on non-32-bit BMP")
        r_m, g_m, b_m = struct.unpack_from("<III", payload, 54)
        if (r_m, g_m, b_m) != (0x00FF0000, 0x0000FF00, 0x000000FF):
            raise NotImplementedError(
                "non-standard BMP channel bitfields"
            )
    nch = bpp // 8
    top_down = h < 0
    hh = abs(h)
    pad = (4 - (w * nch) % 4) % 4
    row_size = w * nch + pad
    out = np.empty((hh, w, 3), dtype=np.uint8)
    for i in range(hh):
        row = np.frombuffer(
            payload,
            dtype=np.uint8,
            count=w * nch,
            offset=offset + i * row_size,
        ).reshape(w, nch)[:, 2::-1]  # BGR(A) → RGB, alpha dropped
        out[i if top_down else hh - 1 - i] = row
    return out


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_BPP = 3  # bytes per pixel, 8-bit truecolor


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _paeth_predict(a, b, c):
    """PNG Paeth predictor, vectorized over same-shape int arrays
    (a=left, b=up, c=upper-left)."""
    import numpy as np

    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def encode_png(pixels) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an 8-bit truecolor PNG
    (color type 2) with stdlib zlib only: signature, IHDR/IDAT/IEND
    chunks with CRCs, and zlib-deflated filtered scanlines. Scanline
    filters CYCLE through all five types (None/Sub/Up/Average/Paeth,
    row y uses y % 5) so a round trip exercises every unfilter path in
    the decoder — a real encoder picks per-row minimal-entropy
    filters; the wire format is identical."""
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    zeros = np.zeros(_BPP, dtype=np.int16)
    prev = np.zeros(w * _BPP, dtype=np.int16)
    raw = bytearray()
    for y in range(h):
        line = px[y].reshape(-1).astype(np.int16)
        left = np.concatenate([zeros, line[:-_BPP]])
        upleft = np.concatenate([zeros, prev[:-_BPP]])
        ftype = y % 5
        pred = [
            0,
            left,
            prev,
            (left + prev) // 2,
            _paeth_predict(left, prev, upleft),
        ][ftype]
        raw.append(ftype)
        raw += ((line - pred) % 256).astype(np.uint8).tobytes()
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def encode_png16(pixels) -> bytes:
    """Encode an (h, w, 3) uint16 RGB array as a 16-bit truecolor PNG
    (color type 2, depth 16): big-endian sample pairs, scanline
    filters operating on BYTES with a 6-byte left distance (the
    spec's bpp for 16-bit RGB), cycling through all five filter
    types like encode_png so a roundtrip exercises every unfilter
    path at the wide depth."""
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint16)
    h, w, _ = px.shape
    bpp = 6
    zeros = np.zeros(bpp, dtype=np.int16)
    prev = np.zeros(w * bpp, dtype=np.int16)
    raw = bytearray()
    for y in range(h):
        line = np.frombuffer(
            px[y].astype(">u2").tobytes(), dtype=np.uint8
        ).astype(np.int16)
        left = np.concatenate([zeros, line[:-bpp]])
        upleft = np.concatenate([zeros, prev[:-bpp]])
        ftype = y % 5
        pred = [
            0,
            left,
            prev,
            (left + prev) // 2,
            _paeth_predict(left, prev, upleft),
        ][ftype]
        raw.append(ftype)
        raw += ((line - pred) % 256).astype(np.uint8).tobytes()
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def _png_unfilter(
    raw: bytes, offset: int, h: int, stride: int, bpp: int
):
    """Reverse PNG scanline filtering for one (sub-)image: ``h``
    scanlines of ``stride`` bytes each, preceded by a filter-type
    byte; ``bpp`` is the filter's byte distance to the left
    neighbor. Returns (h, stride) uint8. All five filter types;
    Sub/Average/Paeth reconstruct sequentially in x by definition
    (each byte depends on the reconstructed byte one pixel left), so
    those rows loop per byte — a plain-int loop is ~10x cheaper than
    per-pixel numpy indexing."""
    import numpy as np

    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        ftype = raw[offset + y * (stride + 1)]
        start = offset + y * (stride + 1) + 1
        if ftype == 0:
            rec = np.frombuffer(raw, np.uint8, stride, start).astype(
                np.int16
            )
        elif ftype == 1:  # Sub: mod-256 additions commute with cumsum
            rec = (
                np.frombuffer(raw, np.uint8, stride, start)
                .reshape(-1, bpp)
                .astype(np.int64)
                .cumsum(axis=0)
                .reshape(stride)
                % 256
            ).astype(np.int16)
        elif ftype == 2:  # Up: pure slice add
            rec = (
                np.frombuffer(raw, np.uint8, stride, start) + prev
            ) % 256
        elif ftype in (3, 4):
            cur = list(raw[start : start + stride])
            pv = prev.tolist()
            if ftype == 3:  # Average
                for x in range(bpp):
                    cur[x] = (cur[x] + pv[x] // 2) & 0xFF
                for x in range(bpp, stride):
                    cur[x] = (
                        cur[x] + (cur[x - bpp] + pv[x]) // 2
                    ) & 0xFF
            else:  # Paeth
                for x in range(bpp):
                    cur[x] = (cur[x] + pv[x]) & 0xFF  # paeth(0,up,0)=up
                for x in range(bpp, stride):
                    a, b, c = cur[x - bpp], pv[x], pv[x - bpp]
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    cur[x] = (
                        cur[x]
                        + (
                            a
                            if pa <= pb and pa <= pc
                            else b if pb <= pc else c
                        )
                    ) & 0xFF
            rec = np.asarray(cur, dtype=np.int16)
        else:
            raise ValueError(f"unknown scanline filter {ftype}")
        prev = rec
        out[y] = rec.astype(np.uint8)
    return out


#: Adam7 pass geometry: (x origin, y origin, x stride, y stride)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unpack_samples(rows, w: int, depth: int, channels: int):
    """(h, stride_bytes) filtered-out bytes -> (h, w, channels)
    uint8 SAMPLE values (palette indices / raw intensities; depths
    1/2/4 are bit-unpacked MSB-first, NOT scaled)."""
    import numpy as np

    h = rows.shape[0]
    if depth == 16:  # big-endian sample pairs -> uint16
        b = rows.reshape(h, -1)[:, : w * channels * 2].reshape(
            h, w, channels, 2
        )
        return (
            b[..., 0].astype(np.uint16) << 8
        ) | b[..., 1].astype(np.uint16)
    if depth == 8:
        return rows.reshape(h, -1)[:, : w * channels].reshape(
            h, w, channels
        )
    # sub-byte depths are legal only for 1-channel color types
    bits = np.unpackbits(rows, axis=1)
    idx = bits.reshape(h, -1, depth)[:, :w, :]
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    return (idx * weights).sum(axis=2, dtype=np.uint8).reshape(
        h, w, 1
    )


def decode_png(payload: bytes):
    """Decode a PNG into an (h, w, 3) uint8 RGB array (top-down):
    walk the chunk stream (verifying every CRC), inflate the
    concatenated IDAT data, reverse the per-scanline filters, and
    handle the full 8-bit real-corpus surface — grayscale (0),
    truecolor (2), palette (3, at bit depths 1/2/4/8), gray+alpha
    (4) and truecolor+alpha (6), both sequential and Adam7
    INTERLACED (7 independently-filtered sub-images scattered back
    on the pass grid), plus 16-bit depths for the non-palette color
    types (big-endian sample pairs, filter distance in BYTES per
    spec; reduced 16->8 by dropping the low byte, the libpng
    strip-16 convention). Alpha channels are dropped (RGB output
    contract)."""
    import zlib

    import numpy as np

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, dims, plte = 8, bytearray(), None, None
    while pos + 12 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + ln)
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if comp != 0 or filt != 0 or interlace > 1:
                raise ValueError("malformed IHDR")
            channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
            if channels is None:
                raise ValueError(f"unknown PNG color type {ctype}")
            ok_depths = (
                (1, 2, 4, 8, 16)
                if ctype == 0
                else (1, 2, 4, 8) if ctype == 3 else (8, 16)
            )
            if depth not in ok_depths:
                raise ValueError(
                    f"illegal PNG depth={depth} for color_type={ctype}"
                )
            dims = (w, h)
        elif tag == b"PLTE":
            if ln % 3:
                raise ValueError("PLTE length not a multiple of 3")
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if dims is None:
        raise ValueError("missing IHDR chunk")
    w, h = dims
    raw = zlib.decompress(bytes(idat))
    bpp = max(1, depth * channels // 8)

    def region_stride(width: int) -> int:
        return -(-width * depth * channels // 8)

    samples = np.zeros(
        (h, w, channels), dtype=np.uint16 if depth == 16 else np.uint8
    )
    if interlace == 0:
        stride = region_stride(w)
        if len(raw) != h * (stride + 1):
            raise ValueError("IDAT length does not match dimensions")
        rows = _png_unfilter(raw, 0, h, stride, bpp)
        samples = _png_unpack_samples(rows, w, depth, channels)
    else:  # Adam7
        offset = 0
        for ox, oy, sx, sy in _ADAM7:
            pw = (w - ox + sx - 1) // sx
            ph = (h - oy + sy - 1) // sy
            if pw <= 0 or ph <= 0:
                continue
            stride = region_stride(pw)
            need = ph * (stride + 1)
            if offset + need > len(raw):
                raise ValueError("IDAT shorter than Adam7 passes")
            rows = _png_unfilter(raw, offset, ph, stride, bpp)
            offset += need
            sub = _png_unpack_samples(rows, pw, depth, channels)
            samples[oy::sy, ox::sx, :] = sub
        if offset != len(raw):
            raise ValueError("IDAT longer than Adam7 passes")

    if depth == 16:
        # 16 -> 8 bits by dropping the low byte (libpng strip-16
        # convention; scale_16's 255*v/65535 rounding differs by at
        # most one code and is NOT what default pipelines do)
        samples = (samples >> 8).astype(np.uint8)
    if ctype == 2:
        return samples
    if ctype == 6:
        return samples[:, :, :3]  # drop alpha
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE chunk")
        idx = samples[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("pixel index outside the palette")
        return plte[idx]
    # grayscale (0) / gray+alpha (4): scale sub-byte depths, replicate
    g = samples[:, :, 0]
    if depth < 8:
        g = (g.astype(np.uint16) * 255 // ((1 << depth) - 1)).astype(
            np.uint8
        )
    return np.stack([g, g, g], axis=-1)


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded-media feature vector:
    byte-histogram moments folded into ``dim`` buckets. Pure function
    of the payload → reproducible across engines and runs."""
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] += b
    n = max(len(payload), 1)
    return [round(a / n, 6) for a in acc]


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: build a MEDIA_SCHEMA frame from the documents fixture
    (utf-8 bytes play the payload; deterministic metadata)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("image").alias("modality"),
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame, batch_hint: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over mapInPandas.

    The UDF receives an iterator of pandas batches (never the whole
    partition), emits FEATURE_SCHEMA rows. This is the sanctioned
    pattern for any real decode step: per-batch Python cost, columnar
    transfer both ways.
    """

    # Worker processes may not have this package on sys.path (the
    # driver contract only guarantees the entry module is importable
    # driver-side). Pickle the UDF and its module references by value
    # so the closure is self-contained on the wire.
    register_module_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "header_hex": payloads.map(
                        lambda p: bytes(p[:4]).hex()
                    ),
                    "feature": payloads.map(_fake_feature),
                }
            )

    return fused_map(media, run, FEATURE_SCHEMA)


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for decode→resize→encode: stride-sample
    the payload down to width*height bytes (pad by cycling). In
    production this is PIL resize; same signature, same plumbing."""
    target = max(width * height, 1)
    if len(payload) == 0:
        return bytes(target)
    if len(payload) >= target:
        stride = len(payload) // target
        return bytes(payload[i * stride] for i in range(target))
    reps = -(-target // len(payload))
    return (payload * reps)[:target]


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize every payload to width×height (stubbed codec), updating
    the metadata struct — a narrow 1:1 mapInPandas, no shuffle; output
    keeps MEDIA_SCHEMA so resize composes with any downstream media op.
    """
    register_module_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pd.DataFrame(
                {
                    "modality": [m["modality"] for m in pdf["meta"]],
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "width": width,
                    "height": height,
                    "duration_ms": [m["duration_ms"] for m in pdf["meta"]],
                }
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["payload"].map(
                        lambda p: _fake_resize(bytes(p), width, height)
                    ),
                    "meta": meta.to_dict("records"),
                }
            )

    return fused_map(media, run, MEDIA_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    media: DataFrame, frame_bytes: int = 1024, every_n: int = 4
) -> DataFrame:
    """One-to-many frame sampling (the video path): each payload is
    split into fixed-size 'frames' (stub for an ffmpeg keyframe
    iterator) and every n-th is emitted. mapInPandas yields more rows
    than it receives — the Spark-side shape (explode-like fan-out with
    binary payloads, batch-bounded memory) is exactly the production
    pattern."""
    register_module_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                n_frames = -(-len(raw) // frame_bytes) if raw else 0
                for k in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(k)
                    frames.append(raw[k * frame_bytes : (k + 1) * frame_bytes])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return fused_map(media, run, FRAME_SCHEMA)


BMP_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("corner_r", T.IntegerType()),
        T.StructField("corner_g", T.IntegerType()),
        T.StructField("corner_b", T.IntegerType()),
    ]
)


def _bmp_dims(media_id: int) -> tuple[int, int]:
    return 2 + media_id % 6, 2 + media_id % 4


def resize_images(
    media: DataFrame, width: int, height: int
) -> DataFrame:
    """REAL pixel-space resize: decode each payload with the actual
    codec (BMP/PNG natively, JPEG via Pillow or the pure baseline
    codec), nearest-neighbor resample to width x height with the
    floor convention src = (dst * src_dim) // dst_dim, and re-encode
    LOSSLESSLY as BMP so downstream reads are exact. Same 1:1
    Arrow-batched mapInPandas shape as the byte-stub resize_media —
    the composition contract (MEDIA_SCHEMA in, MEDIA_SCHEMA out)
    is identical, only the pixels are now real, which is what lets
    the resize land in an oracle (the SQL recomputes the resampled
    field from the closed form)."""
    register_module_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def resample(payload: bytes) -> bytes:
            px = decode_image(bytes(payload))
            h_src, w_src, _ = px.shape
            xs = (np.arange(width) * w_src) // width
            ys = (np.arange(height) * h_src) // height
            return encode_bmp(px[np.ix_(ys, xs)])

        for pdf in batches:
            meta = pd.DataFrame(
                {
                    "modality": [m["modality"] for m in pdf["meta"]],
                    "mime": "image/bmp",
                    "width": width,
                    "height": height,
                    "duration_ms": [
                        m["duration_ms"] for m in pdf["meta"]
                    ],
                }
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["payload"].map(resample),
                    "meta": meta.to_dict("records"),
                }
            )

    return fused_map(media, run, MEDIA_SCHEMA)


def _bmp_pixels(media_id: int, w: int, h: int):
    """Closed-form pixel field: channel j (row-major RGB flat index)
    has value ((media_id*7 + j) * 31) % 256 — reproducible in the SQL
    oracle without any binary parsing."""
    import numpy as np

    j = np.arange(w * h * 3, dtype=np.int64)
    return ((media_id * 7 + j) * 31 % 256).astype(np.uint8).reshape(h, w, 3)



def _png_ihdr(w, h, depth, ctype, interlace=0) -> bytes:
    return _png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    )


def _encode_png_gray(g) -> bytes:
    """(h, w) uint8 -> 8-bit grayscale PNG (color type 0)."""
    import zlib

    h, w = g.shape
    raw = b"".join(b"\x00" + g[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _png_ihdr(w, h, 8, 0)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def _encode_png_palette4(idx, pal) -> bytes:
    """(h, w) indices < 16 + (16, 3) palette -> 4-bit palette PNG
    (color type 3): two MSB-first nibbles per byte."""
    import zlib

    import numpy as np

    h, w = idx.shape
    rows = []
    for y in range(h):
        row = idx[y]
        if w % 2:
            row = np.concatenate([row, np.zeros(1, dtype=np.uint8)])
        packed = (row[0::2] << 4) | row[1::2]
        rows.append(b"\x00" + packed.astype(np.uint8).tobytes())
    return (
        _PNG_SIG
        + _png_ihdr(w, h, 4, 3)
        + _png_chunk(b"PLTE", np.asarray(pal, dtype=np.uint8).tobytes())
        + _png_chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + _png_chunk(b"IEND", b"")
    )


#: Adam7 pass geometry (x origin, y origin, x stride, y stride)
_ADAM7_ENC = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _encode_png_adam7_rgb(px) -> bytes:
    """(h, w, 3) uint8 -> Adam7-INTERLACED truecolor PNG: seven
    independently-filtered sub-images in pass order."""
    import zlib

    h, w = px.shape[:2]
    raw = bytearray()
    for ox, oy, sx, sy in _ADAM7_ENC:
        sub = px[oy::sy, ox::sx]
        if sub.size == 0:
            continue
        for y in range(sub.shape[0]):
            raw += b"\x00" + sub[y].tobytes()
    return (
        _PNG_SIG
        + _png_ihdr(w, h, 8, 2, interlace=1)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _png_variant_payload(mid: int) -> bytes:
    """Closed-form payload for the PNG-variant round trip: variant
    mid%3 selects grayscale / 4-bit palette / Adam7 truecolor, each
    from an integer field the SQL oracle recomputes exactly."""
    import numpy as np

    w, h = _bmp_dims(mid)
    v = mid % 3
    if v == 0:
        p = np.arange(w * h, dtype=np.int64)
        g = ((mid * 11 + p * 5) * 29 % 256).astype(np.uint8)
        return _encode_png_gray(g.reshape(h, w))
    if v == 1:
        p = np.arange(w * h, dtype=np.int64)
        idx = ((mid + p * 5) % 16).astype(np.uint8).reshape(h, w)
        i = np.arange(16, dtype=np.int64)
        pal = np.stack(
            [i * 17 % 256, i * 37 % 256, i * 73 % 256], axis=1
        ).astype(np.uint8)
        return _encode_png_palette4(idx, pal)
    return _encode_png_adam7_rgb(_bmp_pixels(mid, w, h))


def synthesize_png_variant_media(
    ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """PNG payloads across the REAL-corpus variant surface —
    grayscale (type 0), 4-bit palette (type 3), and Adam7-interlaced
    truecolor — one variant per id, so the decoder's non-truecolor
    paths get oracle rows, not just unit tests."""
    return _synthesize_media(
        ids, id_col, None, "image/png", payload_fn=_png_variant_payload
    )


def _png16_pixels(media_id: int, w: int, h: int):
    """Closed-form 16-bit pixel field for the wide-depth roundtrip:
    value(p, c) = (media_id*11 + p*7 + c*5) * 641 % 65536 — integer-
    exact in the SQL oracle; the decoder's strip-16 reduction makes
    the expected 8-bit pixel value // 256."""
    import numpy as np

    p = np.arange(w * h, dtype=np.int64)[:, None]
    c = np.arange(3, dtype=np.int64)[None, :]
    return (
        ((media_id * 11 + p * 7 + c * 5) * 641) % 65536
    ).astype(np.uint16).reshape(h, w, 3)


def synthesize_png16_media(
    ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """16-bit truecolor PNG payloads (big-endian sample pairs,
    6-byte filter distance) from the closed-form 16-bit field —
    the wide-depth writer half."""
    return _synthesize_media(
        ids,
        id_col,
        None,
        "image/png",
        payload_fn=lambda mid: encode_png16(
            _png16_pixels(mid, *_bmp_dims(mid))
        ),
    )


def _tiff_dims(media_id: int) -> tuple[int, int]:
    """Larger than _bmp_dims so the strip walk, the LZW width ladder
    and the predictor see real row runs (up to 16x11 = 176 px)."""
    return 6 + media_id % 11, 5 + media_id % 7


def synthesize_tiff_media(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Real baseline-TIFF payloads from the closed-form pixel field
    (operators/tiffcodec.py). Each id cycles through the codec's
    variant space so every decode path is exercised across a fixture:
    byte order II/MM (id%2), compression none/LZW/Deflate/PackBits (id%4),
    horizontal-differencing predictor on the LZW rows (id%2 within
    compression 5), and strip heights 1/2/3/full (id%4). 1:1
    Arrow-batched mapInPandas, no shuffle."""
    register_module_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from funding_monitoring_spark.operators.tiffcodec import encode_tiff

        for pdf in batches:
            payloads, metas = [], []
            for mid in pdf["media_id"]:
                mid = int(mid)
                w, h = _tiff_dims(mid)
                comp = (1, 5, 8, 32773)[mid % 4]
                payloads.append(
                    encode_tiff(
                        _bmp_pixels(mid, w, h),
                        byte_order="<" if mid % 2 == 0 else ">",
                        compression=comp,
                        predictor=2 if comp == 5 and mid % 2 == 0 else 1,
                        rows_per_strip=(1, 2, 3, None)[mid % 4],
                    )
                )
                metas.append(
                    {
                        "modality": "image",
                        "mime": "image/tiff",
                        "width": w,
                        "height": h,
                        "duration_ms": None,
                    }
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    media_ids = _spread_ids(ids.select(F.col(id_col).alias("media_id")))
    return fused_map(media_ids, run, MEDIA_SCHEMA)


def _spread_ids(media_ids: DataFrame) -> DataFrame:
    """Round-robin the id column across the session's full
    parallelism before the codec mapInPandas. A single-file parquet
    source arrives as ONE partition, which would serialize the whole
    per-payload codec workload onto one core; the ids are a few bytes
    each, so this shuffle is free relative to the CPU it unlocks (the
    encode stage is otherwise embarrassingly parallel)."""
    sc = media_ids.sparkSession.sparkContext
    return media_ids.repartition(sc.defaultParallelism)


def _synthesize_media(
    ids: DataFrame, id_col: str, encoder, mime: str, payload_fn=None
) -> DataFrame:
    """Shared writer half of the codec round trips: real encoded
    payloads (one per input id) from the closed-form pixel field.
    ``payload_fn(media_id)``, when given, builds the payload directly
    from the id instead of encoder(pixel field) — for variants whose
    source field differs per id (the PNG-variant round trip).
    1:1 mapInPandas, no shuffle."""
    register_module_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for mid in pdf["media_id"]:
                w, h = _bmp_dims(int(mid))
                payloads.append(
                    payload_fn(int(mid))
                    if payload_fn is not None
                    else encoder(_bmp_pixels(int(mid), w, h))
                )
                metas.append(
                    {
                        "modality": "image",
                        "mime": mime,
                        "width": w,
                        "height": h,
                        "duration_ms": None,
                    }
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    media_ids = _spread_ids(ids.select(F.col(id_col).alias("media_id")))
    return fused_map(media_ids, run, MEDIA_SCHEMA)


def synthesize_bmp_media(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Real uncompressed-BMP payloads from the closed-form pixel
    field (see _synthesize_media)."""
    return _synthesize_media(ids, id_col, encode_bmp, "image/bmp")


def synthesize_png_media(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Real zlib-deflated PNG payloads from the same closed-form pixel
    field — the rows cycle through all five scanline filters, so the
    decode half re-derives the pixels through every unfilter path."""
    return _synthesize_media(ids, id_col, encode_png, "image/png")


def decode_image_features(media: DataFrame) -> DataFrame:
    """The reader half: parse each payload with the REAL decoder
    (decode_image dispatches BMP struct-parse or PNG inflate+unfilter
    by magic bytes) and emit per-channel means plus the top-left
    pixel — the corner pixel is the orientation proof (a row-flip or
    channel-swap bug moves it, a mean would not notice)."""
    register_module_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_image(bytes(payload))
                h, w, _ = px.shape
                means = px.reshape(-1, 3).mean(axis=0)
                rows.append(
                    {
                        "media_id": mid,
                        "width": w,
                        "height": h,
                        "mean_r": round(float(means[0]), 6),
                        "mean_g": round(float(means[1]), 6),
                        "mean_b": round(float(means[2]), 6),
                        "corner_r": int(px[0, 0, 0]),
                        "corner_g": int(px[0, 0, 1]),
                        "corner_b": int(px[0, 0, 2]),
                    }
                )
            yield pd.DataFrame(rows)

    return fused_map(media, run, BMP_FEATURE_SCHEMA)


#: back-compat name from when only the BMP decoder existed
decode_bmp_features = decode_image_features


#: twin ids live in a disjoint range so pair output is unambiguous
IMAGE_TWIN_OFFSET = 10_000_000


def synthesize_image_scale_twins(
    ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Cross-format, cross-resolution near-duplicate image corpus:
    per id, the original BMP at (w, h) AND a PNG twin nearest-neighbor
    UPSCALED 2x (id + IMAGE_TWIN_OFFSET). The floor-convention dHash
    resample makes an integer upscale hash-invariant —
    floor(floor(9i*kw/9)/k) == floor(9i*w/9) — so every twin is a
    provable Hamming-0 duplicate of its original across BOTH a format
    change and a resolution change, the canonical perceptual-dedup
    case. 1:2 mapInPandas fan-out, no shuffle."""
    register_module_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out_ids, payloads, metas = [], [], []
            for mid in pdf["media_id"]:
                mid = int(mid)
                w, h = _bmp_dims(mid)
                px = _bmp_pixels(mid, w, h)
                up = np.repeat(np.repeat(px, 2, axis=0), 2, axis=1)
                for out_id, payload, ww, hh in (
                    (mid, encode_bmp(px), w, h),
                    (mid + IMAGE_TWIN_OFFSET, encode_png(up),
                     2 * w, 2 * h),
                ):
                    out_ids.append(out_id)
                    payloads.append(payload)
                    metas.append(
                        {
                            "modality": "image",
                            "mime": "image/bmp" if out_id == mid
                            else "image/png",
                            "width": ww,
                            "height": hh,
                            "duration_ms": None,
                        }
                    )
            yield pd.DataFrame(
                {"media_id": out_ids, "payload": payloads, "meta": metas}
            )

    media_ids = _spread_ids(ids.select(F.col(id_col).alias("media_id")))
    return fused_map(media_ids, run, MEDIA_SCHEMA)


# -- EXIF in JPEG APP1 (TIFF IFD machinery from operators/tiffcodec.py) ----

EXIF_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("orientation", T.IntegerType()),
        T.StructField("make", T.StringType()),
        T.StructField("model", T.StringType()),
        T.StructField("taken_at", T.StringType()),
        T.StructField("pixel_x", T.IntegerType()),
        T.StructField("pixel_y", T.IntegerType()),
        T.StructField("big_endian", T.IntegerType()),
    ]
)


def inject_jpeg_exif(jpeg: bytes, exif_tiff: bytes) -> bytes:
    """Insert an APP1 Exif segment right after SOI — where every
    camera writes it."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    payload = b"Exif\x00\x00" + exif_tiff
    if len(payload) + 2 > 0xFFFF:
        raise ValueError("EXIF payload exceeds one APP1 segment")
    seg = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    return jpeg[:2] + seg + jpeg[2:]


def extract_jpeg_exif(jpeg: bytes) -> bytes | None:
    """Walk the JPEG marker stream up to SOS and return the TIFF
    block of the first APP1 Exif segment, or None. Standalone
    markers (RSTn/TEM) cannot appear before SOS; a malformed segment
    length raises rather than resyncing."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    n = len(jpeg)
    while pos + 4 <= n:
        if jpeg[pos] != 0xFF:
            raise ValueError(f"JPEG marker expected at byte {pos}")
        marker = jpeg[pos + 1]
        if marker == 0xD9 or marker == 0xDA:  # EOI / SOS: no more APPn
            return None
        (size,) = struct.unpack(">H", jpeg[pos + 2 : pos + 4])
        if size < 2 or pos + 2 + size > n:
            raise ValueError("JPEG segment overruns payload")
        if marker == 0xE1 and jpeg[pos + 4 : pos + 10] == b"Exif\x00\x00":
            return jpeg[pos + 10 : pos + 2 + size]
        pos += 2 + size
    return None


# -- structured documents: classic-xref PDF (operators/pdfcodec.py) --------

PDF_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("pdf_version", T.StringType()),
        T.StructField("n_pages", T.IntegerType()),
        T.StructField("n_objects", T.IntegerType()),
        T.StructField("flate_streams", T.IntegerType()),
        T.StructField("n_text_chars", T.IntegerType()),
        T.StructField("fingerprint", T.LongType()),
    ]
)


def _pdf_pages(text: str, n_pages: int) -> list:
    """Split text into n_pages character slices whose concatenation
    is EXACTLY the text (cut points floor(len*k/n) — the same floor
    convention as the resize oracle)."""
    n = len(text)
    cuts = [(n * k) // n_pages for k in range(n_pages + 1)]
    return [text[cuts[k] : cuts[k + 1]] for k in range(n_pages)]


def synthesize_pdf_media(docs: DataFrame) -> DataFrame:
    """Real PDFs from the documents fixture, a MIXED-generation
    corpus like a crawl's: each doc's text split across 1 + doc_id%3
    pages (one content stream per page), FlateDecode on even ids;
    ids with doc_id%3 == 1 are written as PDF 1.5 (object stream +
    PNG-Up-predicted cross-reference stream — the majority modern
    shape), the rest as classic-xref 1.4. Odd classic ids carry the
    widened non-Flate filter surface — LZWDecode (id%6==3) and
    RunLengthDecode / [ASCIIHexDecode LZWDecode] chains (id%6==5) —
    so the registered query exercises every supported /Filter without
    touching the flate_streams oracle. 1:1 Arrow-batched
    mapInPandas."""
    register_module_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from funding_monitoring_spark.operators.pdfcodec import (
            encode_pdf,
            encode_pdf15,
        )

        for pdf in batches:
            payloads, metas = [], []
            for mid, text in zip(pdf["media_id"], pdf["text"]):
                mid = int(mid)
                pages = _pdf_pages(str(text), 1 + mid % 3)
                if mid % 3 == 1:
                    payload = encode_pdf15(pages, compress=(mid % 2 == 0))
                elif mid % 2 == 0:
                    payload = encode_pdf(pages, compress=True)
                elif mid % 6 == 3:
                    # odd classic ids carry the widened non-Flate
                    # filter surface (flate_streams stays 0 for them,
                    # so the oracle is untouched): LZWDecode...
                    payload = encode_pdf(
                        pages, page_filters=[["LZWDecode"]]
                    )
                else:  # mid % 6 == 5: RunLength + an ASCII/LZW chain
                    payload = encode_pdf(
                        pages,
                        page_filters=[
                            ["RunLengthDecode"],
                            ["ASCIIHexDecode", "LZWDecode"],
                        ],
                    )
                payloads.append(payload)
                metas.append(
                    {
                        "modality": "document",
                        "mime": "application/pdf",
                        "width": None,
                        "height": None,
                        "duration_ms": None,
                    }
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    ids = _spread_ids(
        docs.select(F.col("doc_id").alias("media_id"), "text")
    )
    return fused_map(ids, run, MEDIA_SCHEMA)


def decode_pdf_features(media: DataFrame) -> DataFrame:
    """Reader half: structural parse (version, xref object count,
    /Pages tree page count, Flate stream count) plus native-text
    recovery; the recovered text is fingerprinted with the SAME
    rolling polynomial as doc_fingerprint, so the oracle recomputes
    it from the original text — any xref, tree-walk, inflate or
    string-unescape bug breaks the hash."""
    register_module_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from funding_monitoring_spark.operators.pdfcodec import parse_pdf
        from funding_monitoring_spark.operators.textstats import (
            POLY_INIT,
            POLY_MOD,
            POLY_MULT,
        )

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                info = parse_pdf(bytes(payload))
                text = info.text
                fp = POLY_INIT
                for b in text.encode("latin-1"):
                    fp = (fp * POLY_MULT + b) % POLY_MOD
                rows.append(
                    {
                        "media_id": mid,
                        "pdf_version": info.version,
                        "n_pages": info.n_pages,
                        "n_objects": info.n_objects,
                        "flate_streams": info.flate_streams,
                        "n_text_chars": len(text),
                        "fingerprint": fp,
                    }
                )
            yield pd.DataFrame(rows)

    return fused_map(media, run, PDF_FEATURE_SCHEMA)


# -- real audio codec: uncompressed PCM WAV (RIFF) -------------------------

WAV_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("sum_amplitude", T.LongType()),
        T.StructField("min_amplitude", T.IntegerType()),
        T.StructField("max_amplitude", T.IntegerType()),
    ]
)


def encode_wav(samples, sample_rate: int = 8000) -> bytes:
    """Encode an (n_samples, channels) int16 array as an uncompressed
    PCM WAV: RIFF header, fmt chunk (format tag 1 = PCM, 16-bit),
    little-endian interleaved samples — the real wire format, pure
    struct/numpy like the BMP codec."""
    import numpy as np

    pcm = np.asarray(samples, dtype="<i2")
    n, ch = pcm.shape
    data = pcm.tobytes()  # row-major == channel-interleaved frames
    block_align = ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block_align,
        block_align, 16,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes):
    """Decode an uncompressed 16-bit PCM WAV into ((n_samples,
    channels) int16 array, sample_rate). Walks the RIFF chunk stream
    (fmt before data, unknown chunks skipped, word-aligned sizes);
    compressed/float/other-depth formats are rejected loudly."""
    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", payload, pos + 4)
        chunk = payload[pos + 8 : pos + 8 + ln]
        if tag == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", chunk, 0)
        elif tag == b"data":
            data = chunk
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    tag_code, ch, rate, _, _, bits = fmt
    if tag_code == 0x11:
        # IMA ADPCM — the real compressed-audio path, decoded by the
        # pure-Python codec (operators/adpcmcodec.py re-walks the
        # chunks itself: it needs the fmt extension and fact count)
        from funding_monitoring_spark.operators.adpcmcodec import (
            decode_adpcm_wav,
        )

        return decode_adpcm_wav(payload)
    if tag_code == 3 and bits == 32:
        # IEEE-float PCM: scale to the int16 contract (round-half-
        # away like every fixed-point converter), clip at full scale
        f = np.frombuffer(data, dtype="<f4").astype(np.float64)
        scaled = f * 32767.0
        pcm = np.clip(
            np.trunc(scaled + np.where(scaled >= 0, 0.5, -0.5)),
            -32768,
            32767,
        ).astype(np.int16)
        return pcm.reshape(-1, ch), rate
    if tag_code == 1 and bits == 8:
        # 8-bit PCM is UNSIGNED per the WAV spec: recentre and widen
        u = np.frombuffer(data, dtype=np.uint8).astype(np.int16)
        return ((u - 128) << 8).reshape(-1, ch), rate
    if tag_code == 7 and bits == 8:  # G.711 mu-law (telephony)
        return _ulaw_to_linear(
            np.frombuffer(data, dtype=np.uint8)
        ).reshape(-1, ch), rate
    if tag_code == 6 and bits == 8:  # G.711 A-law (telephony)
        return _alaw_to_linear(
            np.frombuffer(data, dtype=np.uint8)
        ).reshape(-1, ch), rate
    if tag_code != 1 or bits != 16:
        raise NotImplementedError(
            f"only 8/16-bit PCM, float32 PCM, G.711 mu-law/A-law and "
            f"IMA ADPCM WAV supported (format={tag_code}, bits={bits})"
        )
    pcm = np.frombuffer(data, dtype="<i2")
    return pcm.reshape(-1, ch), rate


# -- G.711 companding (closed-form segment algebra; ITU G.711) -------------


def _ulaw_to_linear(b):
    """mu-law bytes -> int16 (the classic bit algebra: complement,
    4-bit mantissa biased by 0x84, 3-bit segment shift, sign)."""
    import numpy as np

    u = (~b.astype(np.int64)) & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)
    return np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)


def _linear_to_ulaw(x):
    """int16 -> mu-law bytes (exact inverse search of the segment
    algebra: bias, find the segment from the magnitude's top bit,
    take the 4 mantissa bits under it)."""
    import numpy as np

    v = x.astype(np.int64)
    sign = v < 0
    mag = np.minimum(np.where(sign, -v, v) + 0x84, 0x7FFF)
    # segment = position of the magnitude's top bit above bit 7
    seg = (63 - _np_clz64(mag) - 7).clip(0, 7)
    m = (mag >> (seg + 3)) & 0x0F
    u = (np.where(sign, 0x80, 0) | (seg << 4) | m) & 0xFF
    return (~u & 0xFF).astype(np.uint8)


def _np_clz64(v):
    """Count of leading zero bits of each positive int64 (via the
    float64 exponent — exact for values < 2^53, far above the 16-bit
    magnitudes used here)."""
    import numpy as np

    return 63 - np.floor(np.log2(np.maximum(v, 1))).astype(np.int64)


def _alaw_to_linear(b):
    """A-law bytes -> int16 (XOR 0x55 toggle, 4-bit mantissa, 3-bit
    segment; sign bit SET means positive in this convention)."""
    import numpy as np

    a = b.astype(np.int64) ^ 0x55
    m = (a & 0x0F) << 4
    seg = (a >> 4) & 0x07
    t = np.where(
        seg == 0,
        m + 8,
        np.where(seg == 1, m + 0x108, (m + 0x108) << (seg - 1).clip(0)),
    )
    return np.where(a & 0x80, t, -t).astype(np.int16)


def _linear_to_alaw(x):
    """int16 -> A-law bytes (segment search inverse)."""
    import numpy as np

    v = x.astype(np.int64)
    sign = v >= 0
    mag = np.minimum(np.where(sign, v, -v - 1), 0x7FFF)
    seg = (63 - _np_clz64(mag) - 7).clip(0, 7)
    m = np.where(seg == 0, mag >> 4, (mag >> (seg + 3)) & 0x0F)
    a = (np.where(sign, 0x80, 0) | (seg << 4) | m) & 0xFF
    return (a ^ 0x55).astype(np.uint8)


def encode_g711_wav(samples, sample_rate: int = 8000, law: str = "ulaw"):
    """(n,) or (n, ch) int16 -> G.711 WAV bytes (format tag 7 mu-law
    or 6 A-law, 8 bits per sample) — the telephony corpus format."""
    import numpy as np

    pcm = np.asarray(samples, dtype=np.int16)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    ch = pcm.shape[1]
    flat = pcm.reshape(-1)
    if law == "ulaw":
        data, tag = _linear_to_ulaw(flat).tobytes(), 7
    elif law == "alaw":
        data, tag = _linear_to_alaw(flat).tobytes(), 6
    else:
        raise ValueError("law must be 'ulaw' or 'alaw'")
    fmt = struct.pack(
        "<HHIIHH", tag, ch, sample_rate, sample_rate * ch, ch, 8
    )
    # RIFF chunks are word-aligned: an odd-length data chunk carries
    # a pad byte NOT counted in its size field
    pad = b"\x00" * (len(data) & 1)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data + pad
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _wav_shape(media_id: int) -> tuple[int, int]:
    return 50 + media_id % 64, 1 + media_id % 2  # (n_samples, channels)


WAV_RATE = 8000


def _wav_samples(media_id: int, n: int, ch: int):
    """Closed-form sample field: flat index j (frame-major,
    channel-interleaved) has amplitude ((media_id*13 + j)*97) % 65536
    − 32768 — integer-exact in the SQL oracle, no float anywhere."""
    import numpy as np

    j = np.arange(n * ch, dtype=np.int64)
    return (
        ((media_id * 13 + j) * 97 % 65536 - 32768)
        .astype(np.int16)
        .reshape(n, ch)
    )


def synthesize_wav_media(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Real PCM-WAV payloads from the closed-form sample field — the
    audio writer half. 1:1 mapInPandas, no shuffle."""
    register_module_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for mid in pdf["media_id"]:
                n, ch = _wav_shape(int(mid))
                payloads.append(
                    encode_wav(_wav_samples(int(mid), n, ch), WAV_RATE)
                )
                metas.append(
                    {
                        "modality": "audio",
                        "mime": "audio/wav",
                        "width": None,
                        "height": None,
                        "duration_ms": int(n * 1000 / WAV_RATE),
                    }
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    media_ids = _spread_ids(ids.select(F.col(id_col).alias("media_id")))
    return fused_map(media_ids, run, MEDIA_SCHEMA)


def decode_wav_features(media: DataFrame) -> DataFrame:
    """The audio reader half: parse each WAV with the REAL decoder
    (RIFF chunk walk, fmt validation, PCM16 deinterleave) and emit
    integer-exact amplitude statistics the SQL oracle can recompute
    from the sample formula."""
    register_module_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                pcm, rate = decode_wav(bytes(payload))
                n, ch = pcm.shape
                rows.append(
                    {
                        "media_id": mid,
                        "n_samples": n,
                        "channels": ch,
                        "sample_rate": rate,
                        "sum_amplitude": int(pcm.sum(dtype="int64")),
                        "min_amplitude": int(pcm.min()),
                        "max_amplitude": int(pcm.max()),
                    }
                )
            yield pd.DataFrame(rows)

    return fused_map(media, run, WAV_FEATURE_SCHEMA)


# -- AIFF / AIFF-C (big-endian PCM; Apple/SGI audio interchange) ------------


def _f80_encode(value: int) -> bytes:
    """Integer -> 80-bit IEEE 754 extended float (1 sign, 15 exponent
    bits biased 16383, 64 mantissa bits with an EXPLICIT leading 1) —
    the sampleRate field of the AIFF COMM chunk. Formula-defined, no
    tables."""
    if value == 0:
        return b"\x00" * 10
    if value < 0:
        raise ValueError("negative sample rate")
    e = value.bit_length() - 1
    return struct.pack(">HQ", 16383 + e, value << (63 - e))


def _f80_decode(b: bytes) -> int:
    exp, mant = struct.unpack(">HQ", b[:10])
    sign = -1 if exp & 0x8000 else 1
    exp &= 0x7FFF
    if exp == 0 and mant == 0:
        return 0
    shift = exp - 16383 - 63
    val = float(mant) * 2.0 ** shift
    return sign * int(val + 0.5)


def encode_aiff(samples, sample_rate: int = 8000, form: bytes = b"AIFF",
                little_endian: bool = False) -> bytes:
    """Encode an (n_samples, channels) int16 array as AIFF (plain,
    big-endian PCM) or AIFF-C (form=b'AIFC': 'NONE' big-endian or
    'sowt' little-endian PCM — the two uncompressed AIFC profiles
    real Mac-era corpora carry). Chunk layout per the public AIFF-1.3
    / AIFF-C specs: FORM container, COMM (channels, frames, bits,
    80-bit extended-float rate), SSND (offset/blockSize + frames)."""
    import numpy as np

    if form not in (b"AIFF", b"AIFC"):
        raise ValueError(f"unknown FORM type {form!r}")
    if little_endian and form != b"AIFC":
        raise ValueError("little-endian PCM requires AIFC ('sowt')")
    pcm = np.asarray(samples, dtype=np.int16)
    n, ch = pcm.shape
    data = pcm.astype("<i2" if little_endian else ">i2").tobytes()

    comm = struct.pack(">hLh", ch, n, 16) + _f80_encode(sample_rate)
    if form == b"AIFC":
        ctype = b"sowt" if little_endian else b"NONE"
        cname = b"not compressed"
        pstr = bytes([len(cname)]) + cname
        if len(pstr) % 2:
            pstr += b"\x00"
        comm += ctype + pstr

    def chunk(tag: bytes, body: bytes) -> bytes:
        out = tag + struct.pack(">L", len(body)) + body
        return out + (b"\x00" if len(body) % 2 else b"")

    body = form
    if form == b"AIFC":
        body += chunk(b"FVER", struct.pack(">L", 0xA2805140))
    body += chunk(b"COMM", comm)
    body += chunk(b"SSND", struct.pack(">LL", 0, 0) + data)
    return b"FORM" + struct.pack(">L", len(body)) + body


def decode_aiff(payload: bytes):
    """Decode AIFF / AIFF-C into ((n_samples, channels) int16,
    sample_rate). Chunk walk with word-aligned sizes; 16-bit PCM
    ('NONE'/plain big-endian, 'sowt' little-endian) and signed 8-bit
    PCM (widened <<8, the AIFF twin of the unsigned-8 WAV recentre)
    decode; compressed AIFC profiles (ulaw/ima4/...) refuse loudly."""
    import numpy as np

    if payload[:4] != b"FORM" or payload[8:12] not in (b"AIFF", b"AIFC"):
        raise ValueError("not an AIFF/AIFC payload")
    form = payload[8:12]
    pos, comm, ssnd = 12, None, None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (ln,) = struct.unpack_from(">L", payload, pos + 4)
        if tag == b"COMM":
            comm = payload[pos + 8 : pos + 8 + ln]
        elif tag == b"SSND":
            ssnd = payload[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)
    if comm is None or ssnd is None:
        raise ValueError("missing COMM or SSND chunk")
    ch, n_frames, bits = struct.unpack(">hLh", comm[:8])
    rate = _f80_decode(comm[8:18])
    little = False
    if form == b"AIFC":
        ctype = comm[18:22]
        if ctype == b"sowt":
            little = True
        elif ctype != b"NONE":
            raise NotImplementedError(
                f"compressed AIFC profile {ctype!r} not supported"
            )
    offset, _block = struct.unpack(">LL", ssnd[:8])
    data = ssnd[8 + offset :]
    if bits == 16:
        dt = "<i2" if little else ">i2"
        pcm = np.frombuffer(
            data[: n_frames * ch * 2], dtype=dt
        ).astype(np.int16)
    elif bits == 8:
        # AIFF 8-bit PCM is SIGNED (unlike WAV); widen to the int16
        # contract
        pcm = np.frombuffer(
            data[: n_frames * ch], dtype=np.int8
        ).astype(np.int16) << 8
    else:
        raise NotImplementedError(f"AIFF sample size {bits} unsupported")
    if pcm.size != n_frames * ch:
        raise ValueError("SSND shorter than COMM frame count")
    return pcm.reshape(n_frames, ch), rate


def synthesize_aiff_media(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Real AIFF payloads from the SAME closed-form sample field as
    the WAV writer, cycling the three uncompressed wire profiles by
    id: plain AIFF, AIFC 'NONE' (big-endian) and AIFC 'sowt'
    (little-endian). All lossless 16-bit PCM, so the roundtrip oracle
    is the WAV oracle verbatim."""
    register_module_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for mid in pdf["media_id"]:
                mid = int(mid)
                n, ch = _wav_shape(mid)
                form = (b"AIFF", b"AIFC", b"AIFC")[mid % 3]
                payloads.append(
                    encode_aiff(
                        _wav_samples(mid, n, ch),
                        WAV_RATE,
                        form=form,
                        little_endian=(mid % 3 == 2),
                    )
                )
                metas.append(
                    {
                        "modality": "audio",
                        "mime": "audio/aiff",
                        "width": None,
                        "height": None,
                        "duration_ms": int(n * 1000 / WAV_RATE),
                    }
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    media_ids = _spread_ids(ids.select(F.col(id_col).alias("media_id")))
    return fused_map(media_ids, run, MEDIA_SCHEMA)


def decode_aiff_features(media: DataFrame) -> DataFrame:
    """Reader half for the AIFF roundtrip — same integer-exact
    amplitude statistics as decode_wav_features, through the
    decode_audio magic-byte dispatch."""
    register_module_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                pcm, rate = decode_audio(bytes(payload))
                n, ch = pcm.shape
                rows.append(
                    {
                        "media_id": mid,
                        "n_samples": n,
                        "channels": ch,
                        "sample_rate": rate,
                        "sum_amplitude": int(pcm.sum(dtype="int64")),
                        "min_amplitude": int(pcm.min()),
                        "max_amplitude": int(pcm.max()),
                    }
                )
            yield pd.DataFrame(rows)

    return fused_map(media, run, WAV_FEATURE_SCHEMA)


# -- compressed audio: FLAC via the pure codec (no dependency) -------------


def synthesize_flac_media(
    ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Real FLAC payloads from the SAME closed-form sample field as
    the WAV writer (operators/flaccodec.py — pure-Python lossless
    codec, no optional dependency). Because FLAC is lossless the
    roundtrip oracle is the WAV oracle verbatim: integer-exact
    amplitude statistics, no tolerance flags."""
    register_module_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from funding_monitoring_spark.operators.flaccodec import (
            encode_flac,
        )

        for pdf in batches:
            payloads, metas = [], []
            for mid in pdf["media_id"]:
                n, ch = _wav_shape(int(mid))
                payloads.append(
                    encode_flac(_wav_samples(int(mid), n, ch), WAV_RATE)
                )
                metas.append(
                    {
                        "modality": "audio",
                        "mime": "audio/flac",
                        "width": None,
                        "height": None,
                        "duration_ms": int(n * 1000 / WAV_RATE),
                    }
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    media_ids = _spread_ids(ids.select(F.col(id_col).alias("media_id")))
    return fused_map(media_ids, run, MEDIA_SCHEMA)


def decode_flac_features(media: DataFrame) -> DataFrame:
    """Reader half of the FLAC round trip: decode through the
    decode_audio magic-byte dispatch (so the query exercises the
    same entry point a mixed audio column would) and emit the exact
    amplitude statistics of decode_wav_features."""
    register_module_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                pcm, rate = decode_audio(bytes(payload))
                n, ch = pcm.shape
                rows.append(
                    {
                        "media_id": mid,
                        "n_samples": n,
                        "channels": ch,
                        "sample_rate": rate,
                        "sum_amplitude": int(pcm.sum(dtype="int64")),
                        "min_amplitude": int(pcm.min()),
                        "max_amplitude": int(pcm.max()),
                    }
                )
            yield pd.DataFrame(rows)

    return fused_map(media, run, WAV_FEATURE_SCHEMA)


# -- MP3 structural metadata (header walk, no PCM decode) ------------------


def synthesize_mp3meta_media(
    ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Streams with REAL MPEG-1 Layer III frame structure (valid
    sync/index headers, spec-computed frame lengths, optional ID3v2
    envelope) from closed-form parameters. The main data is zeroed —
    these are metadata-scan fixtures, never claimed decodable; the
    scanner under test walks exactly the structure a real MP3
    carries (operators/mpegaudio.py)."""
    register_module_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from funding_monitoring_spark.operators.mpegaudio import (
            _BITRATES,
            _RATES,
            build_id3v2,
            build_mp3_frame,
        )

        for pdf in batches:
            payloads, metas = [], []
            for mid_ in pdf["media_id"]:
                mid = int(mid_)
                kbps = _BITRATES[1 + mid % 14]
                rate = _RATES[mid % 3]
                n = 3 + mid % 6
                buf = bytearray()
                if mid % 2:
                    buf += build_id3v2(40 + mid % 50)
                for f in range(n):
                    buf += build_mp3_frame(
                        kbps, rate, pad=(mid + f) % 3 == 0
                    )
                payloads.append(bytes(buf))
                metas.append(
                    {
                        "modality": "audio",
                        "mime": "audio/mpeg",
                        "width": None,
                        "height": None,
                        "duration_ms": n * 1152 * 1000 // rate,
                    }
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    media_ids = _spread_ids(ids.select(F.col(id_col).alias("media_id")))
    return fused_map(media_ids, run, MEDIA_SCHEMA)


def mp3_metadata_features(media: DataFrame) -> DataFrame:
    """Structural-metadata scan of an MP3 column: ID3v2 skip + frame
    walk with per-frame header validation — the routing/profiling
    pass a media pipeline runs BEFORE spending decode CPU. Exact
    integers, so the oracle recomputes them from the closed form."""
    register_module_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from funding_monitoring_spark.operators.mpegaudio import (
            parse_mp3_metadata,
        )

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                m = parse_mp3_metadata(bytes(payload))
                m["media_id"] = mid
                rows.append(m)
            yield pd.DataFrame(rows)

    return fused_map(
        media,
        run,
        schema=(
            "n_frames int, bitrate_kbps int, sample_rate int, "
            "duration_ms int, id3v2_bytes int, media_id long"
        ),
    )


# -- compressed audio: MP3 via the optional soundfile dependency -----------


def _soundfile_module():
    """The optional compressed-audio dependency (soundfile >= 0.12
    riding libsndfile with MP3 support), or None — probed at call
    time so executors resolve it against their own environment, same
    pattern as the Pillow JPEG path."""
    try:
        import soundfile  # noqa: PLC0415 — optional dependency

        return soundfile
    except ImportError:
        return None


def mp3_supported() -> bool:
    """True when the installed soundfile/libsndfile pair can actually
    round-trip MP3 (the Python module can be present while the native
    library predates MP3 support, so this probes with a real tiny
    encode+decode, cached per process)."""
    global _MP3_PROBE
    if _MP3_PROBE is None:
        sf = _soundfile_module()
        if sf is None:
            _MP3_PROBE = False
        else:
            try:
                import io

                import numpy as np

                buf = io.BytesIO()
                sf.write(
                    buf,
                    np.zeros((1152, 1), dtype="int16"),
                    MP3_RATE,
                    format="MP3",
                )
                buf.seek(0)
                sf.read(buf, dtype="int16")
                _MP3_PROBE = True
            except Exception:
                _MP3_PROBE = False
    return _MP3_PROBE


_MP3_PROBE: bool | None = None
MP3_RATE = 16000


def encode_mp3(samples, sample_rate: int = MP3_RATE) -> bytes:
    """Encode an (n_samples, channels) int16 array as MP3 via the
    optional soundfile dependency; raises loudly when the codec is
    unavailable — refusing, not faking, is the contract every
    compressed format here follows."""
    sf = _soundfile_module()
    if sf is None or not mp3_supported():
        raise NotImplementedError(
            "MP3 encode needs the optional soundfile dependency with "
            "an MP3-capable libsndfile (pip install soundfile)"
        )
    import io

    import numpy as np

    buf = io.BytesIO()
    sf.write(
        buf,
        np.asarray(samples, dtype="int16"),
        sample_rate,
        format="MP3",
    )
    return buf.getvalue()


def decode_mp3(payload: bytes):
    """Decode an MP3 into ((n_samples, channels) int16 array,
    sample_rate) via the optional soundfile dependency; raises loudly
    without it."""
    sf = _soundfile_module()
    if sf is None or not mp3_supported():
        raise NotImplementedError(
            "MP3 decode needs the optional soundfile dependency with "
            "an MP3-capable libsndfile; refusing to fake samples"
        )
    import io

    data, rate = sf.read(io.BytesIO(payload), dtype="int16")
    if data.ndim == 1:
        data = data.reshape(-1, 1)
    return data, rate


def decode_audio(payload: bytes):
    """Audio decode dispatch by magic bytes, the audio twin of
    decode_image: RIFF/WAVE decodes here for real (dependency-free
    PCM path); an ID3 tag or MPEG frame sync dispatches to the
    optional-dependency MP3 path; anything else is rejected loudly."""
    if payload[:4] == b"RIFF":
        return decode_wav(payload)
    if payload[:4] == b"FORM" and payload[8:12] in (b"AIFF", b"AIFC"):
        return decode_aiff(payload)
    if payload[:4] == b"fLaC":
        from funding_monitoring_spark.operators.flaccodec import (
            decode_flac,
        )

        return decode_flac(payload)
    if payload[:3] == b"ID3" or (
        len(payload) >= 2
        and payload[0] == 0xFF
        and (payload[1] & 0xE0) == 0xE0
    ):
        # pure Layer III decoder first (dependency-free; accepts
        # exactly the profile operators/mp3codec.py emits); streams
        # beyond that profile — or ones the strict walker rejects
        # that a resyncing full decoder may still read — fall back to
        # the optional soundfile path where it exists, else re-raise
        from funding_monitoring_spark.operators.mp3codec import (
            decode_mp3 as decode_mp3_pure,
        )

        try:
            return decode_mp3_pure(payload)
        except (NotImplementedError, ValueError):
            if mp3_supported():
                return decode_mp3(payload)
            raise
    raise NotImplementedError(
        "compressed-audio codec not recognized; WAV, FLAC and "
        "profile-constrained MP3 decode natively, full MP3 rides the "
        "optional soundfile dependency"
    )


def image_dhash_features(media: DataFrame) -> DataFrame:
    """Perceptual difference-hash (dHash) per image — the standard
    cheap image-dedup fingerprint: decode with the real codec,
    nearest-neighbor resize to 9x8 (the same floor convention as
    resize_images), integer grayscale (luma 299/587/114 per mille,
    floor division — no float anywhere), then 64 bits of
    brighter-than-the-right-neighbor comparisons, emitted as a
    16-hex-char string. Hamming-near hashes are near-duplicate
    images, so downstream dedup is the SimHash machinery applied to
    pixels; here the hash itself is the oracle-checked artifact
    (every stage is integer-exact and closed-form on the fixture
    field). 1:1 Arrow-batched mapInPandas, no shuffle."""
    register_module_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def dhash(payload: bytes) -> tuple[int, int, str]:
            px = decode_image(bytes(payload)).astype(np.int64)
            h_src, w_src, _ = px.shape
            xs = (np.arange(9) * w_src) // 9
            ys = (np.arange(8) * h_src) // 8
            small = px[np.ix_(ys, xs)]
            gray = (
                299 * small[..., 0]
                + 587 * small[..., 1]
                + 114 * small[..., 2]
            ) // 1000
            bits = 0
            for y in range(8):
                for x in range(8):
                    bits = (bits << 1) | int(
                        gray[y, x] > gray[y, x + 1]
                    )
            return h_src, w_src, f"{bits:016x}"

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                h, w, hx = dhash(payload)
                rows.append(
                    {
                        "media_id": mid,
                        "width": w,
                        "height": h,
                        "dhash": hx,
                    }
                )
            yield pd.DataFrame(rows)

    return fused_map(
        media,
        run,
        schema="media_id long, width int, height int, dhash string",
    )


#: the GIF fixture palette: index i -> (i, 3i mod 256, 7i mod 256) —
#: closed-form in the SQL oracle, so the indexed roundtrip is EXACT
def _gif_palette():
    import numpy as np

    i = np.arange(256)
    return np.stack(
        [i, (i * 3) % 256, (i * 7) % 256], axis=1
    ).astype(np.uint8)


def _gif_indices(media_id: int, w: int, h: int):
    """Closed-form index field: pixel p (row-major) has palette index
    ((media_id*7 + p*3) * 31) % 256 — the BMP field's R channel, so
    the oracle reuses the same arithmetic."""
    import numpy as np

    p = np.arange(w * h, dtype=np.int64)
    return (
        ((media_id * 7 + p * 3) * 31 % 256).astype(np.uint8).reshape(h, w)
    )


def synthesize_gif_media(
    ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Real GIF87a payloads (indexed color + LZW) from the closed-form
    index field — lossless, so the reader half is the exact
    decode_image_features path. 1:1 mapInPandas, no shuffle."""
    register_module_by_value()

    from funding_monitoring_spark.operators.gifcodec import encode_gif

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pal = _gif_palette()
        for pdf in batches:
            payloads, metas = [], []
            for mid in pdf["media_id"]:
                w, h = 2 + int(mid) % 6, 2 + int(mid) % 4
                payloads.append(
                    encode_gif(_gif_indices(int(mid), w, h), pal)
                )
                metas.append(
                    {
                        "modality": "image",
                        "mime": "image/gif",
                        "width": w,
                        "height": h,
                        "duration_ms": None,
                    }
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    media_ids = _spread_ids(ids.select(F.col(id_col).alias("media_id")))
    return fused_map(media_ids, run, MEDIA_SCHEMA)


def synthesize_adpcm_media(
    ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """IMA ADPCM payloads (mono) from the same closed-form sample
    field as the WAV writer — the compressed-audio writer half that
    needs NO optional dependency (operators/adpcmcodec.py). 1:1
    mapInPandas, no shuffle."""
    register_module_by_value()

    from funding_monitoring_spark.operators.adpcmcodec import (
        encode_adpcm_wav,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for mid in pdf["media_id"]:
                n = 50 + int(mid) % 64  # mono twin of _wav_shape
                payloads.append(
                    encode_adpcm_wav(
                        _adpcm_samples(int(mid), n), WAV_RATE
                    )
                )
                metas.append(
                    {
                        "modality": "audio",
                        "mime": "audio/x-adpcm",
                        "width": None,
                        "height": None,
                        "duration_ms": int(n * 1000 / WAV_RATE),
                    }
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    media_ids = _spread_ids(ids.select(F.col(id_col).alias("media_id")))
    return fused_map(media_ids, run, MEDIA_SCHEMA)


def _adpcm_samples(media_id: int, n: int):
    """Closed-form SMOOTH sample field for the ADPCM roundtrip: a
    per-id phase-shifted sine (max step ~785/sample — inside the
    codec's adaptation range). The PCM field (_wav_samples) is a
    sawtooth that cliff-wraps by -65536 mid-stream, which an
    adaptive-delta codec cannot track; the flag compares decoded
    vs source PYTHON-side, so the source needs no SQL twin and can
    be chosen to exercise the codec's intended regime."""
    import numpy as np

    j = np.arange(n, dtype=np.float64)
    return (
        (8000.0 * np.sin(2.0 * np.pi * (media_id * 13 + j) / 64.0))
        .astype(np.int16)
        .reshape(-1, 1)
    )


def decode_adpcm_features_tolerant(
    media: DataFrame, tol: float = 1024.0
) -> DataFrame:
    """Reader half for the ADPCM roundtrip: decode with the real
    codec (via decode_audio's WAV dispatch) and emit exact shape
    fields plus a mean-absolute-error flag against the closed-form
    source. ADPCM preserves the sample count exactly (fact chunk), so
    n_samples/channels/sample_rate hash directly; the amplitude
    tolerance (sine-field codec error <= ~400, misrouted payloads
    ~5900, garbage far beyond) is what makes 'decoded approximately
    the right stream' an exact, hashable assertion."""
    register_module_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                pcm, rate = decode_audio(bytes(payload))
                n_got, ch = pcm.shape
                src = _adpcm_samples(int(mid), n_got).astype(np.float64)
                mae = float(
                    np.abs(pcm.astype(np.float64) - src).mean()
                ) if n_got else 0.0
                rows.append(
                    {
                        "media_id": mid,
                        "n_samples": n_got,
                        "channels": ch,
                        "sample_rate": rate,
                        "mean_close": int(mae <= tol),
                    }
                )
            yield pd.DataFrame(rows)

    return fused_map(
        media,
        run,
        schema=(
            "media_id long, n_samples int, channels int, "
            "sample_rate int, mean_close int"
        ),
    )


def synthesize_g711_media(
    ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """G.711 WAV payloads (mu-law for even ids, A-law for odd) from
    the smooth ADPCM sample field — telephony-corpus audio. 1:1
    mapInPandas, no shuffle."""
    register_module_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for mid in pdf["media_id"]:
                n = 400 + int(mid) % 128
                law = "ulaw" if int(mid) % 2 == 0 else "alaw"
                payloads.append(
                    encode_g711_wav(
                        _adpcm_samples(int(mid), n), 8000, law
                    )
                )
                metas.append(
                    {
                        "modality": "audio",
                        "mime": "audio/wav",
                        "width": None,
                        "height": None,
                        "duration_ms": int(n * 1000 / 8000),
                    }
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    media_ids = _spread_ids(ids.select(F.col(id_col).alias("media_id")))
    return fused_map(media_ids, run, MEDIA_SCHEMA)


def decode_g711_features_tolerant(
    media: DataFrame, tol: float = 300.0
) -> DataFrame:
    """Reader half for the G.711 roundtrip: decode through the WAV
    dispatch (format tags 7/6) and flag mean absolute error against
    the closed-form source — companding error on the 8000-amplitude
    sine stays well under the tolerance, a misrouted payload or a
    law/sign/segment bug lands far outside. Shape fields are exact."""
    register_module_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                pcm, rate = decode_audio(bytes(payload))
                n_got, ch = pcm.shape
                src = _adpcm_samples(int(mid), n_got).astype(np.float64)
                mae = (
                    float(np.abs(pcm.astype(np.float64) - src).mean())
                    if n_got
                    else 0.0
                )
                rows.append(
                    {
                        "media_id": mid,
                        "n_samples": n_got,
                        "channels": ch,
                        "sample_rate": rate,
                        "mean_close": int(mae <= tol),
                    }
                )
            yield pd.DataFrame(rows)

    return fused_map(
        media,
        run,
        schema=(
            "media_id long, n_samples int, channels int, "
            "sample_rate int, mean_close int"
        ),
    )


def synthesize_mp3_media_libsndfile(
    ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """MP3 payloads from the same closed-form sample field as the WAV
    writer, via the optional soundfile codec (raises loudly without
    it). 1:1 mapInPandas, no shuffle."""
    register_module_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for mid in pdf["media_id"]:
                n, ch = _wav_shape(int(mid))
                payloads.append(
                    encode_mp3(_wav_samples(int(mid), n, ch), MP3_RATE)
                )
                metas.append(
                    {
                        "modality": "audio",
                        "mime": "audio/mpeg",
                        "width": None,
                        "height": None,
                        "duration_ms": int(n * 1000 / MP3_RATE),
                    }
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    media_ids = _spread_ids(ids.select(F.col(id_col).alias("media_id")))
    return fused_map(media_ids, run, MEDIA_SCHEMA)


# -- pure-codec MP3 path (operators/mp3codec.py; no dependencies) ----------

MP3_PURE_RATE = 32000  #: MPEG-1 Layer III rate used by the pure path


def _mp3_shape(media_id: int) -> tuple[int, int]:
    """(n_samples, channels) for the pure-MP3 fixture: multi-frame
    clips (the WAV field's 50-113 samples fit inside one frame's
    padding and would drown in it)."""
    return 2000 + (media_id % 16) * 64, 1 + media_id % 2


def _mp3_samples(media_id: int, n: int, ch: int):
    """Closed-form SMOOTH per-channel sine (500 Hz at 32 kHz, phase
    keyed by media_id and channel) — like the ADPCM fixture, chosen
    inside the codec's intended regime; the tolerance flags compare
    decoded vs source PYTHON-side, so the field needs no SQL twin."""
    import numpy as np

    j = np.arange(n, dtype=np.float64)[:, None]
    c = np.arange(ch, dtype=np.float64)[None, :]
    return (
        8000.0 * np.sin(2.0 * np.pi * (media_id * 13 + j + 7.0 * c) / 64.0)
    ).astype(np.int16)


def synthesize_mp3_pure_media(
    ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """MP3 payloads via the dependency-free Layer III encoder
    (operators/mp3codec.py — real MPEG-1 streams in the module's
    documented profile). 1:1 mapInPandas, no shuffle."""
    register_module_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from funding_monitoring_spark.operators.mp3codec import (
            encode_mp3 as encode_mp3_pure,
        )

        for pdf in batches:
            payloads, metas = [], []
            for mid in pdf["media_id"]:
                n, ch = _mp3_shape(int(mid))
                payloads.append(
                    encode_mp3_pure(
                        _mp3_samples(int(mid), n, ch), MP3_PURE_RATE
                    )
                )
                metas.append(
                    {
                        "modality": "audio",
                        "mime": "audio/mpeg",
                        "width": None,
                        "height": None,
                        "duration_ms": int(n * 1000 / MP3_PURE_RATE),
                    }
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    media_ids = _spread_ids(ids.select(F.col(id_col).alias("media_id")))
    return fused_map(media_ids, run, MEDIA_SCHEMA)


def decode_mp3_features_tolerant(media: DataFrame) -> DataFrame:
    """Reader half for the pure-codec MP3 roundtrip: decode with the
    real Layer III pipeline and flag the stream against the
    closed-form source. MP3 has no sample-count field, so length is
    asserted within one frame-pair (2x1152, padding + filterbank
    latency); energy within 3 dB and per-channel correlation >= 0.9
    over the overlap bound the two-level quantizer's error — any
    misrouted payload, channel swap, or desync breaks them. Exact
    fields (media_id, channels, sample_rate) hash directly."""
    register_module_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                pcm, rate = decode_audio(bytes(payload))
                n_got, ch = pcm.shape
                n_src, src_ch = _mp3_shape(int(mid))
                m = min(n_got, n_src)
                src = _mp3_samples(int(mid), n_src, src_ch)[:m].astype(
                    np.float64
                )
                got = pcm[:m].astype(np.float64)
                e_ratio = (
                    float((got**2).mean()) / float((src**2).mean())
                    if m and (src**2).mean() > 0
                    else 0.0
                )
                corr = (
                    min(
                        float(np.corrcoef(got[:, c], src[:, c])[0, 1])
                        for c in range(min(ch, src_ch))
                    )
                    if m > 1 and ch == src_ch
                    else 0.0
                )
                rows.append(
                    {
                        "media_id": mid,
                        "channels": ch,
                        "sample_rate": rate,
                        "length_close": int(abs(n_got - n_src) <= 2 * 1152),
                        "energy_close": int(0.5 <= e_ratio <= 2.0),
                        "shape_close": int(corr >= 0.9),
                    }
                )
            yield pd.DataFrame(rows)

    return fused_map(
        media,
        run,
        schema=(
            "media_id long, channels int, sample_rate int, "
            "length_close int, energy_close int, shape_close int"
        ),
    )


def decode_audio_features_tolerant(media: DataFrame) -> DataFrame:
    """Reader half for LOSSY audio (MP3): decode with the real codec
    and flag the stream as close to the closed-form source the writer
    encoded. MP3 adds encoder delay and frame padding, so even the
    sample COUNT is approximate — the flags assert (1) the decoded
    length is within one frame-pair (2×1152 samples) of the source,
    (2) the decoded energy is within 3 dB of the source energy —
    bounds any real codec meets and any channel/garbage bug breaks.
    Exact fields (media_id, channels, sample_rate) hash directly."""
    register_module_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                pcm, rate = decode_audio(bytes(payload))
                n_got, ch = pcm.shape
                n_src, src_ch = _wav_shape(int(mid))
                src = _wav_samples(int(mid), n_src, src_ch).astype(
                    np.float64
                )
                got_energy = float(
                    (pcm.astype(np.float64) ** 2).mean()
                ) if n_got else 0.0
                src_energy = float((src**2).mean())
                rows.append(
                    {
                        "media_id": mid,
                        "channels": ch,
                        "sample_rate": rate,
                        "length_close": int(
                            abs(n_got - n_src) <= 2 * 1152
                        ),
                        "energy_close": int(
                            src_energy > 0
                            and 0.5 <= got_energy / src_energy <= 2.0
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    return fused_map(
        media,
        run,
        schema=(
            "media_id long, channels int, sample_rate int, "
            "length_close int, energy_close int"
        ),
    )


# -- real video container: uncompressed AVI (RIFF, raw DIB frames) ---------


def _dib_body(px) -> bytes:
    """Raw DIB pixel block: BGR channel order, bottom-up rows, rows
    padded to 4 bytes — shared by BMP files and AVI '00db' frames."""
    import numpy as np

    px = np.asarray(px, dtype=np.uint8)
    h, w, _ = px.shape
    pad = b"\x00" * ((4 - (w * 3) % 4) % 4)
    return b"".join(px[y, :, ::-1].tobytes() + pad for y in range(h - 1, -1, -1))


def _dib_decode(data: bytes, w: int, h: int):
    import numpy as np

    pad = (4 - (w * 3) % 4) % 4
    row_size = w * 3 + pad
    out = np.empty((h, w, 3), dtype=np.uint8)
    for i in range(h):
        row = np.frombuffer(
            data, dtype=np.uint8, count=w * 3, offset=i * row_size
        ).reshape(w, 3)[:, ::-1]
        out[h - 1 - i] = row
    return out


def _riff_list(tag: bytes, body: bytes) -> bytes:
    return b"LIST" + struct.pack("<I", len(body) + 4) + tag + body


def _riff_chunk(tag: bytes, body: bytes) -> bytes:
    return tag + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) & 1))


AVI_FPS = 10


def encode_avi(frames, codec: bytes = b"DIB ") -> bytes:
    """Encode a list/array of (h, w, 3) uint8 RGB frames as a minimal
    spec-compliant AVI: RIFF('AVI ') with an hdrl LIST (56-byte avih
    main header + a vids strl whose strf is the same BITMAPINFOHEADER
    a BMP carries), a movi LIST of frame chunks, and an idx1 index —
    the real container format.

    codec=b"DIB " (default) writes raw-DIB '00db' frames, pure
    struct/numpy. codec=b"MJPG" writes each frame as a JPEG '00dc'
    chunk via encode_jpeg (Pillow when installed, the pure baseline
    codec otherwise) — the standard motion-JPEG layout, where the
    container is ours either way."""
    import numpy as np

    if codec not in (b"DIB ", b"MJPG"):
        raise NotImplementedError(f"AVI codec {codec!r} not supported")
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w, _ = frames[0].shape
    if codec == b"MJPG":
        bodies = [encode_jpeg(f) for f in frames]
        chunk_tag, compression = b"00dc", int.from_bytes(
            b"MJPG", "little"
        )
    else:
        bodies = [_dib_body(f) for f in frames]
        chunk_tag, compression = b"00db", 0
    frame_size = max(len(b) for b in bodies)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // AVI_FPS,  # microseconds per frame
        frame_size * AVI_FPS,  # max bytes per second
        0, 0x10,  # padding, flags (AVIF_HASINDEX)
        len(frames), 0, 1, frame_size, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", codec, 0, 0, 0, 0,
        1, AVI_FPS,  # scale, rate -> fps
        0, len(frames), frame_size, 0, 0, 0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, w, h, 1, 24, compression, frame_size, 2835, 2835, 0, 0,
    )
    hdrl = _riff_list(
        b"hdrl",
        _riff_chunk(b"avih", avih)
        + _riff_list(
            b"strl", _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)
        ),
    )
    movi_body = b"".join(_riff_chunk(chunk_tag, b) for b in bodies)
    movi = _riff_list(b"movi", movi_body)
    # idx1: (ckid, flags=AVIIF_KEYFRAME, offset from movi tag+4, size)
    idx_entries, off = [], 4
    for b in bodies:
        idx_entries.append(
            struct.pack("<4sIII", chunk_tag, 0x10, off, len(b))
        )
        off += 8 + len(b) + (len(b) & 1)
    idx1 = _riff_chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


#: strf biCompression fourcc for motion JPEG
_MJPG_FOURCC = int.from_bytes(b"MJPG", "little")


def decode_avi(payload: bytes):
    """Decode an AVI into (list of (h, w, 3) uint8 RGB frames, fps):
    validate the RIFF/'AVI ' envelope, read dimensions and frame
    count from avih, fps from the vids strh scale/rate pair, then walk
    the movi LIST decoding each '00db'/'00dc' chunk. Raw-DIB streams
    decode dependency-free; MJPG streams decode each frame through
    decode_image's JPEG path (Pillow when installed, the pure
    baseline codec otherwise); any other compression is rejected
    loudly."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    pos, dims, n_frames, fps, frames = 12, None, None, None, []
    codec = b"DIB "

    def walk(lo: int, hi: int) -> None:
        nonlocal dims, n_frames, fps, frames, codec
        pos = lo
        while pos + 8 <= hi:
            tag = payload[pos : pos + 4]
            (ln,) = struct.unpack_from("<I", payload, pos + 4)
            body_lo = pos + 8
            if tag == b"LIST":
                walk(body_lo + 4, body_lo + ln)  # skip list type tag
            elif tag == b"avih":
                vals = struct.unpack_from("<IIIIIIIIIIIIII", payload, body_lo)
                n_frames, dims = vals[4], (vals[8], vals[9])
            elif tag == b"strh":
                fcc, handler = struct.unpack_from("<4s4s", payload, body_lo)
                if fcc == b"vids":
                    if handler not in (
                        b"DIB ",
                        b"\x00\x00\x00\x00",
                        b"MJPG",
                    ):
                        raise NotImplementedError(
                            f"compressed AVI stream {handler!r} not "
                            "supported (raw DIB or MJPG only)"
                        )
                    if handler == b"MJPG":
                        codec = b"MJPG"
                    scale, rate = struct.unpack_from(
                        "<II", payload, body_lo + 20
                    )
                    fps = rate // max(scale, 1)
            elif tag == b"strf":
                comp = struct.unpack_from("<IiiHHI", payload, body_lo)[5]
                if comp not in (0, _MJPG_FOURCC):
                    raise NotImplementedError("compressed AVI frames")
            elif tag in (b"00db", b"00dc"):
                if dims is None:
                    raise ValueError("frame chunk before avih header")
                w, h = dims
                body = payload[body_lo : body_lo + ln]
                frames.append(
                    decode_image(body)
                    if codec == b"MJPG"
                    else _dib_decode(body, w, h)
                )
            pos = body_lo + ln + (ln & 1)

    walk(pos, len(payload))
    if dims is None or n_frames is None:
        raise ValueError("missing avih header")
    if len(frames) != n_frames:
        raise ValueError(
            f"frame count mismatch: avih says {n_frames}, movi has "
            f"{len(frames)}"
        )
    return frames, fps


def _avi_n_frames(media_id: int) -> int:
    return 2 + media_id % 4


def _avi_frame_pixels(media_id: int, f: int, w: int, h: int):
    """Closed-form per-frame pixel field: channel j of frame f has
    value ((media_id*7 + f*11 + j)*31) % 256 — SQL-reproducible."""
    import numpy as np

    j = np.arange(w * h * 3, dtype=np.int64)
    return (
        ((media_id * 7 + f * 11 + j) * 31 % 256)
        .astype(np.uint8)
        .reshape(h, w, 3)
    )


def synthesize_avi_media(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Real uncompressed-AVI payloads (one per id, 2-5 raw-DIB frames
    from the closed-form field) — the video writer half. 1:1
    mapInPandas, no shuffle."""
    register_module_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for mid in pdf["media_id"]:
                w, h = _bmp_dims(int(mid))
                n = _avi_n_frames(int(mid))
                payloads.append(
                    encode_avi(
                        [
                            _avi_frame_pixels(int(mid), f, w, h)
                            for f in range(n)
                        ]
                    )
                )
                metas.append(
                    {
                        "modality": "video",
                        "mime": "video/x-msvideo",
                        "width": w,
                        "height": h,
                        "duration_ms": int(n * 1000 / AVI_FPS),
                    }
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    media_ids = _spread_ids(ids.select(F.col(id_col).alias("media_id")))
    return fused_map(media_ids, run, MEDIA_SCHEMA)


AVI_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("fps", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("corner_r", T.IntegerType()),
        T.StructField("corner_g", T.IntegerType()),
        T.StructField("corner_b", T.IntegerType()),
    ]
)


def decode_avi_frames(media: DataFrame) -> DataFrame:
    """The video reader half: parse each AVI with the REAL container
    decoder and emit one row per frame (1:N mapInPandas fan-out, the
    keyframe-iterator shape) — red-channel mean plus the top-left
    pixel per frame; a frame-order, row-flip, or channel-order bug
    moves them."""
    register_module_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                frames, fps = decode_avi(bytes(payload))
                for f_idx, px in enumerate(frames):
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_idx": f_idx,
                            "fps": fps,
                            "mean_r": round(
                                float(px[:, :, 0].mean()), 6
                            ),
                            "corner_r": int(px[0, 0, 0]),
                            "corner_g": int(px[0, 0, 1]),
                            "corner_b": int(px[0, 0, 2]),
                        }
                    )
            yield pd.DataFrame(rows)

    return fused_map(media, run, AVI_FRAME_SCHEMA)


def synthesize_mjpg_avi_media(
    ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Motion-JPEG AVI payloads from the same closed-form per-frame
    pixel field as the raw-DIB writer — container ours, per-frame
    codec via the optional Pillow dependency (raises loudly without
    it). 1:1 mapInPandas, no shuffle."""
    register_module_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for mid in pdf["media_id"]:
                w, h = _bmp_dims(int(mid))
                n = _avi_n_frames(int(mid))
                payloads.append(
                    encode_avi(
                        [
                            _avi_frame_pixels(int(mid), f, w, h)
                            for f in range(n)
                        ],
                        codec=b"MJPG",
                    )
                )
                metas.append(
                    {
                        "modality": "video",
                        "mime": "video/x-msvideo",
                        "width": w,
                        "height": h,
                        "duration_ms": int(n * 1000 / AVI_FPS),
                    }
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    media_ids = _spread_ids(ids.select(F.col(id_col).alias("media_id")))
    return fused_map(media_ids, run, MEDIA_SCHEMA)


def decode_avi_frames_tolerant(
    media: DataFrame, tol: float = 16.0
) -> DataFrame:
    """Reader half for LOSSY AVI codecs (MJPG): parse the container
    with the real decoder, fan out one row per frame, and flag each
    frame's per-channel mean as within-tolerance of the closed-form
    field the writer encoded — exact means can't survive a lossy
    per-frame codec, but the flags (plus exact fps and frame fan-out)
    make the roundtrip hashable: a frame-order, channel-order, or
    garbage-decode bug lands far outside quantization loss."""
    register_module_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                frames, fps = decode_avi(bytes(payload))
                for f_idx, px in enumerate(frames):
                    h, w, _ = px.shape
                    got = px.reshape(-1, 3).mean(axis=0)
                    want = (
                        _avi_frame_pixels(int(mid), f_idx, w, h)
                        .reshape(-1, 3)
                        .mean(axis=0)
                    )
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_idx": f_idx,
                            "fps": fps,
                            "mean_close_r": int(
                                abs(got[0] - want[0]) <= tol
                            ),
                            "mean_close_g": int(
                                abs(got[1] - want[1]) <= tol
                            ),
                            "mean_close_b": int(
                                abs(got[2] - want[2]) <= tol
                            ),
                        }
                    )
            yield pd.DataFrame(rows)

    return fused_map(
        media,
        run,
        schema=(
            "media_id long, frame_idx int, fps int, "
            "mean_close_r int, mean_close_g int, mean_close_b int"
        ),
    )


def synthesize_jpeg_media(
    ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Real JPEG payloads from the closed-form pixel field, via the
    optional Pillow dependency (encode_jpeg raises without it)."""
    return _synthesize_media(ids, id_col, encode_jpeg, "image/jpeg")


def _encode_jpeg420(px) -> bytes:
    from funding_monitoring_spark.operators.jpegcodec import (
        encode_baseline_jpeg,
    )

    return encode_baseline_jpeg(px, quality=95, subsampling="420")


def _encode_jpeg_progressive(px) -> bytes:
    from funding_monitoring_spark.operators.jpegcodec import (
        encode_progressive_jpeg,
    )

    return encode_progressive_jpeg(px, quality=95, subsampling="420")


def synthesize_jpeg_progressive_media(
    ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Progressive (SOF2) 4:2:0 JPEG payloads — the profile real web
    image corpora most commonly combine (progressive + subsampled) —
    via the pure codec's standard 10-scan script
    (operators/jpegcodec.py encode_progressive_jpeg)."""
    return _synthesize_media(
        ids, id_col, _encode_jpeg_progressive, "image/jpeg"
    )


def synthesize_jpeg420_media(
    ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Real 4:2:0 chroma-subsampled JPEG payloads — always the pure
    codec (not Pillow), pinning the exact profile real web corpora
    carry so the decoder's subsampled path is what gets exercised
    regardless of environment."""
    return _synthesize_media(ids, id_col, _encode_jpeg420, "image/jpeg")


def _encode_jpeg_multiscan(px) -> bytes:
    from funding_monitoring_spark.operators.jpegcodec import (
        encode_multiscan_jpeg,
    )

    return encode_multiscan_jpeg(px, quality=95, subsampling="420")


def synthesize_jpeg_multiscan_media(
    ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Multi-scan (NON-INTERLEAVED) sequential 4:2:0 JPEG payloads:
    one SOS per component, blocks in per-component raster order —
    the legal SOF0 shape custom-scan-script encoders emit that the
    r9 decoder refused loudly (jpegcodec.py encode_multiscan_jpeg /
    _sequential_scan close that gap). Same closed-form pixel field
    as every other image profile."""
    return _synthesize_media(
        ids, id_col, _encode_jpeg_multiscan, "image/jpeg"
    )


def synthesize_jpeg12_media(
    ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """12-bit extended-sequential (SOF1) JPEG payloads: the 8-bit
    closed-form pixel field promoted to 12-bit samples (x16), so the
    decoder's strip-to-8-bit output is directly comparable to the
    field under the usual lossy tolerance — a precision, level-shift,
    or /16 scaling bug lands a full factor off."""

    def enc12(px8):
        import numpy as np

        from funding_monitoring_spark.operators.jpegcodec import (
            encode_jpeg12,
        )

        return encode_jpeg12(px8.astype(np.uint16) * 16, 95)

    return _synthesize_media(ids, id_col, enc12, "image/jpeg")


def decode_image_features_tolerant(
    media: DataFrame, tol: float = 16.0
) -> DataFrame:
    """Reader half for LOSSY codecs (JPEG): decode each payload with
    the real codec, then compare the per-channel means against the
    closed-form pixel field the writer encoded and emit
    within-tolerance flags. Exact means can't be oracle-checked for
    a lossy codec — the flags turn 'decoded approximately the right
    image' into an exact, hashable assertion (a channel swap,
    row flip, or garbage decode pushes the mean error far past any
    quantization loss)."""
    register_module_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_image(bytes(payload))
                h, w, _ = px.shape
                got = px.reshape(-1, 3).mean(axis=0)
                want = (
                    _bmp_pixels(int(mid), w, h)
                    .reshape(-1, 3)
                    .mean(axis=0)
                )
                rows.append(
                    {
                        "media_id": mid,
                        "width": w,
                        "height": h,
                        "mean_close_r": int(abs(got[0] - want[0]) <= tol),
                        "mean_close_g": int(abs(got[1] - want[1]) <= tol),
                        "mean_close_b": int(abs(got[2] - want[2]) <= tol),
                    }
                )
            yield pd.DataFrame(rows)

    return fused_map(
        media,
        run,
        schema=(
            "media_id long, width int, height int, "
            "mean_close_r int, mean_close_g int, mean_close_b int"
        ),
    )


# -- charset detection (the sniffing pass a text crawl runs before any
# decode — raw bytes arrive in whatever encoding the origin served) ---------

CHARSET_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("detected", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("n_non_ascii", T.LongType()),
        T.StructField("fingerprint", T.LongType()),
    ]
)


def _charset_text(text: str) -> str:
    """Deterministic non-ASCII injection so every encoding is
    distinguishable on the wire: 'a' -> 'ä', 'e' -> 'é' (both Latin-1
    + BMP, both length-preserving)."""
    return text.replace("a", "ä").replace("e", "é")


def synthesize_charset_media(docs: DataFrame) -> DataFrame:
    """Byte payloads in the three encodings a crawl actually sees,
    cycling by id: UTF-8 (id%3==0), UTF-16 with BOM (id%3==1),
    Latin-1 (id%3==2). 1:1 Arrow-batched mapInPandas."""
    register_module_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for mid, text in zip(pdf["media_id"], pdf["text"]):
                enc = ("utf-8", "utf-16", "latin-1")[int(mid) % 3]
                payloads.append(_charset_text(str(text)).encode(enc))
                metas.append(
                    {
                        "modality": "document",
                        "mime": "text/plain",
                        "width": None,
                        "height": None,
                        "duration_ms": None,
                    }
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    ids = _spread_ids(
        docs.select(F.col("doc_id").alias("media_id"), "text")
    )
    return fused_map(ids, run, MEDIA_SCHEMA)


def detect_charset_features(media: DataFrame) -> DataFrame:
    """Charset sniffing over raw byte payloads, the standard ladder:
    a UTF-16 BOM wins outright; else a STRICT UTF-8 decode attempt
    (any pure-ASCII stream lands here — ASCII IS valid UTF-8, the
    honest answer); else Latin-1, which never fails (every byte maps).
    The decoded text is fingerprinted with the same rolling polynomial
    as doc_fingerprint so the oracle (which knows the original text
    and the id-cycled encoding) verifies the DECODE, not just the
    label. 1:1 Arrow-batched mapInPandas — at 100 TB this is a
    scan-stage map over payload bytes, embarrassingly parallel."""
    register_module_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from funding_monitoring_spark.operators.textstats import (
            POLY_INIT,
            POLY_MOD,
            POLY_MULT,
        )

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                if raw[:2] in (b"\xff\xfe", b"\xfe\xff"):
                    detected = "utf-16"
                    text = raw.decode("utf-16")
                else:
                    try:
                        text = raw.decode("utf-8", errors="strict")
                        detected = "utf-8"
                    except UnicodeDecodeError:
                        text = raw.decode("latin-1")
                        detected = "latin-1"
                fp = POLY_INIT
                for ch in text:
                    fp = (fp * POLY_MULT + ord(ch)) % POLY_MOD
                rows.append(
                    {
                        "media_id": mid,
                        "detected": detected,
                        "n_bytes": len(raw),
                        "n_chars": len(text),
                        "n_non_ascii": sum(
                            1 for ch in text if ord(ch) > 127
                        ),
                        "fingerprint": fp,
                    }
                )
            yield pd.DataFrame(rows)

    return fused_map(media, run, CHARSET_FEATURE_SCHEMA)
