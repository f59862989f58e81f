"""Pure-codec tests for the baseline TIFF implementation
(operators/tiffcodec.py): PackBits hand vectors, TIFF-LZW width-ladder
and table-reset roundtrips, container roundtrips across the full
variant space (byte order x compression x predictor x strip height),
and loud refusals for out-of-profile shapes."""

import struct

import numpy as np
import pytest

from funding_monitoring_spark.operators.tiffcodec import (
    decode_tiff,
    encode_tiff,
    lzw_decode,
    lzw_encode,
    packbits_decode,
    packbits_encode,
)


def test_packbits_hand_vectors():
    # header 0xFE = -2 -> repeat next byte 3x; header 2 -> 3 literals
    assert packbits_decode(b"\xfe\xaa", 3) == b"\xaa\xaa\xaa"
    assert packbits_decode(b"\x02abc", 3) == b"abc"
    # 0x80 is a no-op header
    assert packbits_decode(b"\x80\x00a", 1) == b"a"
    assert packbits_encode(b"\xaa\xaa\xaa") == b"\xfe\xaa"


@pytest.mark.parametrize("n", [0, 1, 2, 3, 127, 128, 129, 300, 1000])
def test_packbits_roundtrip(n):
    rng = np.random.RandomState(n)
    runs = bytes(rng.randint(0, 4, n).astype(np.uint8))
    assert packbits_decode(packbits_encode(runs), n) == runs
    noise = bytes(rng.randint(0, 256, n).astype(np.uint8))
    assert packbits_decode(packbits_encode(noise), n) == noise


def test_packbits_truncation_is_loud():
    with pytest.raises(ValueError):
        packbits_decode(b"\x05ab", 6)
    with pytest.raises(ValueError):
        packbits_decode(b"\xfe", 3)


@pytest.mark.parametrize("n", [0, 1, 2, 255, 256, 300, 5000, 20000])
def test_lzw_roundtrip(n):
    rng = np.random.RandomState(n)
    # low-alphabet data grows the table fast across the 511/1023
    # early-change boundaries; full-alphabet checks literal paths
    d = bytes(rng.randint(0, 7, n).astype(np.uint8))
    assert lzw_decode(lzw_encode(d)) == d
    d2 = bytes(rng.randint(0, 256, n).astype(np.uint8))
    assert lzw_decode(lzw_encode(d2)) == d2


def test_lzw_table_reset_territory():
    # an all-same megabyte walks the table to the 4094 reset many times
    d = b"\x42" * 1_000_000
    assert lzw_decode(lzw_encode(d)) == d


def test_lzw_starts_with_clear_ends_with_eoi():
    enc = lzw_encode(b"abc")
    # first 9 bits MSB-first must be the ClearCode (256 = 0x100)
    first = (enc[0] << 1) | (enc[1] >> 7)
    assert first == 256


def test_lzw_truncation_is_loud():
    enc = lzw_encode(bytes(range(100)))
    with pytest.raises(ValueError):
        lzw_decode(enc[: len(enc) // 2])


@pytest.mark.parametrize("byte_order", ["<", ">"])
@pytest.mark.parametrize("compression", [1, 5, 8, 32773])
@pytest.mark.parametrize("predictor", [1, 2])
@pytest.mark.parametrize("rows_per_strip", [None, 1, 2, 4])
def test_container_roundtrip_rgb(byte_order, compression, predictor,
                                 rows_per_strip):
    rng = np.random.RandomState(11)
    px = rng.randint(0, 256, (11, 16, 3)).astype(np.uint8)
    t = encode_tiff(px, byte_order=byte_order, compression=compression,
                    predictor=predictor, rows_per_strip=rows_per_strip)
    assert (decode_tiff(t) == px).all()


@pytest.mark.parametrize("byte_order", ["<", ">"])
@pytest.mark.parametrize("compression", [1, 5, 8, 32773])
def test_container_roundtrip_gray_replicates_channels(byte_order,
                                                      compression):
    rng = np.random.RandomState(3)
    g = rng.randint(0, 256, (7, 5)).astype(np.uint8)
    t = encode_tiff(g, byte_order=byte_order, compression=compression,
                    rows_per_strip=2)
    assert (decode_tiff(t) == np.repeat(g[:, :, None], 3, axis=2)).all()


def test_single_pixel_and_single_row():
    for shape in [(1, 1, 3), (1, 9, 3), (9, 1, 3)]:
        px = np.arange(np.prod(shape), dtype=np.uint8).reshape(shape)
        for comp in (1, 5, 8, 32773):
            assert (decode_tiff(encode_tiff(px, compression=comp)) == px).all()


def _retag(payload: bytes, tag: int, new_inline_short: int) -> bytes:
    """Rewrite an inline SHORT tag value in a little-endian TIFF."""
    (n,) = struct.unpack("<H", payload[8:10])
    out = bytearray(payload)
    for i in range(n):
        pos = 10 + 12 * i
        t = struct.unpack("<H", payload[pos : pos + 2])[0]
        if t == tag:
            out[pos + 8 : pos + 10] = struct.pack("<H", new_inline_short)
            return bytes(out)
    raise AssertionError(f"tag {tag} not present")


def test_refusals_are_loud():
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    t = encode_tiff(px)
    with pytest.raises(NotImplementedError):
        decode_tiff(_retag(t, 284, 2))  # planar configuration 2
    with pytest.raises(NotImplementedError):
        decode_tiff(_retag(t, 259, 7))  # JPEG compression
    with pytest.raises(NotImplementedError):
        decode_tiff(_retag(t, 262, 5))  # CMYK photometric
    g = encode_tiff(np.zeros((4, 4), dtype=np.uint8))
    with pytest.raises(NotImplementedError):
        decode_tiff(_retag(g, 258, 16))  # 16-bit depth
    # a tile tag anywhere in the IFD refuses before pixel work
    (n,) = struct.unpack("<H", t[8:10])
    tiled = bytearray(t)
    pos = 10  # overwrite the first entry's tag id with TileWidth
    tiled[pos : pos + 2] = struct.pack("<H", 322)
    with pytest.raises(NotImplementedError):
        decode_tiff(bytes(tiled))


def test_not_a_tiff_is_loud():
    with pytest.raises(ValueError):
        decode_tiff(b"II+\x00\x00\x00\x00\x00")
    with pytest.raises(ValueError):
        decode_tiff(b"BM123456")


def test_strip_truncation_is_loud():
    px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    t = encode_tiff(px, compression=1)
    with pytest.raises(ValueError):
        decode_tiff(t[:-5])


def test_dispatch_through_decode_image():
    from funding_monitoring_spark.operators.multimodal import decode_image

    px = np.arange(60, dtype=np.uint8).reshape(4, 5, 3)
    for bo in "<>":
        assert (decode_image(encode_tiff(px, byte_order=bo)) == px).all()


def test_fixture_field_matches_bmp_codec():
    """The TIFF synth uses the same closed-form field as BMP — the
    lossless decode must agree with the field exactly (the SQL oracle
    replays it)."""
    from funding_monitoring_spark.operators.multimodal import (
        _bmp_pixels,
        _tiff_dims,
    )

    for mid in [0, 1, 2, 3, 5, 12, 999]:
        w, h = _tiff_dims(mid)
        px = _bmp_pixels(mid, w, h)
        comp = (1, 5, 8, 32773)[mid % 4]
        t = encode_tiff(
            px,
            byte_order="<" if mid % 2 == 0 else ">",
            compression=comp,
            predictor=2 if comp == 5 and mid % 2 == 0 else 1,
            rows_per_strip=(1, 2, 3, None)[mid % 4],
        )
        assert (decode_tiff(t) == px).all()


def test_exif_build_parse_roundtrip_both_orders():
    from funding_monitoring_spark.operators.tiffcodec import (
        build_exif,
        parse_exif,
    )

    for bo in "<>":
        blk = build_exif(6, "CorpusCam", "M3", "2026:01:05 00:00:42",
                         640, 480, byte_order=bo)
        assert parse_exif(blk) == {
            "make": "CorpusCam", "model": "M3", "orientation": 6,
            "datetime": "2026:01:05 00:00:42",
            "pixel_x": 640, "pixel_y": 480,
        }
    with pytest.raises(ValueError):
        parse_exif(b"JFIF0000")


def test_exif_missing_sub_ifd_fields_are_none():
    from funding_monitoring_spark.operators.tiffcodec import (
        _pack_ifd,
        parse_exif,
    )

    # IFD0 with only Orientation, no Exif pointer
    ifd0 = _pack_ifd("<", [(274, 3, struct.pack("<H", 3), 1)], 8)
    blk = struct.pack("<2sHI", b"II", 42, 8) + ifd0
    got = parse_exif(blk)
    assert got["orientation"] == 3
    assert got["make"] is None and got["pixel_x"] is None


def test_jpeg_app1_inject_extract():
    from funding_monitoring_spark.operators.jpegcodec import (
        encode_baseline_jpeg,
    )
    from funding_monitoring_spark.operators.multimodal import (
        extract_jpeg_exif,
        inject_jpeg_exif,
    )
    from funding_monitoring_spark.operators.tiffcodec import (
        build_exif,
        decode_tiff,
        parse_exif,
    )

    px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    jpeg = encode_baseline_jpeg(px)
    assert extract_jpeg_exif(jpeg) is None  # no APP1 yet
    exif = build_exif(1, "A", "B", "2026:01:01 00:00:00", 4, 4)
    tagged = inject_jpeg_exif(jpeg, exif)
    blk = extract_jpeg_exif(tagged)
    assert blk == exif and parse_exif(blk)["make"] == "A"
    # the tagged JPEG still decodes (APP1 is skippable metadata)
    from funding_monitoring_spark.operators.jpegcodec import (
        decode_baseline_jpeg,
    )

    assert decode_baseline_jpeg(tagged).shape == (4, 4, 3)
    with pytest.raises(ValueError):
        inject_jpeg_exif(b"PK\x03\x04", exif)
    with pytest.raises(ValueError):
        extract_jpeg_exif(tagged[:2] + b"\xff\xe1\x00\x01")


def test_dhash_invariant_under_integer_upscale():
    """The floor-convention dHash resample makes an exact-integer
    nearest-neighbor upscale hash-invariant:
    floor(floor(9*i*k*w/9)/k) == floor(9*i*w/9). The scale-twin
    corpus (image_dhash_near_dup) relies on this being EXACT."""
    import numpy as np

    from funding_monitoring_spark.operators.multimodal import (
        _bmp_dims,
        _bmp_pixels,
    )

    def dhash(px):
        px = px.astype(np.int64)
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
                bits = (bits << 1) | int(gray[y, x] > gray[y, x + 1])
        return bits

    rng = np.random.RandomState(5)
    for mid in range(40):
        w, h = _bmp_dims(mid)
        px = _bmp_pixels(mid, w, h)
        for k in (2, 3, 5):
            up = np.repeat(np.repeat(px, k, axis=0), k, axis=1)
            assert dhash(up) == dhash(px), (mid, k)
        noise = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        up = np.repeat(np.repeat(noise, 2, axis=0), 2, axis=1)
        assert dhash(up) == dhash(noise)
