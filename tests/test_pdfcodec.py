"""Structural PDF parser tests (operators/pdfcodec.py): writer
roundtrips (classic 1.4 AND 1.5 xref/object streams), hand-assembled
foreign shapes the writer does not emit (nested Pages tree, array
/Contents, TJ arrays, multi-subsection and incremental xref, indirect
/Length, hex strings, hybrid /XRefStm, xref-stream /Prev chains), and
loud refusals narrowed to CCITTFax/JBIG2/JPX/Crypt filters,
TIFF Predictor 2, LZW /EarlyChange 0, and encryption (LZW, RunLength,
ASCIIHex, ASCII85, DCT and filter CHAINS now decode)."""

import zlib

import pytest

from funding_monitoring_spark.operators.pdfcodec import (
    _png_predict_up,
    _png_unpredict,
    encode_pdf,
    encode_pdf15,
    parse_pdf,
)


@pytest.mark.parametrize("compress", [False, True])
def test_roundtrip(compress):
    pages = ["hello world", "", "x" * 500,
             "parens (nested (deep)) and \\ backslash",
             "control \x01 and high \xff bytes"]
    info = parse_pdf(encode_pdf(pages, compress=compress))
    assert info.version == "1.4"
    assert info.n_pages == len(pages)
    assert info.page_texts == pages
    assert info.n_objects == 3 + 2 * len(pages)
    assert info.flate_streams == (len(pages) if compress else 0)
    assert info.text == "".join(pages)


def _assemble(objs: dict, version=b"1.4", trailer_extra=b"",
              xref_override=None):
    """Build a classic PDF from {num: body-bytes} with a correct
    xref + trailer."""
    out = bytearray(b"%PDF-" + version + b"\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    size = max(objs) + 1
    out += f"xref\n0 {size}\n".encode() + b"0000000000 65535 f \n"
    for num in range(1, size):
        off = offsets.get(num, 0)
        kind = b"n" if num in offsets else b"f"
        out += f"{off:010d} 00000 ".encode() + kind + b" \n"
    out += (
        b"trailer\n<< /Size " + str(size).encode() + b" /Root 1 0 R "
        + trailer_extra + b">>\nstartxref\n"
        + str(xref_override if xref_override is not None
              else xref_at).encode()
        + b"\n%%EOF\n"
    )
    return bytes(out)


def _stream_obj(body: bytes, extra=b"") -> bytes:
    return (
        b"<< /Length " + str(len(body)).encode() + b" " + extra
        + b">>\nstream\n" + body + b"\nendstream"
    )


def test_nested_pages_tree_and_array_contents():
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [ 3 0 R 6 0 R ] /Count 3 >>",
        # an intermediate Pages node with two leaf pages
        3: b"<< /Type /Pages /Parent 2 0 R /Kids [ 4 0 R 5 0 R ] "
           b"/Count 2 >>",
        4: b"<< /Type /Page /Parent 3 0 R /Contents 7 0 R >>",
        5: b"<< /Type /Page /Parent 3 0 R /Contents [ 8 0 R 9 0 R ] >>",
        6: b"<< /Type /Page /Parent 2 0 R >>",  # no contents
        7: _stream_obj(b"BT (alpha) Tj ET"),
        8: _stream_obj(b"BT (beta-) Tj ET"),
        9: _stream_obj(b"BT (gamma) Tj ET"),
    }
    info = parse_pdf(_assemble(objs))
    assert info.n_pages == 3
    assert info.page_texts == ["alpha", "beta-gamma", ""]


def test_tj_array_and_escapes_and_hex():
    content = (
        b"BT [ (ab) (cd) ] TJ (\\101\\102) Tj "
        b"(line\\nbreak) Tj (esc\\(p\\)) Tj ET"
    )
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: _stream_obj(content),
    }
    info = parse_pdf(_assemble(objs))
    assert info.page_texts == ["abcdABline\nbreakesc(p)"]


def test_indirect_length_and_flate():
    body = zlib.compress(b"BT (zz) Tj ET")
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: b"<< /Length 5 0 R /Filter /FlateDecode >>\nstream\n"
           + body + b"\nendstream",
        5: str(len(body)).encode(),
    }
    info = parse_pdf(_assemble(objs))
    assert info.page_texts == ["zz"] and info.flate_streams == 1


def test_incremental_update_prev_chain():
    """An appended revision overrides object 4 via a second xref
    table chained with /Prev — the newest offset must win."""
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: _stream_obj(b"BT (old) Tj ET"),
    }
    base = _assemble(objs)
    first_xref = base.rindex(b"\nxref\n") + 1  # not inside 'startxref'
    new_body = _stream_obj(b"BT (new) Tj ET")
    out = bytearray(base)
    new_off = len(out)
    out += b"4 0 obj\n" + new_body + b"\nendobj\n"
    second_xref = len(out)
    out += b"xref\n4 1\n" + f"{new_off:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size 5 /Root 1 0 R /Prev "
        + str(first_xref).encode()
        + b" >>\nstartxref\n" + str(second_xref).encode() + b"\n%%EOF\n"
    )
    info = parse_pdf(bytes(out))
    assert info.page_texts == ["new"]


def test_startxref_at_non_xref_object_is_loud():
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [ ] /Count 0 >>",
    }
    pdf = _assemble(objs)
    # point startxref at object 1: not a table, and not /Type /XRef
    off1 = pdf.index(b"1 0 obj")
    doctored = pdf[: pdf.rindex(b"startxref")] + (
        b"startxref\n" + str(off1).encode() + b"\n%%EOF\n"
    )
    with pytest.raises(ValueError, match="XRef"):
        parse_pdf(doctored)


def test_filter_and_parms_refuse():
    body = zlib.compress(b"BT (zz) Tj ET")
    base = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
    }
    objs = dict(base)
    objs[4] = _stream_obj(b"abc", extra=b"/Filter /CCITTFaxDecode ")
    with pytest.raises(NotImplementedError):
        parse_pdf(_assemble(objs))
    # /EarlyChange 0 LZW stays out of profile
    objs = dict(base)
    objs[4] = _stream_obj(
        b"abc",
        extra=b"/Filter /LZWDecode "
              b"/DecodeParms << /EarlyChange 0 >> ",
    )
    with pytest.raises(NotImplementedError, match="EarlyChange"):
        parse_pdf(_assemble(objs))
    # TIFF Predictor 2 stays out of profile (PNG 10-15 now decode)
    objs = dict(base)
    objs[4] = _stream_obj(
        body,
        extra=b"/Filter /FlateDecode "
              b"/DecodeParms << /Predictor 2 >> ",
    )
    with pytest.raises(NotImplementedError, match="Predictor"):
        parse_pdf(_assemble(objs))


def test_encrypt_refuses():
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [ ] /Count 0 >>",
    }
    with pytest.raises(NotImplementedError):
        parse_pdf(_assemble(objs, trailer_extra=b"/Encrypt 9 0 R "))


def test_dangling_ref_and_bad_header_are_loud():
    objs = {
        1: b"<< /Type /Catalog /Pages 9 0 R >>",
        2: b"<< /Type /Pages /Kids [ ] /Count 0 >>",
    }
    with pytest.raises(ValueError):
        parse_pdf(_assemble(objs))
    with pytest.raises(ValueError):
        parse_pdf(b"not a pdf at all")


def test_circular_prev_chain_is_loud():
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [ ] /Count 0 >>",
    }
    pdf = _assemble(objs)
    xref_at = pdf.rindex(b"\nxref\n") + 1
    doctored = pdf.replace(
        b"/Root 1 0 R ",
        b"/Root 1 0 R /Prev " + str(xref_at).encode() + b" ",
    )
    with pytest.raises(ValueError):
        parse_pdf(doctored)


def test_fixture_split_concatenates_exactly():
    from funding_monitoring_spark.operators.multimodal import _pdf_pages

    for text in ["", "a", "abcdefg", "x" * 553]:
        for p in (1, 2, 3):
            parts = _pdf_pages(text, p)
            assert len(parts) == p and "".join(parts) == text


def test_freed_object_does_not_resurrect():
    """An incremental update that FREES an object must shadow the
    older table's in-use entry (review r10): the freed object stays
    unresolvable and n_objects drops. Object 4 here is unreferenced,
    so the parse itself succeeds."""
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R >>",
        4: _stream_obj(b"BT (orphan) Tj ET"),
    }
    base = _assemble(objs)
    first_xref = base.rindex(b"\nxref\n") + 1
    out = bytearray(base)
    second_xref = len(out)
    out += b"xref\n4 1\n" + b"0000000000 65536 f \n"
    out += (
        b"trailer\n<< /Size 5 /Root 1 0 R /Prev "
        + str(first_xref).encode()
        + b" >>\nstartxref\n" + str(second_xref).encode() + b"\n%%EOF\n"
    )
    info = parse_pdf(bytes(out))
    assert info.n_objects == 3  # object 4 freed, not resurrected
    assert info.page_texts == [""]


def test_freed_contents_reference_is_loud():
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: _stream_obj(b"BT (old) Tj ET"),
    }
    base = _assemble(objs)
    first_xref = base.rindex(b"\nxref\n") + 1
    out = bytearray(base)
    second_xref = len(out)
    out += b"xref\n4 1\n" + b"0000000000 65536 f \n"
    out += (
        b"trailer\n<< /Size 5 /Root 1 0 R /Prev "
        + str(first_xref).encode()
        + b" >>\nstartxref\n" + str(second_xref).encode() + b"\n%%EOF\n"
    )
    with pytest.raises(ValueError):
        parse_pdf(bytes(out)).page_texts


def test_hex_string_tj_recovers_text():
    """Hex-string Tj/TJ operands (the common font-encoded form) must
    recover, not silently drop (review r10)."""
    content = b"BT <48656c6c6f> Tj [ <41> (b) <43> ] TJ ET"
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: _stream_obj(content),
    }
    info = parse_pdf(_assemble(objs))
    assert info.page_texts == ["HelloAbC"]


def test_inline_dict_operand_is_skipped():
    content = (
        b"/Span << /MCID 0 >> BDC BT (kept) Tj ET EMC"
    )
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: _stream_obj(content),
    }
    assert parse_pdf(_assemble(objs)).page_texts == ["kept"]


# -- PDF 1.5: xref streams, object streams, predictors --------------------


@pytest.mark.parametrize("compress", [False, True])
def test_roundtrip_pdf15(compress):
    pages = ["modern (xref) stream", "", "page \\3 " + "y" * 300]
    info = parse_pdf(encode_pdf15(pages, compress=compress))
    assert info.version == "1.5"
    assert info.n_pages == len(pages)
    assert info.page_texts == pages
    # 3 tree objects + 2 per page + the ObjStm + the XRef stream
    assert info.n_objects == 3 + 2 * len(pages) + 2
    assert info.flate_streams == (len(pages) if compress else 0)
    assert info.text == "".join(pages)


def test_png_unpredict_inverts_every_filter():
    """Apply each PNG forward filter by hand and check the parser's
    unfilter restores the exact rows (bpp=1, the xref-stream shape)."""
    rows = [bytes([7, 200, 13, 0, 255]), bytes([9, 1, 128, 64, 250]),
            bytes([0, 0, 17, 99, 3])]
    row_len = 5

    def forward(ftype, row, prev):
        out = bytearray([ftype])
        for i, b in enumerate(row):
            a = row[i - 1] if i else 0
            up = prev[i]
            c = prev[i - 1] if i else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (a + up) >> 1
            else:  # Paeth
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (
                    up if pb <= pc else c)
            out.append((b - pred) & 0xFF)
        return bytes(out)

    for ftype in range(5):
        prev = bytes(row_len)
        filtered = bytearray()
        for row in rows:
            filtered += forward(ftype, row, prev)
            prev = row
        got = _png_unpredict(bytes(filtered), columns=row_len)
        assert got == b"".join(rows), f"filter {ftype}"
    # the writer's Up filter round-trips through the same path
    data = b"".join(rows)
    assert _png_unpredict(_png_predict_up(data, row_len),
                          columns=row_len) == data
    with pytest.raises(ValueError, match="filter type"):
        _png_unpredict(bytes([9]) + bytes(row_len), columns=row_len)
    with pytest.raises(ValueError, match="multiple"):
        _png_unpredict(b"\x00abc", columns=row_len)


def _xref_stream_obj(num, entries, size, at, prev=None, extra=b""):
    """Serialize an UNFILTERED xref stream object (W=[1,4,2]):
    entries is [(first, [row...])] with row (type, f2, f3); `at` is
    the byte offset the object will land at (unused in the body but
    kept for call-site clarity)."""
    rows = bytearray()
    index = []
    for first, sub in entries:
        index += [first, len(sub)]
        for t, f2, f3 in sub:
            rows.append(t)
            rows.extend(f2.to_bytes(4, "big"))
            rows.extend(f3.to_bytes(2, "big"))
    head = (
        f"<< /Type /XRef /Size {size} /W [ 1 4 2 ] "
        f"/Index [ {' '.join(map(str, index))} ] /Root 1 0 R "
        + (f"/Prev {prev} " if prev is not None else "")
        + extra.decode()
        + f"/Length {len(rows)} >>"
    ).encode()
    return (
        f"{num} 0 obj\n".encode() + head
        + b"\nstream\n" + bytes(rows) + b"\nendstream\nendobj\n"
    )


def test_hybrid_xrefstm_takes_precedence_over_table():
    """A hybrid-reference file: the classic table's entries for the
    page/content objects are WRONG (bogus offset / freed), the
    /XRefStm carries the real ones — the spec's reading order (stream
    before table) is the only way this file parses."""
    out = bytearray(b"%PDF-1.5\n")
    offsets = {}
    bodies = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: _stream_obj(b"BT (hy) Tj ET")[0:0]  # placeholder
    }
    bodies[4] = _stream_obj(b"BT (hy) Tj ET")
    for n in sorted(bodies):
        offsets[n] = len(out)
        out += f"{n} 0 obj\n".encode() + bodies[n] + b"\nendobj\n"
    stm_at = len(out)
    out += _xref_stream_obj(
        5,
        [(3, [(1, offsets[3], 0), (1, offsets[4], 0)])],
        size=6,
        at=stm_at,
    )
    xref_at = len(out)
    out += b"xref\n0 6\n"
    out += b"0000000000 65535 f \n"
    out += f"{offsets[1]:010d} 00000 n \n".encode()
    out += f"{offsets[2]:010d} 00000 n \n".encode()
    # WRONG: offset of object 3 points at object 4's header
    out += f"{offsets[4]:010d} 00000 n \n".encode()
    # WRONG: object 4 freed
    out += b"0000000000 65535 f \n"
    out += f"{stm_at:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size 6 /Root 1 0 R /XRefStm {stm_at} >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    info = parse_pdf(bytes(out))
    assert info.text == "hy"
    assert info.n_pages == 1


def test_xref_stream_incremental_update_prev_chain():
    """Incremental update of a 1.5 file: a new revision's xref STREAM
    redefines one content object and chains to the original via
    /Prev; the newer entry must win and the text must change."""
    base = bytearray(encode_pdf15(["old", "two"]))
    import re as _re

    m = _re.search(rb"startxref\s+(\d+)\s*%%EOF\s*$", bytes(base))
    old_xref_at = int(m.group(1))
    # page 0's content object is 5 (writer numbering)
    new_body = b"BT (NEW) Tj ET"
    new_obj = (
        b"5 0 obj\n<< /Length " + str(len(new_body)).encode()
        + b" >>\nstream\n" + new_body + b"\nendstream\nendobj\n"
    )
    off5 = len(base)
    base += new_obj
    stm_at = len(base)
    base += _xref_stream_obj(
        10,
        [(5, [(1, off5, 0)]), (10, [(1, stm_at, 0)])],
        size=11,
        at=stm_at,
        prev=old_xref_at,
    )
    base += f"startxref\n{stm_at}\n%%EOF\n".encode()
    info = parse_pdf(bytes(base))
    assert info.page_texts == ["NEW", "two"]
    assert info.n_objects == 10  # 9 original in-use + the new xref stream


def test_objstm_type_mismatch_is_loud():
    """A type-2 xref entry pointing into an object that is not an
    /ObjStm must refuse, not fake-resolve."""
    out = bytearray(b"%PDF-1.5\n")
    offsets = {}
    bodies = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        # object 2 is CLAIMED to live in "object stream 3", but 3 is
        # a plain dict
        3: b"<< /NotAnObjStm true >>",
    }
    for n in sorted(bodies):
        offsets[n] = len(out)
        out += f"{n} 0 obj\n".encode() + bodies[n] + b"\nendobj\n"
    stm_at = len(out)
    out += _xref_stream_obj(
        4,
        [(1, [(1, offsets[1], 0), (2, 3, 0), (1, offsets[3], 0),
              (1, stm_at, 0)])],
        size=5,
        at=stm_at,
    )
    out += f"startxref\n{stm_at}\n%%EOF\n".encode()
    with pytest.raises(ValueError, match="ObjStm"):
        parse_pdf(bytes(out))


# -- widened /Filter surface (LZW, RunLength, ASCIIHex, ASCII85, DCT,
# chains) — each page of the fixture takes a different filter so one
# roundtrip covers the whole dispatch table -------------------------------


def test_filter_menagerie_roundtrip():
    """Every supported single filter and a two-step chain, one per
    page, written by encode_pdf's own filter writers and recovered by
    the parser's chained dispatch."""
    pages = [
        "plain page zero",
        "flate page one",
        "lzw page two with some repetition repetition repetition",
        "runlength page three aaaaaaaaaaaaaaaaaaaaaabbbbbbbbbbbbcc",
        "asciihex page four",
        "ascii85 page five",
        "chained page six: ascii85 over flate",
        "chained page seven: hex over lzw",
    ]
    page_filters = [
        [],
        ["FlateDecode"],
        ["LZWDecode"],
        ["RunLengthDecode"],
        ["ASCIIHexDecode"],
        ["ASCII85Decode"],
        ["ASCII85Decode", "FlateDecode"],
        ["ASCIIHexDecode", "LZWDecode"],
    ]
    pdf = encode_pdf(pages, page_filters=page_filters)
    info = parse_pdf(pdf)
    assert info.page_texts == pages
    assert info.n_pages == len(pages)


def test_runlength_eod_and_truncation():
    from funding_monitoring_spark.operators.pdfcodec import (
        _runlength_decode,
        _runlength_encode,
    )

    data = b"abc" + b"x" * 40 + b"tail"
    enc = _runlength_encode(data)
    assert enc.endswith(b"\x80")
    assert _runlength_decode(enc) == data
    # bytes after EOD are ignored (the spec allows padding)
    assert _runlength_decode(enc + b"junk") == data
    with pytest.raises(ValueError, match="EOD"):
        _runlength_decode(enc[:-1])


def test_asciihex_odd_digit_and_whitespace():
    from funding_monitoring_spark.operators.pdfcodec import (
        _asciihex_decode,
    )

    assert _asciihex_decode(b"48 65 6c\n6c 6f>") == b"Hello"
    # odd trailing digit implies a final 0 nibble
    assert _asciihex_decode(b"7>") == b"\x70"
    with pytest.raises(ValueError, match="EOD"):
        _asciihex_decode(b"4865")
    with pytest.raises(ValueError, match="invalid"):
        _asciihex_decode(b"4g>")


def test_ascii85_z_shortcut_and_partial_group():
    from funding_monitoring_spark.operators.pdfcodec import (
        _ascii85_decode,
    )

    import base64

    payload = b"\x00\x00\x00\x00tail"
    body = base64.a85encode(payload, adobe=True)[2:]  # strip '<~'
    assert b"z" in body  # the zero-group shortcut is exercised
    assert _ascii85_decode(body) == payload
    with pytest.raises(ValueError, match="EOD"):
        _ascii85_decode(b"abcd")


def test_dctdecode_routes_to_jpegcodec():
    """A DCTDecode image XObject decodes to exactly the samples
    jpegcodec's standalone decoder produces for the same payload."""
    import numpy as np

    from funding_monitoring_spark.operators.jpegcodec import (
        decode_baseline_jpeg,
        encode_baseline_jpeg,
    )

    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
    jpg = encode_baseline_jpeg(px, quality=90)
    want = decode_baseline_jpeg(jpg)

    # hand-assemble a single-page PDF whose /Contents is fine but
    # which carries the JPEG as object 5; parse resolves + decodes it
    body = b"BT (t) Tj ET"
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: b"<< /Length " + str(len(body)).encode() + b" >>\nstream\n"
           + body + b"\nendstream",
        5: b"<< /Subtype /Image /Length " + str(len(jpg)).encode()
           + b" /Filter /DCTDecode >>\nstream\n" + jpg
           + b"\nendstream",
    }
    pdf = _assemble(objs)
    info = parse_pdf(pdf)
    assert info.page_texts == ["t"]
    # decode the image object directly through the filter dispatch
    from funding_monitoring_spark.operators.pdfcodec import (
        _apply_stream_filter,
    )

    got = np.frombuffer(
        _apply_stream_filter("DCTDecode", jpg, None, lambda x: x),
        dtype=np.uint8,
    ).reshape(want.shape)
    assert np.array_equal(got, want)


def test_indirect_filter_reference_resolves():
    """/Filter supplied as an indirect reference (legal PDF) must be
    resolved, not silently ignored (ADVICE r12: the ignore path
    returned still-encoded bytes as decoded content)."""
    body = zlib.compress(b"BT (ind) Tj ET")
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: b"<< /Length " + str(len(body)).encode()
           + b" /Filter 5 0 R >>\nstream\n" + body + b"\nendstream",
        5: b"/FlateDecode",
    }
    info = parse_pdf(_assemble(objs))
    assert info.page_texts == ["ind"] and info.flate_streams == 1


def test_non_name_filter_entry_is_loud():
    """A /Filter whose value (or array element) is not a name must
    refuse loudly, never fall through to returning raw bytes."""
    base = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
    }
    objs = dict(base)
    objs[4] = _stream_obj(b"abc", extra=b"/Filter 7 ")
    with pytest.raises(NotImplementedError, match="Filter"):
        parse_pdf(_assemble(objs))
    objs = dict(base)
    objs[4] = _stream_obj(b"abc", extra=b"/Filter [ /FlateDecode 7 ] ")
    with pytest.raises(NotImplementedError, match="Filter"):
        parse_pdf(_assemble(objs))
