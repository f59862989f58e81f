"""Structural PDF parser tests (operators/pdfcodec.py): writer
roundtrips, hand-assembled foreign shapes the writer does not emit
(nested Pages tree, array /Contents, TJ arrays, multi-subsection and
incremental xref, indirect /Length, hex strings), and loud refusals
(xref streams, non-Flate filters, predictors, encryption)."""

import zlib

import pytest

from funding_monitoring_spark.operators.pdfcodec import (
    encode_pdf,
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


def test_xref_stream_refuses():
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [ ] /Count 0 >>",
    }
    pdf = _assemble(objs)
    # point startxref at object 1 instead of the table
    off1 = pdf.index(b"1 0 obj")
    doctored = pdf[: pdf.rindex(b"startxref")] + (
        b"startxref\n" + str(off1).encode() + b"\n%%EOF\n"
    )
    with pytest.raises(NotImplementedError):
        parse_pdf(doctored)


def test_filter_and_parms_refuse():
    body = zlib.compress(b"BT (zz) Tj ET")
    base = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
    }
    objs = dict(base)
    objs[4] = _stream_obj(b"abc", extra=b"/Filter /ASCII85Decode ")
    with pytest.raises(NotImplementedError):
        parse_pdf(_assemble(objs))
    objs = dict(base)
    objs[4] = _stream_obj(
        body,
        extra=b"/Filter /FlateDecode "
              b"/DecodeParms << /Predictor 12 >> ",
    )
    with pytest.raises(NotImplementedError):
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
