"""Container codec tests (operators/containers.py): WARC framing,
ZIP central-directory walk and ustar headers — each roundtripped AND
cross-validated against an independent implementation (stdlib
zipfile/tarfile, both directions), plus loud refusals."""

import io
import struct
import tarfile
import zipfile
import zlib

import pytest

from funding_monitoring_spark.operators.containers import (
    encode_tar,
    encode_warc,
    encode_zip,
    gunzip_members,
    gzip_bytes,
    parse_tar,
    parse_warc,
    parse_zip,
)


# -- gzip members -------------------------------------------------------------


def test_gunzip_concatenated_members():
    a, b = gzip_bytes(b"alpha"), gzip_bytes(b"beta")
    assert gunzip_members(a + b) == [b"alpha", b"beta"]
    with pytest.raises(ValueError):
        gunzip_members(a[:-2])


# -- WARC ----------------------------------------------------------------------

_RECS = [
    ("warcinfo", {"Content-Type": "application/warc-fields"},
     b"software: x\r\n"),
    ("response", {"WARC-Target-URI": "http://a/b"},
     b"HTTP/1.1 200 OK\r\n\r\nbody bytes"),
]


@pytest.mark.parametrize("gz", [False, True])
def test_warc_roundtrip(gz):
    back = parse_warc(encode_warc(_RECS, per_record_gzip=gz))
    assert [(t, p) for t, _, p in back] == [(t, p) for t, _, p in _RECS]
    assert back[1][1]["WARC-Target-URI"] == "http://a/b"


def test_warc_payload_may_contain_crlf_crlf():
    recs = [("resource", {}, b"a\r\n\r\nb\r\n\r\nc")]
    back = parse_warc(encode_warc(recs))
    assert back[0][2] == b"a\r\n\r\nb\r\n\r\nc"


def test_warc_framing_refusals():
    good = encode_warc(_RECS)
    with pytest.raises(ValueError):
        parse_warc(good[:-3])  # separator clipped
    with pytest.raises(ValueError):
        parse_warc(b"NOT-A-WARC\r\n")
    with pytest.raises(NotImplementedError):
        parse_warc(good.replace(b"WARC/1.0", b"WARC/0.9", 1))
    # Content-Length is mandatory framing
    doctored = good.replace(b"Content-Length", b"Content-Lies", 1)
    with pytest.raises(ValueError):
        parse_warc(doctored)


# -- ZIP -----------------------------------------------------------------------

_MEMBERS = [
    ("doc.txt", b"hello world" * 30, True),
    ("meta.json", b'{"a":1}', False),
    ("empty.bin", b"", True),
]


def test_zip_roundtrip_and_crc():
    back = parse_zip(encode_zip(_MEMBERS))
    assert [(m["name"], m["data"], m["method"]) for m in back] == [
        ("doc.txt", b"hello world" * 30, 8),
        ("meta.json", b'{"a":1}', 0),
        ("empty.bin", b"", 8),
    ]
    assert all(m["crc_ok"] for m in back)


def test_zip_stdlib_reads_ours():
    zf = zipfile.ZipFile(io.BytesIO(encode_zip(_MEMBERS)))
    assert zf.testzip() is None
    assert zf.read("doc.txt") == b"hello world" * 30
    assert zf.read("meta.json") == b'{"a":1}'


def test_zip_we_read_stdlibs():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("x/a.txt", b"alpha" * 100)
        zf.writestr("b.bin", bytes(range(256)))
    back = parse_zip(buf.getvalue())
    assert back[0]["name"] == "x/a.txt"
    assert back[0]["data"] == b"alpha" * 100
    assert back[1]["data"] == bytes(range(256))
    assert all(m["crc_ok"] for m in back)


def test_zip_crc_corruption_detected():
    z = bytearray(encode_zip([("a", b"payload-bytes", False)]))
    at = z.index(b"payload-bytes")
    z[at] ^= 0xFF
    back = parse_zip(bytes(z))
    assert back[0]["crc_ok"] is False


def test_zip_refusals():
    with pytest.raises(ValueError):
        parse_zip(b"PK\x03\x04 but no directory")
    z = bytearray(encode_zip([("a", b"xy", True)]))
    # flip the central-directory method to 99 (unsupported)
    at = z.index(struct.pack("<I", 0x02014B50))
    method_at = at + 10
    z[method_at : method_at + 2] = struct.pack("<H", 99)
    with pytest.raises(NotImplementedError):
        parse_zip(bytes(z))
    # set the encryption flag
    z = bytearray(encode_zip([("a", b"xy", True)]))
    at = z.index(struct.pack("<I", 0x02014B50))
    z[at + 8 : at + 10] = struct.pack("<H", 1)
    with pytest.raises(NotImplementedError):
        parse_zip(bytes(z))


def test_zip64_roundtrip_and_stdlib_interop():
    """force_zip64 writes real zip64 structures (EOCD64 + locator,
    0x0001 extras) in a small archive; our parser and the stdlib both
    read it, and the members round-trip exactly."""
    import io
    import zipfile

    members = [("a.txt", b"hello zip64", False),
               ("b/c.bin", bytes(range(256)) * 10, True)]
    z = encode_zip(members, force_zip64=True)
    got = parse_zip(z)
    assert [(m["name"], m["data"]) for m in got] == [
        (n, d) for n, d, _ in members
    ]
    assert all(m["crc_ok"] for m in got)
    with zipfile.ZipFile(io.BytesIO(z)) as zf:
        assert zf.read("a.txt") == b"hello zip64"
        assert zf.read("b/c.bin") == bytes(range(256)) * 10
    # zip64 sentinels WITHOUT the locator refuse loudly
    eocd_at = z.rindex(struct.pack("<I", 0x06054B50))
    doctored = z[:eocd_at - 20] + z[eocd_at:]
    with pytest.raises(ValueError, match="locator"):
        parse_zip(doctored)


def test_zip_eocd_comment_containing_signature():
    """A trailing archive comment that embeds the 4-byte EOCD
    signature must not mis-anchor the parse: only a candidate whose
    comment length reaches exactly end-of-file is the real record."""
    z = bytearray(encode_zip([("a", b"payload", False)]))
    # append a comment containing a fake EOCD signature + junk that
    # would parse as garbage counts if picked
    comment = b"xx" + struct.pack("<I", 0x06054B50) + b"\x00" * 16
    z[-2:] = struct.pack("<H", len(comment))
    z += comment
    got = parse_zip(bytes(z))
    assert [m["name"] for m in got] == ["a"]
    assert got[0]["data"] == b"payload"


# -- TAR -----------------------------------------------------------------------


@pytest.mark.parametrize("gz", [False, True])
def test_tar_roundtrip(gz):
    t = encode_tar(
        [("a.txt", b"AAA"), ("big.bin", bytes(1000))], gzip_whole=gz
    )
    back = parse_tar(t)
    assert [(m["name"], m["data"]) for m in back] == [
        ("a.txt", b"AAA"), ("big.bin", bytes(1000))
    ]


def test_tar_stdlib_reads_ours():
    tf = tarfile.open(fileobj=io.BytesIO(encode_tar([("a.txt", b"AAA")])))
    assert tf.extractfile("a.txt").read() == b"AAA"


def test_tar_we_read_stdlibs():
    buf = io.BytesIO()
    data = b"ZZZZ" * 200
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.USTAR_FORMAT) as tf:
        ti = tarfile.TarInfo("z.txt")
        ti.size = len(data)
        tf.addfile(ti, io.BytesIO(data))
    back = parse_tar(buf.getvalue())
    assert back[0]["name"] == "z.txt" and back[0]["data"] == data


def test_tar_checksum_and_magic_refusals():
    t = bytearray(encode_tar([("a.txt", b"AAA")]))
    t[0] ^= 0x01  # name byte flips -> checksum mismatch
    with pytest.raises(ValueError):
        parse_tar(bytes(t))
    t2 = bytearray(encode_tar([("a.txt", b"AAA")]))
    t2[257:262] = b"wrong"
    with pytest.raises(NotImplementedError):
        parse_tar(bytes(t2))
    # symlink type refuses
    t3 = bytearray(encode_tar([("a.txt", b"AAA")]))
    t3[156] = ord("2")
    # re-stamp the checksum so the type flag is what refuses
    hdr = bytearray(t3[:512])
    hdr[148:156] = b" " * 8
    t3[148:156] = f"{sum(hdr):06o}".encode() + b"\x00 "
    with pytest.raises(NotImplementedError):
        parse_tar(bytes(t3))


def test_tar_gz_garbage_members_still_fail_loudly():
    """Multi-member gzip now CONCATENATES (pigz-style archives), so
    garbage members must fail at the tar layer, not silently parse."""
    two = gzip_bytes(b"a") + gzip_bytes(b"b")
    with pytest.raises((ValueError, NotImplementedError)):
        parse_tar(two)


def test_warc_framing_fields_win_over_extras():
    """A caller-supplied Content-Length must not corrupt the framing
    (review r10): the computed value wins."""
    recs = [("response", {"Content-Length": "10"}, b"twenty byte payload!")]
    back = parse_warc(encode_warc(recs))
    assert back[0][2] == b"twenty byte payload!"
    assert back[0][1]["Content-Length"] == "20"


def test_tar_pax_long_names_roundtrip_and_stdlib_interop():
    """Names past 100 bytes travel as pax 'x' records: our writer
    emits them, our parser applies them, and stdlib tarfile agrees in
    both directions."""
    import io
    import tarfile

    from funding_monitoring_spark.operators.containers import (
        encode_tar,
        parse_tar,
    )

    long_name = "deep/" * 30 + "file.txt"  # 158 bytes
    members = [(long_name, b"long-name payload"), ("short", b"s")]
    t = encode_tar(members)
    got = parse_tar(t)
    assert [(m["name"], m["data"]) for m in got] == members
    with tarfile.open(fileobj=io.BytesIO(t)) as tf:
        assert tf.extractfile(long_name).read() == b"long-name payload"

    # stdlib pax output parses back (includes an 'x' record per file)
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.PAX_FORMAT) as tf:
        info = tarfile.TarInfo(long_name)
        data = b"stdlib pax body"
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))
    got = parse_tar(buf.getvalue())
    assert got == [{"name": long_name, "size": len(data), "data": data}]


def test_tar_gnu_longname_prefix_dirs_and_base256():
    """Hand-built foreign shapes: GNU 'L' longname records, the ustar
    prefix field, directory entries (skipped), and a base-256 size
    field all parse; link types still refuse."""
    import io
    import tarfile

    from funding_monitoring_spark.operators.containers import (
        _tar_header,
        parse_tar,
    )

    # GNU longname via stdlib GNU format
    long_name = "gnu/" * 40 + "x.bin"
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.GNU_FORMAT) as tf:
        info = tarfile.TarInfo(long_name)
        info.size = 3
        tf.addfile(info, io.BytesIO(b"abc"))
        d = tarfile.TarInfo("some/dir")
        d.type = tarfile.DIRTYPE
        tf.addfile(d)
        short = tarfile.TarInfo("plain")
        short.size = 2
        tf.addfile(short, io.BytesIO(b"hi"))
    got = parse_tar(buf.getvalue())
    assert [(m["name"], m["data"]) for m in got] == [
        (long_name, b"abc"), ("plain", b"hi")
    ]

    # ustar prefix field: stdlib USTAR format splits long paths
    buf = io.BytesIO()
    split_name = "p" * 120 + "/leaf"
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.USTAR_FORMAT) as tf:
        info = tarfile.TarInfo(split_name)
        info.size = 1
        tf.addfile(info, io.BytesIO(b"z"))
    got = parse_tar(buf.getvalue())
    assert got[0]["name"] == split_name and got[0]["data"] == b"z"

    # base-256 size field (GNU binary form) on a small member
    header = bytearray(_tar_header(b"b256", 0, "0"))
    size_field = bytearray(12)
    size_field[0] = 0x80
    size_field[-1] = 5
    header[124:136] = size_field
    header[148:156] = b" " * 8
    chks = sum(header)
    header[148:156] = f"{chks:06o}".encode() + b"\x00 "
    raw = bytes(header) + b"12345" + b"\x00" * 507 + b"\x00" * 1024
    got = parse_tar(raw)
    assert got == [{"name": "b256", "size": 5, "data": b"12345"}]

    # symlink type still refuses
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.USTAR_FORMAT) as tf:
        ln = tarfile.TarInfo("a-link")
        ln.type = tarfile.SYMTYPE
        ln.linkname = "target"
        tf.addfile(ln)
    with pytest.raises(NotImplementedError, match="type"):
        parse_tar(buf.getvalue())


def test_tar_bz2_and_xz_wrappers():
    """Whole-stream bz2 and xz tar wrappers (the .tar.bz2/.tar.xz
    dump flavors) decode through the same walker."""
    import bz2
    import lzma

    from funding_monitoring_spark.operators.containers import (
        encode_tar,
        parse_tar,
    )

    t = encode_tar([("a.txt", b"alpha"), ("b.txt", b"beta")])
    want = [("a.txt", b"alpha"), ("b.txt", b"beta")]
    for wrapped in (bz2.compress(t), lzma.compress(t)):
        got = parse_tar(wrapped)
        assert [(m["name"], m["data"]) for m in got] == want


def test_docx_build_and_extract_escaping_edges():
    """The DOCX composition must survive XML-hostile text (&, <, >,
    quotes), preserve paragraph splits exactly, and produce a package
    stdlib zipfile can open with a parseable document part."""
    import io
    import xml.etree.ElementTree as ET
    import zipfile

    from funding_monitoring_spark.suites.container_suite import (
        build_docx,
        extract_docx_text,
    )

    text = 'a & b < c > "d"\nsecond <tag> line\n\ntail'
    payload = build_docx(text)
    n_members, paras = extract_docx_text(payload)
    assert n_members == 3
    assert "\n".join(paras) == text
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        doc = zf.read("word/document.xml")
    ET.fromstring(doc.decode("utf-8"))  # well-formed XML

    with pytest.raises(ValueError, match="document.xml"):
        from funding_monitoring_spark.operators.containers import (
            encode_zip,
        )

        extract_docx_text(encode_zip([("other.txt", b"x", False)]))


def test_tar_gz_multi_member_concatenates():
    """pigz-style .tar.gz splits the stream across several gzip
    members; RFC 1952 says members concatenate, so the walker must
    join them rather than refuse."""
    from funding_monitoring_spark.operators.containers import (
        encode_tar,
        gzip_bytes,
        parse_tar,
    )

    t = encode_tar([("a", b"one"), ("b", b"two")])
    mid = len(t) // 2
    multi = gzip_bytes(t[:mid]) + gzip_bytes(t[mid:])
    got = parse_tar(multi)
    assert [(m["name"], m["data"]) for m in got] == [
        ("a", b"one"), ("b", b"two")
    ]


def test_tar_pax_name_truncated_mid_multibyte_char():
    """A >100-byte UTF-8 name whose 100-byte header truncation falls
    MID-multibyte-char must still parse: the pax 'path' override
    carries the real name, so the parser must not strict-decode the
    truncated header field first (it is not valid UTF-8 on its own)."""
    from funding_monitoring_spark.operators.containers import (
        encode_tar,
        parse_tar,
    )

    # 99 ASCII chars then a 2-byte char: nm[:100] ends with the lead
    # byte of 'é' — invalid standalone UTF-8.
    name = "a" * 99 + "é" + "tail.txt"
    assert len(name.encode("utf-8")) > 100
    t = encode_tar([(name, b"payload")])
    got = parse_tar(t)
    assert [(m["name"], m["data"]) for m in got] == [(name, b"payload")]


def test_xlsx_build_and_extract_roundtrip():
    """The XLSX composition must: dedupe repeated lines into one
    shared-string entry, indirect t="s" cells through the table,
    resolve the worksheet via the workbook rels, sum the numeric
    column, survive XML-hostile text, and produce a package stdlib
    zipfile can open."""
    import io
    import xml.etree.ElementTree as ET
    import zipfile

    from funding_monitoring_spark.suites.container_suite import (
        build_xlsx,
        extract_xlsx_text,
    )

    text = 'a & b < c > "d"\nrepeat me\nrepeat me\n\nrepeat me'
    payload = build_xlsx(text)
    n_members, rows, n_unique, numeric_sum = extract_xlsx_text(payload)
    assert n_members == 6
    assert "\n".join(rows) == text
    # 5 lines, 3 unique ('a & b...', 'repeat me', '')
    assert n_unique == 3
    assert numeric_sum == sum(len(ln) for ln in text.split("\n"))
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        for part in (
            "xl/workbook.xml",
            "xl/worksheets/sheet1.xml",
            "xl/sharedStrings.xml",
        ):
            ET.fromstring(zf.read(part).decode("utf-8"))
        # the sst really is deduplicated on the wire
        sst = zf.read("xl/sharedStrings.xml").decode("utf-8")
        assert 'uniqueCount="3"' in sst
        assert sst.count("repeat me") == 1


def test_xlsx_refusals_are_loud():
    """Legacy binary .xls / encrypted workbooks (OLE2 magic) refuse;
    so do a missing workbook part, a dangling sheet relationship,
    an out-of-range shared-string index, and an unsupported cell
    type — never silent wrong output."""
    from funding_monitoring_spark.operators.containers import encode_zip
    from funding_monitoring_spark.suites.container_suite import (
        _OLE2_MAGIC,
        build_xlsx,
        extract_xlsx_text,
    )

    with pytest.raises(NotImplementedError, match="OLE2"):
        extract_xlsx_text(_OLE2_MAGIC + b"\x00" * 64)
    with pytest.raises(ValueError, match="workbook.xml"):
        extract_xlsx_text(encode_zip([("other.txt", b"x", False)]))

    # surgically corrupt a valid package: point the sst index past
    # the table
    import io
    import zipfile

    payload = build_xlsx("one\ntwo")
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        parts = {n: zf.read(n) for n in zf.namelist()}
    bad_sheet = parts["xl/worksheets/sheet1.xml"].replace(
        b"<v>1</v>", b"<v>99</v>"
    )
    members = [
        (n, bad_sheet if n == "xl/worksheets/sheet1.xml" else d, False)
        for n, d in parts.items()
    ]
    with pytest.raises(ValueError, match="out of range"):
        extract_xlsx_text(encode_zip(members))

    bad_type = parts["xl/worksheets/sheet1.xml"].replace(
        b't="s"', b't="e"', 1
    )
    members = [
        (n, bad_type if n == "xl/worksheets/sheet1.xml" else d, False)
        for n, d in parts.items()
    ]
    with pytest.raises(NotImplementedError, match="cell type"):
        extract_xlsx_text(encode_zip(members))


def test_pptx_build_extract_and_rels_order():
    """PPTX slides must come back in sldIdLst->rels order (not member
    order): reversing the rels targets while keeping member names
    reorders the recovered text, proving the reader resolves the
    relationship chain."""
    import io
    import zipfile

    from funding_monitoring_spark.operators.containers import encode_zip
    from funding_monitoring_spark.suites.container_suite import (
        build_pptx,
        extract_pptx_text,
    )

    text = "alpha\nbeta\ngamma"
    payload = build_pptx(text)
    n_members, slides = extract_pptx_text(payload)
    assert n_members == 4 + 3
    assert "\n".join(slides) == text

    # swap rId1<->rId3 targets in the rels part: same members, same
    # sldIdLst — recovered order must follow the rels
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        parts = {n: zf.read(n) for n in zf.namelist()}
    rels = parts["ppt/_rels/presentation.xml.rels"]
    swapped = (
        rels.replace(b"slides/slide1.xml", b"slides/slideX.xml")
        .replace(b"slides/slide3.xml", b"slides/slide1.xml")
        .replace(b"slides/slideX.xml", b"slides/slide3.xml")
    )
    members = [
        (n, swapped if n == "ppt/_rels/presentation.xml.rels" else d,
         False)
        for n, d in parts.items()
    ]
    _, slides2 = extract_pptx_text(encode_zip(members))
    assert slides2 == ["gamma", "beta", "alpha"]


def test_pptx_refusals_are_loud():
    from funding_monitoring_spark.operators.containers import encode_zip
    from funding_monitoring_spark.suites.container_suite import (
        _OLE2_MAGIC,
        build_pptx,
        extract_pptx_text,
    )

    with pytest.raises(NotImplementedError, match="OLE2"):
        extract_pptx_text(_OLE2_MAGIC + b"\x00" * 64)
    with pytest.raises(ValueError, match="presentation.xml"):
        extract_pptx_text(encode_zip([("other.txt", b"x", False)]))

    # dangling slide relationship: drop rId2 from the rels
    import io
    import zipfile

    payload = build_pptx("a\nb")
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        parts = {n: zf.read(n) for n in zf.namelist()}
    rels = parts["ppt/_rels/presentation.xml.rels"].decode()
    at = rels.index('<Relationship Id="rId2"')
    end = rels.index("/>", at) + 2
    members = [
        (n, (rels[:at] + rels[end:]).encode()
         if n == "ppt/_rels/presentation.xml.rels" else d, False)
        for n, d in parts.items()
    ]
    with pytest.raises(ValueError, match="rId2"):
        extract_pptx_text(encode_zip(members))
