"""operators/mailcodec.py: the hand-rolled RFC 5322/2045/2046/2047
implementation must roundtrip its own output AND agree with the
stdlib ``email`` package in both directions — stdlib parses our wire
bytes to the same text, and our parser reads a stdlib-generated
message — so the wire layout is pinned by an independent
implementation (the same discipline as ZIP/TAR vs zipfile/tarfile)."""

from __future__ import annotations

import email
import email.header
import random

import pytest

from funding_monitoring_spark.operators.mailcodec import (
    build_eml,
    decode_word,
    encode_word,
    parse_eml,
    qp_decode,
    qp_encode,
)


def _rand_text(rng, n_lines):
    words = "alpha beta gamma delta epsilon zeta eta theta".split()
    return "\n".join(
        " ".join(rng.choice(words) for _ in range(rng.randint(0, 30)))
        for _ in range(n_lines)
    )


def test_qp_roundtrip_and_stdlib_agreement():
    import quopri

    rng = random.Random(59)
    cases = [
        "",
        "a",
        "x" * 200,
        "line one\nline two\n",
        "trailing space \nand tab\t\nend",
        "equals = signs == everywhere=",
        "unicode: é ﬁ 中",
        _rand_text(rng, 5),
    ]
    for s in cases:
        enc = qp_encode(s)
        assert qp_decode(enc) == s, repr(s)
        # stdlib decodes our encoding to the same bytes
        assert quopri.decodestring(enc) == s.replace(
            "\n", "\r\n"
        ).encode("utf-8"), repr(s)
        # transport discipline: no line longer than 76 chars
        assert all(len(ln) <= 76 for ln in enc.split(b"\r\n"))


def test_qp_malformed_raises():
    with pytest.raises(ValueError, match="truncated"):
        qp_decode(b"abc=A")
    with pytest.raises(ValueError, match="malformed"):
        qp_decode(b"abc=ZZdef")


def test_encoded_word_roundtrip_and_stdlib():
    for enc in ("B", "Q"):
        for s in ("doc 42 web", "spaces and ?= specials", "héllo"):
            tok = encode_word(s, enc)
            assert decode_word(tok) == s
            ((got, charset),) = email.header.decode_header(tok)
            assert got.decode(charset or "ascii") == s
    with pytest.raises(NotImplementedError):
        encode_word("x", "X")
    with pytest.raises(NotImplementedError):
        decode_word("=?latin-9?B?eA==?=")


def test_build_parse_roundtrip():
    rng = random.Random(61)
    for trial in range(10):
        body = _rand_text(rng, rng.randint(1, 6))
        att = bytes(
            rng.randrange(256) for _ in range(rng.randint(0, 80))
        )
        subj = f"doc {trial} corpus/web"
        raw = build_eml(f"m{trial}", subj, body, att)
        msg = parse_eml(raw)
        assert msg["subject"] == subj
        assert len(msg["parts"]) == 2
        assert msg["parts"][0]["type"] == "text/plain"
        assert msg["parts"][0]["text"] == body
        assert msg["parts"][1]["type"] == "application/octet-stream"
        assert msg["parts"][1]["data"] == att


def test_stdlib_parses_our_wire_bytes():
    body = "first line\nsecond = line\n" + "w" * 150
    att = bytes(range(64))
    raw = build_eml("x1", "subject here", body, att)
    msg = email.message_from_bytes(raw)
    assert msg.is_multipart()
    p1, p2 = msg.get_payload()
    assert p1.get_payload(decode=True) == body.replace(
        "\n", "\r\n"
    ).encode("utf-8")
    assert p2.get_payload(decode=True) == att
    ((subj, cs),) = email.header.decode_header(msg["Subject"])
    assert subj.decode(cs) == "subject here"


def test_our_parser_reads_stdlib_message():
    from email.mime.application import MIMEApplication
    from email.mime.multipart import MIMEMultipart
    from email.mime.text import MIMEText

    body = "stdlib body\nwith two lines"
    att = b"\x00\x01binary\xff"
    m = MIMEMultipart()
    m["Subject"] = "plain subject"
    m["From"] = "a@example.invalid"
    m["To"] = "b@example.invalid"
    m.attach(MIMEText(body, "plain", "utf-8"))
    m.attach(MIMEApplication(att))
    raw = m.as_bytes().replace(b"\n", b"\r\n")
    got = parse_eml(raw)
    assert got["subject"] == "plain subject"
    texts = [p["text"] for p in got["parts"] if p["text"] is not None]
    datas = [p["data"] for p in got["parts"] if p["data"] is not None]
    assert texts == [body]
    assert datas == [att]


def test_nested_multipart_flattens_in_order():
    inner_body = "inner text"
    att = b"abc123"
    inner = build_eml("i1", "inner", inner_body, att)
    # graft the inner message's multipart body as a nested part
    head, _, payload = inner.partition(b"\r\n\r\n")
    ct = [
        ln
        for ln in head.split(b"\r\n")
        if ln.lower().startswith(b"content-type")
    ][0]
    outer = (
        b"From: x@example.invalid\r\n"
        b"Content-Type: multipart/mixed; boundary=\"outer\"\r\n"
        b"\r\n"
        b"--outer\r\n"
        + ct
        + b"\r\n\r\n"
        + payload.rstrip(b"\r\n")
        + b"\r\n--outer\r\n"
        b"Content-Type: text/plain\r\n\r\ntail part\r\n"
        b"--outer--\r\n"
    )
    got = parse_eml(outer)
    assert [p["text"] for p in got["parts"]] == [
        inner_body,
        None,
        "tail part",
    ]
    assert got["parts"][1]["data"] == att


def test_refusals():
    raw = build_eml("r1", "s", "body", b"x")
    broken = raw.replace(b"quoted-printable", b"x-uuencode")
    with pytest.raises(NotImplementedError, match="x-uuencode"):
        parse_eml(broken)
    with pytest.raises(ValueError, match="never closed"):
        parse_eml(raw.replace(b"=_part_r1--", b"=_part_r1xx"))
    with pytest.raises(ValueError, match="separator"):
        parse_eml(b"No-Separator: here")
