"""RFC 5322 / MIME mail codec (pure Python, wire-format exact).

Mail archives (mbox dumps, .eml exports, list-server spools) are a
standing slice of any crawl-scale lake estate, and their text payload
is locked behind three layers a distributed extractor must really
parse: folded headers (RFC 5322 §2.2.3), RFC 2047 encoded-words in
header values, and MIME multipart framing with per-part
Content-Transfer-Encoding (quoted-printable / base64, RFC 2045).
This module implements both directions by hand — the same
write-then-read discipline as operators/containers.py (ZIP/TAR/WARC):
the builder emits real wire bytes, the parser walks them structurally,
and tests/test_mailcodec.py cross-validates BOTH against the stdlib
``email`` package so the wire layout is pinned by an independent
implementation, not just our own twin.

Refuse-loudly policy (repo standard): transfer encodings other than
7bit/8bit/quoted-printable/base64, non-multipart framing claiming a
boundary, encoded-words in charsets other than utf-8/ascii or with
encodings other than B/Q, and malformed QP escapes all raise
NotImplementedError/ValueError rather than degrading to garbage text.

Scale shape: per-message parse is a bounded linear scan; the suite
query runs it 1:1 inside Arrow-batched mapInPandas — embarrassingly
parallel, no shuffle at any corpus size.
"""

from __future__ import annotations

import base64
import binascii

CRLF = b"\r\n"
_QP_LINE_MAX = 76


# -- quoted-printable (RFC 2045 §6.7) --------------------------------------


def qp_encode(text: str) -> bytes:
    """Quoted-printable encode ``text``: '\\n' becomes a CRLF hard
    break, '=' and non-printable/non-ASCII bytes become =XX, and
    lines longer than 76 chars gain soft breaks ('=' CRLF). Trailing
    spaces/tabs on a line are escaped (transport may strip them)."""
    out: list[bytes] = []
    for line in text.split("\n"):
        raw = line.encode("utf-8")
        enc: list[str] = []
        for b in raw:
            ch = chr(b)
            if b in (0x3D,) or b < 0x20 or b > 0x7E:  # '=' / ctrl / 8-bit
                enc.append(f"={b:02X}")
            else:
                enc.append(ch)
        # escape trailing whitespace
        if enc and enc[-1] in (" ", "\t"):
            enc[-1] = f"={ord(enc[-1]):02X}"
        # soft-break into <=76-char transport lines
        buf = ""
        pieces: list[str] = []
        for tok in enc:
            if len(buf) + len(tok) > _QP_LINE_MAX - 1:  # room for '='
                pieces.append(buf + "=")
                buf = ""
            buf += tok
        pieces.append(buf)
        out.append(CRLF.join(p.encode("ascii") for p in pieces))
    return CRLF.join(out)


def qp_decode(data: bytes) -> str:
    """Inverse of qp_encode: soft breaks splice, =XX unescapes, hard
    CRLF becomes '\\n'. Malformed escapes raise ValueError."""
    lines = data.split(CRLF)
    # splice soft-broken transport lines back into logical lines
    logical: list[bytes] = []
    cur = b""
    for ln in lines:
        if ln.endswith(b"="):
            cur += ln[:-1]
        else:
            logical.append(cur + ln)
            cur = b""
    if cur:
        logical.append(cur)
    out_lines: list[str] = []
    for ln in logical:
        buf = bytearray()
        i = 0
        while i < len(ln):
            b = ln[i]
            if b == 0x3D:  # '='
                hx = ln[i + 1 : i + 3]
                if len(hx) != 2:
                    raise ValueError(
                        f"quoted-printable escape truncated at {i}"
                    )
                try:
                    buf.append(int(hx, 16))
                except ValueError as ex:
                    raise ValueError(
                        f"malformed quoted-printable escape ={hx!r}"
                    ) from ex
                i += 3
            else:
                buf.append(b)
                i += 1
        out_lines.append(buf.decode("utf-8"))
    return "\n".join(out_lines)


# -- RFC 2047 encoded-words ------------------------------------------------


def encode_word(text: str, encoding: str = "B") -> str:
    """One RFC 2047 encoded-word: =?utf-8?B?base64?= (or ?Q?)."""
    if encoding == "B":
        payload = base64.b64encode(text.encode("utf-8")).decode("ascii")
    elif encoding == "Q":
        payload = "".join(
            "_"
            if ch == " "
            else (
                ch
                if ch.isascii()
                and ch.isprintable()
                and ch not in "=?_"
                else "".join(
                    f"={b:02X}" for b in ch.encode("utf-8")
                )
            )
            for ch in text
        )
    else:
        raise NotImplementedError(
            f"encoded-word encoding {encoding!r} not supported (B/Q)"
        )
    return f"=?utf-8?{encoding}?{payload}?="


def decode_word(token: str) -> str:
    """Decode one =?charset?enc?payload?= token; plain tokens pass
    through unchanged."""
    if not (token.startswith("=?") and token.endswith("?=")):
        return token
    try:
        _, charset, enc, payload, _ = token.split("?")
    except ValueError as ex:
        raise ValueError(f"malformed encoded-word {token!r}") from ex
    if charset.lower() not in ("utf-8", "us-ascii", "ascii"):
        raise NotImplementedError(
            f"encoded-word charset {charset!r} not supported"
        )
    if enc.upper() == "B":
        try:
            return base64.b64decode(
                payload, validate=True
            ).decode("utf-8")
        except binascii.Error as ex:
            raise ValueError(
                f"malformed base64 encoded-word {token!r}"
            ) from ex
    if enc.upper() == "Q":
        return qp_decode(
            payload.replace("_", " ").encode("ascii")
        )
    raise NotImplementedError(
        f"encoded-word encoding {enc!r} not supported (B/Q)"
    )


# -- message build / parse -------------------------------------------------


def _wrap76(data: bytes) -> bytes:
    """RFC 2045 transport wrap: CRLF every 76 chars."""
    return CRLF.join(
        data[i : i + 76] for i in range(0, max(len(data), 1), 76)
    )


def _fold_header(name: str, value: str, limit: int = 60) -> bytes:
    """RFC 5322 folding: break the value on spaces so each physical
    line stays under ``limit``, continuations indented with one
    space."""
    words = value.split(" ")
    lines: list[str] = []
    cur = f"{name}: {words[0]}"
    for w in words[1:]:
        if len(cur) + 1 + len(w) > limit:
            lines.append(cur)
            cur = " " + w  # continuation line starts with WSP
        else:
            cur += " " + w
    lines.append(cur)
    return CRLF.join(ln.encode("ascii") for ln in lines)


def build_eml(
    msg_id: str,
    subject: str,
    body_text: str,
    attachment: bytes,
    from_addr: str = "corpus@example.invalid",
    to_addr: str = "lake@example.invalid",
) -> bytes:
    """A real two-part MIME message: folded headers, an RFC 2047
    B-encoded Subject, a quoted-printable text/plain body part, and a
    base64 application/octet-stream attachment."""
    bnd = f"=_part_{msg_id}"
    headers = CRLF.join(
        [
            _fold_header("From", from_addr),
            _fold_header("To", to_addr),
            _fold_header("Subject", encode_word(subject)),
            _fold_header("Message-ID", f"<{msg_id}@example.invalid>"),
            _fold_header("MIME-Version", "1.0"),
            _fold_header(
                "Content-Type",
                f'multipart/mixed; boundary="{bnd}"',
            ),
        ]
    )
    part1 = CRLF.join(
        [
            b"Content-Type: text/plain; charset=utf-8",
            b"Content-Transfer-Encoding: quoted-printable",
            b"",
            qp_encode(body_text),
        ]
    )
    part2 = CRLF.join(
        [
            b"Content-Type: application/octet-stream",
            b"Content-Transfer-Encoding: base64",
            b"Content-Disposition: attachment; "
            b'filename="payload.bin"',
            b"",
            _wrap76(base64.b64encode(attachment)),
        ]
    )
    b = bnd.encode("ascii")
    return CRLF.join(
        [
            headers,
            b"",
            b"preamble ignored per RFC 2046",
            b"--" + b,
            part1,
            b"--" + b,
            part2,
            b"--" + b + b"--",
            b"epilogue ignored",
            b"",
        ]
    )


def _parse_headers(block: bytes) -> dict[str, str]:
    """Unfold (continuation lines spliced with one space) and parse
    ``Name: value`` headers; names lowercased."""
    unfolded: list[bytes] = []
    for ln in block.split(CRLF):
        if ln[:1] in (b" ", b"\t"):
            if not unfolded:
                raise ValueError(
                    "header continuation line with no preceding header"
                )
            unfolded[-1] += b" " + ln.lstrip()
        elif ln:
            unfolded.append(ln)
    out: dict[str, str] = {}
    for ln in unfolded:
        name, sep, value = ln.partition(b":")
        if not sep:
            raise ValueError(f"malformed header line {ln!r}")
        out[name.decode("ascii").lower()] = value.strip().decode(
            "ascii"
        )
    return out


def _header_params(value: str) -> tuple[str, dict[str, str]]:
    """Split 'type/sub; k=v; k2="v2"' into (media type, params)."""
    parts = [p.strip() for p in value.split(";")]
    params: dict[str, str] = {}
    for p in parts[1:]:
        if not p:
            continue
        k, sep, v = p.partition("=")
        if not sep:
            raise ValueError(f"malformed header parameter {p!r}")
        params[k.strip().lower()] = v.strip().strip('"')
    return parts[0].lower(), params


def _decode_leaf(headers: dict[str, str], body: bytes) -> dict:
    cte = headers.get("content-transfer-encoding", "7bit").lower()
    ctype, params = _header_params(
        headers.get("content-type", "text/plain")
    )
    charset = params.get("charset", "utf-8").lower()
    if charset not in ("utf-8", "us-ascii", "ascii"):
        raise NotImplementedError(
            f"part charset {charset!r} not supported"
        )
    if cte == "quoted-printable":
        return {"type": ctype, "text": qp_decode(body), "data": None}
    if cte == "base64":
        # line breaks in a base64 body are transport framing
        # (RFC 2045 wraps at 76); strip them, then decode STRICTLY
        payload = body.replace(CRLF, b"").replace(b"\n", b"")
        try:
            data = base64.b64decode(payload, validate=True)
        except binascii.Error as ex:
            raise ValueError("malformed base64 part body") from ex
        if ctype.startswith("text/"):
            # a base64 TEXT part (stdlib's default for utf-8 text)
            # decodes through to characters, canonical CRLF -> \n
            return {
                "type": ctype,
                "text": data.decode(charset).replace("\r\n", "\n"),
                "data": None,
            }
        return {"type": ctype, "text": None, "data": data}
    if cte in ("7bit", "8bit", "binary"):
        return {
            "type": ctype,
            "text": body.decode("utf-8").replace("\r\n", "\n"),
            "data": None,
        }
    raise NotImplementedError(
        f"content-transfer-encoding {cte!r} not supported "
        "(7bit/8bit/binary/quoted-printable/base64)"
    )


def parse_eml(data: bytes) -> dict:
    """Parse one message into
    ``{subject, from, to, parts: [{type, text, data}, ...]}`` —
    multipart/* recursed (nested multiparts flatten in document
    order), leaves decoded per their transfer encoding."""
    head, sep, body = data.partition(CRLF + CRLF)
    if not sep:
        raise ValueError("no header/body separator in message")
    headers = _parse_headers(head)
    subject = " ".join(
        decode_word(tok)
        for tok in headers.get("subject", "").split(" ")
        if tok
    )

    def walk(hdrs: dict[str, str], payload: bytes) -> list[dict]:
        ctype, params = _header_params(
            hdrs.get("content-type", "text/plain")
        )
        if not ctype.startswith("multipart/"):
            return [_decode_leaf(hdrs, payload)]
        bnd = params.get("boundary")
        if not bnd:
            raise ValueError(
                "multipart content-type without a boundary parameter"
            )
        delim = b"--" + bnd.encode("ascii")
        chunks = payload.split(delim)
        # chunks[0] = preamble; last chunk starts with b"--" (close)
        if not chunks[-1].startswith(b"--"):
            raise ValueError(
                f"multipart boundary {bnd!r} never closed"
            )
        parts: list[dict] = []
        for chunk in chunks[1:-1]:
            # RFC 2046: the CRLF after the delimiter line and the
            # CRLF before the next delimiter belong to the FRAMING,
            # not the part — strip exactly one of each, never more
            # (a body legitimately ending in a hard QP line break
            # would lose data to rstrip-all)
            if not chunk.startswith(CRLF):
                raise ValueError(
                    "multipart delimiter not followed by CRLF"
                )
            chunk = chunk[2:]
            if not chunk.endswith(CRLF):
                raise ValueError(
                    "multipart part not terminated by CRLF"
                )
            chunk = chunk[:-2]
            phead, psep, pbody = chunk.partition(CRLF + CRLF)
            if not psep:
                raise ValueError(
                    "part without header/body separator"
                )
            parts.extend(walk(_parse_headers(phead), pbody))
        return parts

    return {
        "subject": subject,
        "from": headers.get("from", ""),
        "to": headers.get("to", ""),
        "parts": walk(headers, body),
    }
