"""Pure-Python structural PDF parser + writer (classic PDF 1.4).

What a 100 TB crawl needs from PDFs BEFORE spending OCR/layout CPU is
structural profiling and native text recovery: version, object count,
page count (the real /Pages tree walk, not a regex), and the text a
content stream carries in Tj/TJ operators. All of that is
algorithm-defined by the public PDF 1.4 reference: the classic xref
table is fixed-width records, objects are a small recursive grammar
(dict/array/name/number/string/ref), streams are delimited by
stream/endstream with /Length, and FlateDecode is stdlib zlib.

Scope, honestly bounded (NotImplementedError, never fake output):
- classic xref TABLES (incl. /Prev chains and multiple subsections);
  PDF 1.5+ cross-reference STREAMS and object streams (/ObjStm) refuse
- /Filter: none or FlateDecode (single or [/FlateDecode]); others
  (DCT, LZW, ASCII85, CCITT...) refuse at the stream that uses them
- encrypted documents (/Encrypt in trailer) refuse up front
- text recovery reads Tj and TJ string arguments in content-stream
  order with full PDF string unescaping (\\(, \\), \\\\, \\n, \\r,
  \\t, \\b, \\f, octal \\ddd, line continuations) — positioning
  operators are ignored, which is exactly the "native text layer"
  contract of a corpus profiler (reading order, not layout).

The writer emits the same profile (catalog / pages tree / page +
content-stream pairs / one Type1 font, optional FlateDecode, classic
xref + trailer), so decode(encode(text)) == text exactly and every
offset in the xref is real and verified by the parser's strict mode.
"""

from __future__ import annotations

import re
import zlib

__all__ = ["encode_pdf", "parse_pdf", "PdfInfo"]


class PdfInfo:
    """Result of parse_pdf: version, object/page counts, page texts."""

    __slots__ = ("version", "n_objects", "n_pages", "page_texts",
                 "flate_streams")

    def __init__(self, version, n_objects, n_pages, page_texts,
                 flate_streams):
        self.version = version
        self.n_objects = n_objects
        self.n_pages = n_pages
        self.page_texts = page_texts
        self.flate_streams = flate_streams

    @property
    def text(self) -> str:
        return "".join(self.page_texts)


# -- writer -----------------------------------------------------------------


def _escape_string(s: str) -> bytes:
    out = bytearray()
    for ch in s.encode("latin-1", errors="strict"):
        if ch in (0x28, 0x29, 0x5C):  # ( ) backslash
            out.append(0x5C)
            out.append(ch)
        elif 32 <= ch < 127:
            out.append(ch)
        else:
            out.extend(b"\\%03o" % ch)
    return bytes(out)


def encode_pdf(pages: list[str], compress: bool = False) -> bytes:
    """Write a classic PDF 1.4: one content stream per page with a
    single BT/Tf/Td/(text) Tj/ET block, a real /Pages tree, one
    shared Type1 font, optional FlateDecode on every content stream,
    and a correct classic xref table + trailer. Text must be
    latin-1-representable (the profile a Type1/WinAnsi font carries);
    anything else belongs to a font-embedding profile this writer
    does not claim."""
    n = len(pages)
    if n == 0:
        raise ValueError("a PDF needs at least one page")
    # object numbering: 1 catalog, 2 pages node, 3 font,
    # then per page i: 4+2i page object, 5+2i content stream
    objs: dict[int, bytes] = {}
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n))
    objs[2] = (
        f"<< /Type /Pages /Kids [ {kids} ] /Count {n} >>".encode()
    )
    objs[3] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    for i, text in enumerate(pages):
        page_no, content_no = 4 + 2 * i, 5 + 2 * i
        objs[page_no] = (
            f"<< /Type /Page /Parent 2 0 R "
            f"/MediaBox [ 0 0 612 792 ] "
            f"/Resources << /Font << /F1 3 0 R >> >> "
            f"/Contents {content_no} 0 R >>".encode()
        )
        body = (
            b"BT /F1 12 Tf 72 720 Td ("
            + _escape_string(text)
            + b") Tj ET"
        )
        if compress:
            body = zlib.compress(body)
            head = (
                f"<< /Length {len(body)} /Filter /FlateDecode >>"
            ).encode()
        else:
            head = f"<< /Length {len(body)} >>".encode()
        objs[content_no] = (
            head + b"\nstream\n" + body + b"\nendstream"
        )

    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    n_objs = len(objs) + 1  # entry 0 is the free-list head
    out += f"xref\n0 {n_objs}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in sorted(objs):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {n_objs} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


# -- object grammar ---------------------------------------------------------

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"
_NUM_RE = re.compile(rb"[+-]?(\d+\.?\d*|\.\d+)")


class _Lexer:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self):
        d, i, n = self.data, self.pos, len(self.data)
        while i < n:
            c = d[i]
            if c in _WS:
                i += 1
            elif c == 0x25:  # % comment to EOL
                while i < n and d[i] not in (0x0A, 0x0D):
                    i += 1
            else:
                break
        self.pos = i

    def parse(self):
        """Parse one PDF object at pos (dict/array/name/number/string/
        bool/null/ref)."""
        self._skip_ws()
        d, i = self.data, self.pos
        if d[i : i + 2] == b"<<":
            return self._dict()
        c = d[i]
        if c == 0x5B:  # [
            return self._array()
        if c == 0x2F:  # /
            return self._name()
        if c == 0x28:  # (
            return self._string()
        if d[i : i + 1] == b"<":
            return self._hex_string()
        if d[i : i + 4] == b"true":
            self.pos = i + 4
            return True
        if d[i : i + 5] == b"false":
            self.pos = i + 5
            return False
        if d[i : i + 4] == b"null":
            self.pos = i + 4
            return None
        m = _NUM_RE.match(d, i)
        if m:
            # maybe an indirect reference: int int R
            save = m.end()
            try:
                num = int(m.group())
            except ValueError:
                num = None
            if num is not None and b"." not in m.group():
                look = _Lexer(d, save)
                look._skip_ws()
                m2 = _NUM_RE.match(d, look.pos)
                if m2 and b"." not in m2.group():
                    look2 = _Lexer(d, m2.end())
                    look2._skip_ws()
                    if d[look2.pos : look2.pos + 1] == b"R":
                        self.pos = look2.pos + 1
                        return ("ref", num, int(m2.group()))
            self.pos = save
            g = m.group()
            return float(g) if b"." in g else int(g)
        raise ValueError(f"PDF parse error at byte {i}: {d[i:i+16]!r}")

    def _name(self):
        d, i = self.data, self.pos + 1
        n = len(d)
        j = i
        while j < n and d[j] not in _WS and d[j] not in _DELIM:
            j += 1
        raw = d[i:j]
        # #xx hex escapes in names
        name = re.sub(
            rb"#([0-9A-Fa-f]{2})",
            lambda m: bytes([int(m.group(1), 16)]),
            raw,
        )
        self.pos = j
        return ("name", name.decode("latin-1"))

    def _dict(self):
        self.pos += 2
        out = {}
        while True:
            self._skip_ws()
            if self.data[self.pos : self.pos + 2] == b">>":
                self.pos += 2
                return out
            key = self.parse()
            if not (isinstance(key, tuple) and key[0] == "name"):
                raise ValueError("PDF dict key is not a name")
            out[key[1]] = self.parse()

    def _array(self):
        self.pos += 1
        out = []
        while True:
            self._skip_ws()
            if self.data[self.pos] == 0x5D:  # ]
                self.pos += 1
                return out
            out.append(self.parse())

    def _string(self):
        d = self.data
        i = self.pos + 1
        out = bytearray()
        depth = 1
        n = len(d)
        while i < n:
            c = d[i]
            if c == 0x5C:  # backslash
                i += 1
                e = d[i]
                if e in b"nrtbf":
                    out.append(
                        {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8,
                         0x66: 12}[e]
                    )
                    i += 1
                elif e in b"()\\":
                    out.append(e)
                    i += 1
                elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                    j = i
                    while j < i + 3 and 0x30 <= d[j] <= 0x37:
                        j += 1
                    out.append(int(d[i:j], 8) & 0xFF)
                    i = j
                elif e in (0x0A, 0x0D):  # line continuation
                    i += 1
                    if e == 0x0D and d[i : i + 1] == b"\n":
                        i += 1
                else:
                    out.append(e)
                    i += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                i += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    self.pos = i + 1
                    return ("str", bytes(out))
                out.append(c)
                i += 1
            else:
                out.append(c)
                i += 1
        raise ValueError("unterminated PDF string")

    def _hex_string(self):
        d = self.data
        j = d.index(b">", self.pos)
        hx = re.sub(rb"\s", b"", d[self.pos + 1 : j])
        if len(hx) % 2:
            hx += b"0"
        self.pos = j + 1
        return ("str", bytes.fromhex(hx.decode()))


# -- document walk ----------------------------------------------------------


_OBJ_HEAD = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


def _parse_xref_tables(data: bytes, start: int):
    """Walk the classic xref table chain (startxref -> /Prev ...).
    Returns ({obj_num: offset}, trailer_of_newest_table)."""
    offsets: dict[int, int] = {}
    decided: set[int] = set()  # objects settled by a NEWER table —
    # including FREED ones, so a /Prev chain cannot resurrect them
    trailer_out = None
    seen = set()
    pos = start
    while True:
        if pos in seen:
            raise ValueError("circular xref /Prev chain")
        seen.add(pos)
        lex = _Lexer(data, pos)
        lex._skip_ws()
        if data[lex.pos : lex.pos + 4] != b"xref":
            # a cross-reference STREAM starts with "N 0 obj" instead
            if _OBJ_HEAD.match(data, lex.pos):
                raise NotImplementedError(
                    "PDF 1.5 cross-reference streams not supported "
                    "(classic xref tables only)"
                )
            raise ValueError("startxref does not point at an xref table")
        i = lex.pos + 4
        while True:
            lex = _Lexer(data, i)
            lex._skip_ws()
            i = lex.pos
            if data[i : i + 7] == b"trailer":
                break
            m = re.match(rb"(\d+)\s+(\d+)", data[i:])
            if not m:
                raise ValueError("malformed xref subsection header")
            first, count = int(m.group(1)), int(m.group(2))
            i += m.end()
            # entries start on the next line, 20 bytes each
            while data[i] in b"\r\n \t":
                i += 1
            for k in range(count):
                entry = data[i : i + 20]
                off, gen, kind = entry[:10], entry[11:16], entry[17:18]
                num = first + k
                if num not in decided:
                    decided.add(num)
                    if kind == b"n":
                        offsets[num] = int(off)
                    # kind 'f': freed by this (newer) revision —
                    # decided with NO offset, stays unresolvable
                i += 20
        lex = _Lexer(data, i + 7)
        trailer = lex.parse()
        if trailer_out is None:
            trailer_out = trailer
        if "Prev" in trailer:
            pos = int(trailer["Prev"])
        else:
            return offsets, trailer_out


def _stream_of(data: bytes, obj_dict, body_at: int, resolve):
    """Extract + decode the stream that follows an object dict ending
    at body_at (the parser position after the dict)."""
    m = re.compile(rb"\s*stream(\r\n|\n|\r)").match(data, body_at)
    if not m:
        raise ValueError("object dict not followed by a stream")
    start = m.end()
    length = resolve(obj_dict.get("Length"))
    if not isinstance(length, int):
        raise ValueError("stream /Length is not an integer")
    raw = data[start : start + length]
    filt = obj_dict.get("Filter")
    if isinstance(filt, tuple) and filt[0] == "name":
        filt = [filt]
    if filt is None:
        return raw
    names = [f[1] for f in filt
             if isinstance(f, tuple) and f[0] == "name"]
    if names == ["FlateDecode"]:
        if "DecodeParms" in obj_dict and obj_dict["DecodeParms"]:
            raise NotImplementedError(
                "FlateDecode predictors (DecodeParms) not supported"
            )
        return zlib.decompress(raw)
    raise NotImplementedError(f"PDF stream filters {names} not supported")


def _content_text(content: bytes) -> str:
    """Recover the Tj/TJ string arguments of a content stream in
    stream order. Strings are lexed with the real PDF string grammar;
    an operand string is kept when the operator that consumes it is
    Tj or TJ (array form concatenates its strings)."""
    out = []
    pending: list[bytes] = []
    i, n = 0, len(content)
    while i < n:
        c = content[i]
        if c == 0x28:  # ( — lex a real string (handles escapes)
            lex = _Lexer(content, i)
            kind, s = lex._string()
            pending.append(s)
            i = lex.pos
        elif c == 0x3C and content[i : i + 2] != b"<<":
            # <...> hex string — the common form for font-encoded
            # text; decode it instead of silently dropping the operand
            lex = _Lexer(content, i)
            lex.pos = i
            _, s = lex._hex_string()
            pending.append(s)
            i = lex.pos
        elif content[i : i + 2] == b"<<":
            # inline dict operand (BDC/DP property lists): skip to the
            # matching >> and clear — dict-consuming ops are not Tj
            depth = 0
            while i + 1 < n:
                if content[i : i + 2] == b"<<":
                    depth += 1
                    i += 2
                elif content[i : i + 2] == b">>":
                    depth -= 1
                    i += 2
                    if depth == 0:
                        break
                else:
                    i += 1
            pending = []
        elif c == 0x5B:  # [ — array operand: remember its strings
            # lex strings inside until the matching ]
            i += 1
            arr: list[bytes] = []
            while i < n and content[i] != 0x5D:
                if content[i] == 0x28:
                    lex = _Lexer(content, i)
                    _, s = lex._string()
                    arr.append(s)
                    i = lex.pos
                elif content[i] == 0x3C:
                    lex = _Lexer(content, i)
                    _, s = lex._hex_string()
                    arr.append(s)
                    i = lex.pos
                else:
                    i += 1
            i += 1
            pending = [b"".join(arr)]
        elif content[i : i + 2] in (b"Tj", b"TJ"):
            for s in pending:
                out.append(s)
            pending = []
            i += 2
        elif c in _WS:
            i += 1
        else:
            # any other operator consumes pending operands
            if content[i : i + 2] in (b"BT", b"ET"):
                pending = []
                i += 2
            else:
                j = i + 1
                while j < n and content[j] not in _WS \
                        and content[j] not in b"()[]<>/":
                    j += 1
                # operands that are not strings don't clear strings
                # unless an operator ends the phrase; conservative:
                # keep pending only across numeric operands
                tok = content[i:j]
                if not re.fullmatch(rb"[+-]?(\d+\.?\d*|\.\d+)", tok):
                    pending = []
                i = j
    return b"".join(out).decode("latin-1")


def parse_pdf(payload: bytes, strict: bool = True) -> PdfInfo:
    """Structural parse of a classic-xref PDF: version, object count
    (xref in-use entries), page count via the real /Pages tree walk,
    and per-page native text (Tj/TJ recovery, FlateDecode inflated).
    Encrypted documents, xref/object streams and non-Flate filters
    refuse loudly."""
    m = re.match(rb"%PDF-(\d+\.\d+)", payload)
    if not m:
        raise ValueError("not a PDF payload (missing %PDF- header)")
    version = m.group(1).decode()
    tail = payload[-256:]
    sx = tail.rfind(b"startxref")
    if sx < 0:
        raise ValueError("missing startxref")
    m2 = re.search(rb"startxref\s+(\d+)", tail[sx:])
    if not m2:
        raise ValueError("malformed startxref")
    offsets, trailer = _parse_xref_tables(payload, int(m2.group(1)))
    if "Encrypt" in trailer:
        raise NotImplementedError("encrypted PDFs not supported")

    def resolve(x):
        if isinstance(x, tuple) and x[0] == "ref":
            num = x[1]
            if num not in offsets:
                raise ValueError(f"dangling reference to object {num}")
            lex = _Lexer(payload, offsets[num])
            lex._skip_ws()
            mh = _OBJ_HEAD.match(payload, lex.pos)
            if not mh:
                raise ValueError(
                    f"xref offset for object {num} does not point at "
                    f"an object"
                )
            if strict and int(mh.group(1)) != num:
                raise ValueError(
                    f"xref offset for object {num} points at object "
                    f"{int(mh.group(1))}"
                )
            lex.pos = mh.end()
            return lex.parse(), lex.pos
        return x, None

    def resolve_val(x):
        v, _ = resolve(x)
        return v

    root = resolve_val(trailer.get("Root"))
    if not isinstance(root, dict):
        raise ValueError("trailer /Root is not a dictionary")

    # walk the /Pages tree depth-first, left to right
    page_texts: list[str] = []
    flate = 0

    def walk(node_ref):
        nonlocal flate
        node = resolve_val(node_ref)
        if not isinstance(node, dict):
            raise ValueError("Pages tree node is not a dictionary")
        ntype = node.get("Type")
        ntype = ntype[1] if isinstance(ntype, tuple) else None
        if ntype == "Pages":
            for kid in node.get("Kids", []):
                walk(kid)
            return
        if ntype != "Page":
            raise ValueError(f"unexpected node type {ntype!r} in tree")
        contents = node.get("Contents")
        if contents is None:
            page_texts.append("")
            return
        refs = contents if isinstance(contents, list) else [contents]
        parts = []
        for ref in refs:
            if not (isinstance(ref, tuple) and ref[0] == "ref"):
                raise ValueError("/Contents is not a reference")
            obj, end_pos = resolve(ref)
            if not isinstance(obj, dict):
                raise ValueError("content object is not a stream dict")
            data = _stream_of(payload, obj, end_pos, resolve_val)
            f = obj.get("Filter")
            if f is not None:
                flate += 1
            parts.append(_content_text(data))
        page_texts.append("".join(parts))

    walk(root.get("Pages"))
    return PdfInfo(
        version=version,
        n_objects=len(offsets),
        n_pages=len(page_texts),
        page_texts=page_texts,
        flate_streams=flate,
    )
