"""RTF (Rich Text Format) codec — pure Python, wire-format exact.

RTF is the remaining legacy-document format of a lake estate after
DOCX/XLSX/PPTX (OOXML, operators/containers.py composition) and PDF
(operators/pdfcodec.py): decades of WordPad/Word exports. The format
is a brace-grouped control-word stream (RTF 1.9.1 spec, public);
text recovery needs a real tokenizer, not a regex strip:

- control words ``\\word`` with optional signed numeric parameter,
  delimiter rules (one following space is consumed by the word);
- control symbols ``\\{`` ``\\}`` ``\\\\`` (escaped literals) and
  ``\\~`` (non-breaking space);
- hex escapes ``\\'hh`` (one byte in the document code page);
- unicode escapes ``\\uN`` followed by ``\\ucN`` fallback characters
  that must be SKIPPED (the reader consumed the unicode form);
- groups ``{...}`` with state scoping, and starred destination
  groups ``{\\*\\...}`` whose entire content is metadata, not text;
- ``\\par``/``\\line`` as line breaks, ``\\tab`` as tab.

Unknown control WORDS are ignored per the spec's conformance rule
(an RTF reader "must ignore control words it does not understand" —
that is the format's versioning mechanism, not sloppiness). Unknown
control SYMBOLS, ``\\bin`` (raw binary would corrupt the character
stream), truncated hex/unicode escapes, and unbalanced braces all
refuse loudly per the repo policy.

No independent Python RTF implementation exists in this environment,
so tests pin exact wire bytes for known inputs AND roundtrip random
corpora through encode -> extract (tests/test_rtfcodec.py); the
registered query's DuckDB oracle closes the loop against the
original text column.
"""

from __future__ import annotations

#: control words the extractor maps to text
_BREAKS = {"par": "\n", "line": "\n", "tab": "\t"}

#: standard destination groups whose content is metadata, not body
#: text, even without the {\*. star (RTF 1.x conformance list)
_DESTINATIONS = {
    "fonttbl",
    "colortbl",
    "stylesheet",
    "info",
    "pict",
    "header",
    "footer",
    "footnote",
}

#: control symbols that are escaped literals
_SYMBOLS = {"\\": "\\", "{": "{", "}": "}", "~": " "}


def encode_rtf(text: str) -> bytes:
    """A real RTF 1 document holding ``text``: header with font
    table and a starred generator destination (readers must skip
    it), every 'o' as a hex escape ``\\'6f``, every 'm' as a unicode
    escape ``\\u109?`` (with ``\\uc1`` fallback), the first word of
    every line wrapped in a bold group, lines joined with ``\\par``,
    and RTF-special characters escaped."""

    def esc(s: str) -> str:
        out: list[str] = []
        for ch in s:
            if ch in "\\{}":
                out.append("\\" + ch)
            elif ch == "o":
                out.append("\\'6f")
            elif ch == "m":
                out.append("\\u109?")
            elif ord(ch) > 127:
                out.append(f"\\u{ord(ch)}?")
            else:
                out.append(ch)
        return "".join(out)

    lines = text.split("\n")
    body_parts: list[str] = []
    for ln in lines:
        first, sep, rest = ln.partition(" ")
        piece = "{\\b " + esc(first) + "}"
        if sep:
            piece += " " + esc(rest)
        body_parts.append(piece)
    body = "\\par ".join(body_parts)
    doc = (
        "{\\rtf1\\ansi\\deff0\\uc1"
        "{\\fonttbl{\\f0\\froman Times New Roman;}}"
        "{\\*\\generator funding_monitoring_spark;}"
        "\\fs24 " + body + "}"
    )
    return doc.encode("ascii")


def extract_rtf_text(data: bytes) -> str:
    """Recover the document text from RTF wire bytes per the module
    docstring's rules. Raises on structural corruption."""
    try:
        s = data.decode("ascii")
    except UnicodeDecodeError as ex:
        raise ValueError(
            "RTF stream is not 7-bit clean (8-bit bytes outside "
            "\\'hh escapes are not valid RTF)"
        ) from ex
    if not s.startswith("{\\rtf"):
        raise ValueError("not an RTF document (missing {\\rtf header)")

    out: list[str] = []
    i = 0
    n = len(s)
    depth = 0
    uc = 1  # current \ucN fallback length
    uc_stack: list[int] = []
    skip_depth: int | None = None  # inside a {\*...} destination
    pending_skip = 0  # fallback chars to skip after \uN

    def emit(ch: str) -> None:
        nonlocal pending_skip
        if skip_depth is not None:
            return
        if pending_skip > 0:
            pending_skip -= 1
            return
        out.append(ch)

    while i < n:
        ch = s[i]
        if ch == "{":
            depth += 1
            uc_stack.append(uc)
            if skip_depth is None:
                # starred destination {\*\word ...} or a standard
                # non-starred one ({\fonttbl ...}): whole group is
                # metadata — skip it
                if s[i + 1 : i + 3] == "\\*":
                    skip_depth = depth
                elif s[i + 1 : i + 2] == "\\":
                    j = i + 2
                    while j < n and s[j].isalpha():
                        j += 1
                    if s[i + 2 : j] in _DESTINATIONS:
                        skip_depth = depth
            i += 1
        elif ch == "}":
            if depth == 0:
                raise ValueError("unbalanced closing brace in RTF")
            if skip_depth == depth:
                skip_depth = None
            depth -= 1
            uc = uc_stack.pop()
            i += 1
        elif ch == "\\":
            nxt = s[i + 1 : i + 2]
            if not nxt:
                raise ValueError("dangling backslash at end of RTF")
            if nxt == "'":
                hx = s[i + 2 : i + 4]
                if len(hx) != 2:
                    raise ValueError("truncated \\'hh hex escape")
                try:
                    emit(chr(int(hx, 16)))
                except ValueError as ex:
                    raise ValueError(
                        f"malformed \\'hh hex escape {hx!r}"
                    ) from ex
                i += 4
            elif nxt.isalpha():
                j = i + 1
                while j < n and s[j].isalpha():
                    j += 1
                word = s[i + 1 : j]
                k = j
                if k < n and (s[k] == "-" or s[k].isdigit()):
                    k += 1 if s[k] == "-" else 0
                    while k < n and s[k].isdigit():
                        k += 1
                param_str = s[j:k]
                # the word's delimiter consumes ONE following space
                if k < n and s[k] == " ":
                    k += 1
                if word == "bin":
                    raise NotImplementedError(
                        "\\bin raw binary runs are not supported"
                    )
                if word == "u":
                    if not param_str:
                        raise ValueError(
                            "\\u unicode escape without codepoint"
                        )
                    cp = int(param_str)
                    if cp < 0:  # RTF stores >32767 as signed
                        cp += 65536
                    emit(chr(cp))
                    if skip_depth is None:
                        pending_skip += uc
                elif word == "uc":
                    if not param_str:
                        raise ValueError("\\uc without a count")
                    uc = int(param_str)
                elif word in _BREAKS:
                    emit(_BREAKS[word])
                # any other control word: ignored (spec conformance)
                i = k
            elif nxt == "*":
                # the destination star itself — group-open lookahead
                # already acted on it; the token emits nothing
                i += 2
            elif nxt in _SYMBOLS:
                emit(_SYMBOLS[nxt])
                i += 2
            else:
                raise NotImplementedError(
                    f"control symbol \\{nxt!r} not supported"
                )
        else:
            if ch not in ("\r", "\n"):  # raw CR/LF is formatting
                emit(ch)
            i += 1
    if depth != 0:
        raise ValueError("unbalanced opening brace in RTF")
    return "".join(out)
