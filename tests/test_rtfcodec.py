"""operators/rtfcodec.py: tokenizer-level RTF text recovery. No
independent Python RTF implementation exists in this environment, so
the wire layout is pinned two ways: exact expected BYTES for a known
input, and hand-written foreign-RTF fragments (hex escapes, unicode
fallbacks, \\uc scoping, destination groups, delimiter rules) whose
expected text is derived from the spec, not from our encoder."""

from __future__ import annotations

import random

import pytest

from funding_monitoring_spark.operators.rtfcodec import (
    encode_rtf,
    extract_rtf_text,
)


def test_known_wire_bytes():
    got = encode_rtf("go m\nx")
    assert got == (
        b"{\\rtf1\\ansi\\deff0\\uc1"
        b"{\\fonttbl{\\f0\\froman Times New Roman;}}"
        b"{\\*\\generator funding_monitoring_spark;}"
        b"\\fs24 {\\b g\\'6f} \\u109?\\par {\\b x}}"
    )
    assert extract_rtf_text(got) == "go m\nx"


def test_roundtrip_random_corpora():
    rng = random.Random(67)
    words = "mono fast order group memo zoom table mix".split()
    for _ in range(25):
        text = "\n".join(
            " ".join(
                rng.choice(words)
                for _ in range(rng.randint(1, 12))
            )
            for _ in range(rng.randint(1, 6))
        )
        assert extract_rtf_text(encode_rtf(text)) == text


def test_roundtrip_specials_and_unicode():
    for text in (
        "braces {x} and back\\slash",
        "tabs\tstay",
        "héllo wörld",
        "",
        "one",
    ):
        assert extract_rtf_text(encode_rtf(text)) == text


def test_foreign_fragments_per_spec():
    # delimiter rule: ONE space after a control word is consumed
    assert (
        extract_rtf_text(b"{\\rtf1 \\b  bold}") == " bold"
    )  # second space is text
    # \uc2 scoping: two fallback chars skipped, restored on group close
    assert (
        extract_rtf_text(
            b"{\\rtf1{\\uc2 \\u233ab}\\u233?x}"
        )
        == "\xe9\xe9x"
    )
    # hex-escape fallback counts as ONE skipped char
    assert extract_rtf_text(b"{\\rtf1\\uc1 \\u233\\'e9z}") == "\xe9z"
    # non-starred fonttbl is a destination: no leakage
    assert (
        extract_rtf_text(
            b"{\\rtf1{\\fonttbl{\\f0 Arial;}}text}"
        )
        == "text"
    )
    # unknown control words are IGNORED per conformance rule
    assert (
        extract_rtf_text(b"{\\rtf1\\weirdnew42 keep}") == "keep"
    )
    # raw newlines between tokens are formatting, not text
    assert extract_rtf_text(b"{\\rtf1 a\r\nb}") == "ab"
    # negative \u codepoints wrap per the signed-16-bit rule
    assert (
        extract_rtf_text(b"{\\rtf1\\uc0 \\u-224}")
        == chr(65312)
    )


def test_refusals():
    with pytest.raises(ValueError, match="missing"):
        extract_rtf_text(b"plain text")
    with pytest.raises(ValueError, match="unbalanced closing"):
        extract_rtf_text(b"{\\rtf1 a}}")
    with pytest.raises(ValueError, match="unbalanced opening"):
        extract_rtf_text(b"{\\rtf1 {a")
    with pytest.raises(ValueError, match="truncated"):
        extract_rtf_text(b"{\\rtf1 \\'a")
    with pytest.raises(ValueError, match="7-bit"):
        extract_rtf_text(b"{\\rtf1 \xe9}")
    with pytest.raises(NotImplementedError, match="bin"):
        extract_rtf_text(b"{\\rtf1 \\bin4 ab}")
    with pytest.raises(NotImplementedError, match="control symbol"):
        extract_rtf_text(b"{\\rtf1 \\|}")
