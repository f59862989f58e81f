"""operators/unicodenorm.py: the distributed normalizer must agree
with stdlib unicodedata per row (trivially, it wraps it) AND with
DuckDB's independent nfc_normalize on adversarial combining-mark
soup — the cross-implementation check that makes the registered
query's oracle meaningful."""

from __future__ import annotations

import random
import unicodedata

import pytest

from funding_monitoring_spark.operators.unicodenorm import (
    with_unicode_normalized,
)


def test_forms_behavior_classes(spark):
    """One string pinning all three marker classes: canonical
    composition, compatibility expansion, no-precomposed-form."""
    s = "é ﬁne q́"
    df = spark.createDataFrame([(1, s)], "id long, s string")
    out = with_unicode_normalized(
        with_unicode_normalized(df, "s", "nfc", form="NFC"),
        "s",
        "nfkc",
        form="NFKC",
    ).collect()[0]
    assert out.nfc == "é ﬁne q́"
    assert out.nfkc == "é fine q́"


def test_null_passthrough_and_casefold(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "STRAßE")], "id long, s string"
    )
    rows = {
        r.id: r.out
        for r in with_unicode_normalized(
            df, "s", "out", form="NFKC", casefold=True
        ).collect()
    }
    assert rows[1] is None
    assert rows[2] == "strasse"


def test_invalid_form_and_existing_col_raise(spark):
    df = spark.createDataFrame([(1, "x")], "id long, s string")
    with pytest.raises(ValueError, match="normalization form"):
        with_unicode_normalized(df, "s", "out", form="NFX")
    with pytest.raises(ValueError, match="already exists"):
        with_unicode_normalized(df, "s", "s", form="NFC")


def test_nfc_matches_duckdb_on_combining_soup(spark):
    """Random strings mixing ASCII, precomposed Latin-1 letters, and
    combining marks: the distributed NFC must equal DuckDB's
    nfc_normalize byte for byte (both sit on the Unicode UCD; a
    version skew would surface here before it surfaced in the
    registered query)."""
    import duckdb

    rng = random.Random(53)
    pool = list("abqeéÅn ") + ["́", "̊", "̧"]
    cases = [
        "".join(rng.choice(pool) for _ in range(rng.randint(0, 24)))
        for _ in range(60)
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(cases)], "id long, s string"
    )
    got = {
        r.id: r.nfc
        for r in with_unicode_normalized(df, "s", "nfc").collect()
    }
    con = duckdb.connect()
    for i, s in enumerate(cases):
        want = con.execute(
            "SELECT nfc_normalize(?)", [s]
        ).fetchone()[0]
        assert got[i] == want == unicodedata.normalize("NFC", s), (
            i,
            s,
        )
