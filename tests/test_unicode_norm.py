"""Unicode normalization UDF: unicodedata-vs-DuckDB parity, null
handling, and form validation."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from mashing_pumpkins_spark.functions.unicode_norm import normalize_unicode

# composed, decomposed, ligature, full-width katakana + dakuten,
# multi-combining-mark canonical reordering
CASES = [
    "caf\u00e9",          # composed e-acute
    "cafe\u0301",         # decomposed e + combining acute
    "\ufb01lm",           # fi ligature (NFC keeps, NFKC folds)
    "A\u030a",            # A + combining ring -> composes
    "\uff76\uff9e",      # half-width katakana + dakuten
    "e\u0328\u0301",     # multi combining marks: canonical reordering
    "\u1e9b\u0323",      # long s with dot above + dot below
    "plain ascii",
    "",
]


def test_nfc_matches_duckdb_utf8proc(spark):
    """Python unicodedata and DuckDB's utf8proc must agree on NFC — the
    SQL oracle replays this UDF through nfc_normalize. (DuckDB exposes no
    NFKC function, so NFKC has no SQL oracle; its behavior is pinned
    against unicodedata plus hardcoded expectations below.)"""
    import unicodedata

    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(CASES)], "i long, t string"
    )
    got = {
        r["i"]: r["n"]
        for r in df.select(
            "i", normalize_unicode(F.col("t"), "NFC").alias("n")
        ).collect()
    }
    for i, c in enumerate(CASES):
        assert got[i] == unicodedata.normalize("NFC", c)
        duck = duckdb.sql("select nfc_normalize(?)", params=[c]).fetchone()[0]
        assert got[i] == duck, f"utf8proc divergence on {c!r}"


def test_nfkc_matches_unicodedata(spark):
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(CASES)], "i long, t string"
    )
    got = {
        r["i"]: r["n"]
        for r in df.select(
            "i", normalize_unicode(F.col("t"), "NFKC").alias("n")
        ).collect()
    }
    import unicodedata

    for i, c in enumerate(CASES):
        assert got[i] == unicodedata.normalize("NFKC", c)


def test_nfc_composes_and_keeps_ligature(spark):
    df = spark.createDataFrame([("café ﬁlm",)], "t string")
    out = df.select(normalize_unicode(F.col("t")).alias("n")).first()["n"]
    assert out == "café ﬁlm"  # composed; ligature untouched


def test_nfkc_folds_compatibility_forms(spark):
    df = spark.createDataFrame([("ﬁlm ｶﾞ",)], "t string")
    out = df.select(normalize_unicode(F.col("t"), "NFKC").alias("n")).first()["n"]
    assert out == "film ガ"


def test_null_preserved_and_bad_form_rejected(spark):
    df = spark.createDataFrame([(None,), ("x",)], "t string")
    rows = df.select(normalize_unicode(F.col("t")).alias("n")).collect()
    assert sorted([r["n"] for r in rows], key=lambda v: (v is None, v)) == ["x", None]
    with pytest.raises(ValueError):
        normalize_unicode(F.col("t"), "NFX")
