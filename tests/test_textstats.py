"""GPT-2-style pre-tokenizer segmentation (textstats.bpe_pretokens)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mashing_pumpkins_spark.functions.textstats import bpe_pretokens


def test_bpe_pretokens_gpt2_segmentation(spark):
    df = spark.createDataFrame(
        [("Hello world, it's 2026!",), ("  spaced   out",), ("",)], "t string"
    )
    got = [r["s"] for r in df.select(bpe_pretokens(F.col("t")).alias("s")).collect()]
    assert got[0] == ["Hello", " world", ",", " it", "'s", " 2026", "!"]
    # every byte lands in exactly one segment
    assert "".join(got[0]) == "Hello world, it's 2026!"
    assert got[1] == ["  ", "spaced", "   ", "out"]
    assert got[2] == []


def test_bpe_pretokens_unicode_classes(spark):
    text = "naïve café ２３"
    df = spark.createDataFrame([(text,)], "t string")
    got = df.select(bpe_pretokens(F.col("t")).alias("s")).first()["s"]
    assert got == ["naïve", " café", " ２３"]


def test_bpe_pretokens_matches_duckdb_re2(spark):
    """The oracle replays the same pattern through RE2 — segmentation
    must be engine-identical, including contraction edge cases."""
    import duckdb

    from mashing_pumpkins_spark.functions.textstats import BPE_PRETOKEN_RE

    cases = ["a'b''c", "don't we'll I've you're", "x1y2", "-3.14e5", "tab\there"]
    df = spark.createDataFrame([(c,) for c in cases], "t string")
    got = {
        r["t"]: r["s"]
        for r in df.select("t", bpe_pretokens(F.col("t")).alias("s")).collect()
    }
    for c in cases:
        duck = duckdb.sql(
            "select regexp_extract_all(?, ?)", params=[c, BPE_PRETOKEN_RE]
        ).fetchone()[0]
        assert got[c] == duck, f"engine divergence on {c!r}"
