"""Hashed-token linear classifier scoring (functions/classifier.py)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from mashing_pumpkins_spark.functions.classifier import (
    hashed_ngram_score,
    token_bucket,
)


def _bucket_py(token: str, n: int) -> int:
    return int(hashlib.md5(token.encode()).hexdigest()[:8], 16) % n


def _score_py(text: str, weights) -> int:
    toks = text.strip().lower().split()
    return sum(weights[_bucket_py(t, len(weights))] for t in toks)


def test_score_matches_independent_python_reference(spark):
    weights = [((b * 7) % 41) - 20 for b in range(64)]
    texts = [
        "The quick brown Fox",
        "repeated repeated repeated",
        "  spaced   out  tokens ",
        "",
        "unicode café naïve",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    got = {
        r["i"]: r["s"]
        for r in df.select(
            "i", hashed_ngram_score(F.col("t"), weights).alias("s")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _score_py(t, weights), t


def test_token_bucket_stable_and_in_range(spark):
    df = spark.createDataFrame([("hello",), ("world",)], "t string")
    rows = df.select("t", token_bucket(F.col("t"), 256).alias("b")).collect()
    for r in rows:
        assert 0 <= r["b"] < 256
        assert r["b"] == _bucket_py(r["t"], 256)


def test_empty_weights_rejected(spark):
    with pytest.raises(ValueError):
        hashed_ngram_score(F.lit("x"), [])
