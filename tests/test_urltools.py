"""URL canonicalization Column algebra (functions/urltools.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mashing_pumpkins_spark.functions.urltools import canonicalize_url, host_of


def _canon(spark, urls: list[str]) -> list[str]:
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    return [r.c for r in df.select(canonicalize_url(F.col("u")).alias("c")).collect()]


def _hosts(spark, urls: list[str]) -> list[str]:
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    return [r.h for r in df.select(host_of(F.col("u")).alias("h")).collect()]


CASES = [
    # (input, canonical)
    ("HTTP://WWW.Example.COM/A/b/", "http://www.example.com/A/b"),
    ("http://example.com:80/x", "http://example.com/x"),
    ("https://example.com:443/x", "https://example.com/x"),
    ("http://example.com:443/x", "http://example.com:443/x"),  # not default
    ("https://example.com:8080/x", "https://example.com:8080/x"),
    ("http://a.com/p#frag", "http://a.com/p"),
    ("http://a.com/p?b=2&utm_source=x&a=1&ref=rss", "http://a.com/p?a=1&b=2"),
    ("http://a.com/p?utm_campaign=z&fbclid=1&gclid=2", "http://a.com/p"),
    ("http://a.com/", "http://a.com"),  # bare root folds into authority
    ("http://a.com", "http://a.com"),
    ("  http://a.com/x  ", "http://a.com/x"),  # trimmed
    ("not-a-url/relative/path", "not-a-url/relative/path"),  # passthrough
    ("http://a.com/CaseKeptInPath?Z=1&a=2", "http://a.com/CaseKeptInPath?Z=1&a=2"),
]


def test_canonicalize_url_rules(spark):
    got = _canon(spark, [u for u, _ in CASES])
    for (inp, want), g in zip(CASES, got):
        assert g == want, (inp, g, want)


def test_canonicalize_is_idempotent(spark):
    canon = _canon(spark, [u for u, _ in CASES])
    again = _canon(spark, canon)
    assert canon == again


def test_host_of(spark):
    urls = [
        "HTTP://WWW.Example.COM:8080/x",
        "https://a.b.c:443/",
        "relative/no/scheme",
    ]
    assert _hosts(spark, urls) == ["www.example.com", "a.b.c", ""]


def test_canonical_collapses_same_resource_variants(spark):
    variants = [
        "http://Site.COM/page",
        "HTTP://site.com:80/page/",
        "http://site.com/page?utm_source=mail#top",
    ]
    assert len(set(_canon(spark, variants))) == 1
