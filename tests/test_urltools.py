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
        "http://Example.com#top",  # fragment right after authority
        "http://a.com:8080#f",  # ...and with a port to strip after it
    ]
    assert _hosts(spark, urls) == [
        "www.example.com",
        "a.b.c",
        "",
        "example.com",
        "a.com",
    ]


def test_canonical_collapses_same_resource_variants(spark):
    variants = [
        "http://Site.COM/page",
        "HTTP://site.com:80/page/",
        "http://site.com/page?utm_source=mail#top",
    ]
    assert len(set(_canon(spark, variants))) == 1


def test_pii_redaction_masks_and_counts(spark):
    from mashing_pumpkins_spark.functions.textstats import pii_counts, redact_pii

    rows = [
        (1, "reach me at jane.doe+spam@sub.example.co.uk or +4917612345678"),
        (2, "server 192.168.1.200 and 10.0.0.1 are internal"),
        (3, "no pii here at all"),
        # the email's host contains dots but must NOT be double-counted as
        # an IP: email masking runs first
        (4, "mail a@1.2.3.4x.com plus real ip 8.8.8.8"),
        # separator-tolerant international forms all mask; bare national
        # numbers (no '+') are documented out of scope
        (5, "call +1 (415) 555-0100 or +44-20-7946-0958 today"),
        (6, "office +49 151 2345678, fax (415) 555-0100"),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    counts = pii_counts(F.col("t"))
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            *[c.alias(f"n_{k}") for k, c in counts],
            redact_pii(F.col("t")).alias("red"),
        ).collect()
    }
    assert out[1]["n_email"] == 1 and out[1]["n_phone"] == 1
    assert "<EMAIL>" in out[1]["red"] and "<PHONE>" in out[1]["red"]
    assert "jane" not in out[1]["red"] and "4917612345678" not in out[1]["red"]
    assert out[2]["n_ipv4"] == 2 and out[2]["red"].count("<IP>") == 2
    assert out[3]["red"] == "no pii here at all"
    assert (out[3]["n_email"], out[3]["n_ipv4"], out[3]["n_phone"]) == (0, 0, 0)
    assert out[4]["n_email"] == 1 and out[4]["n_ipv4"] == 1
    assert out[5]["n_phone"] == 2 and out[5]["red"].count("<PHONE>") == 2
    assert "555-0100" not in out[5]["red"] and "7946" not in out[5]["red"]
    # '+'-prefixed forms masked, the bare national number stays (documented)
    assert out[6]["n_phone"] == 1 and "2345678" not in out[6]["red"]
    assert "(415) 555-0100" in out[6]["red"]


# ------------------------------------------------------------ url filter


def _flags(spark, urls, hosts, terms):
    from mashing_pumpkins_spark.functions.urltools import url_filter_flags

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = df.select(
        "url", url_filter_flags(F.col("url"), hosts, terms).alias("f")
    ).collect()
    return {r["url"]: (r["f"]["host_blocked"], r["f"]["path_blocked"]) for r in out}


def test_url_filter_host_suffix_at_dot_boundary(spark):
    got = _flags(
        spark,
        [
            "http://example.com/a",           # exact
            "http://ads.example.com/a",       # subdomain -> blocked
            "http://notexample.com/a",        # suffix WITHOUT dot -> clean
            "http://EXAMPLE.com:80/a",        # case + port folded by host_of
            "http://other.org/a",
        ],
        hosts=["example.com"],
        terms=[],
    )
    assert got["http://example.com/a"] == (True, False)
    assert got["http://ads.example.com/a"] == (True, False)
    assert got["http://notexample.com/a"] == (False, False)
    assert got["http://EXAMPLE.com:80/a"] == (True, False)
    assert got["http://other.org/a"] == (False, False)


def test_url_filter_path_terms_not_in_host(spark):
    got = _flags(
        spark,
        [
            "http://a.com/promo/CASINO-week?ref=1",  # path term, any case
            "http://casino.com/news",                # term in HOST only -> clean path
            "http://a.com",                          # bare authority -> empty path
            "http://a.com/x#casino",                 # fragment stripped -> clean
        ],
        hosts=[],
        terms=["casino"],
    )
    assert got["http://a.com/promo/CASINO-week?ref=1"] == (False, True)
    assert got["http://casino.com/news"] == (False, False)
    assert got["http://a.com"] == (False, False)
    assert got["http://a.com/x#casino"] == (False, False)


def test_url_filter_query_without_path_is_checked(spark):
    got = _flags(
        spark,
        ["http://a.com?page=casino", "http://a.com?page=news"],
        hosts=[],
        terms=["casino"],
    )
    assert got["http://a.com?page=casino"] == (False, True)
    assert got["http://a.com?page=news"] == (False, False)
