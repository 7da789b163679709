"""CDX(J) index parsing + SURT keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from mashing_pumpkins_spark.functions.urltools import surt_key
from mashing_pumpkins_spark.sources.cdx import parse_cdx


def test_surt_key_reverses_host_and_keeps_path(spark):
    cases = {
        "http://news.example.com/a/b?x=1": "com,example,news)/a/b?x=1",
        "https://Example.COM/Path": "com,example)/path",
        "http://example.com": "com,example)",
        "http://a.com?q=1": "com,a)?q=1",
        "http://a.com:8080/x#frag": "com,a)/x",
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {r["url"]: r["s"] for r in df.select("url", surt_key(F.col("url")).alias("s")).collect()}
    for u, want in cases.items():
        assert got[u] == want, (u, got[u])


def test_parse_cdx_typed_fields(spark):
    line = (
        'com,example)/p 20260211103001 {"url": "http://example.com/p", '
        '"status": "404", "mime": "text/html", "digest": "ABC", '
        '"length": "2048", "filename": "f.warc.gz", "offset": "4096"}'
    )
    df = spark.createDataFrame([(line,)], "line string")
    r = parse_cdx(df).collect()[0]
    assert r["surt"] == "com,example)/p"
    assert r["ts_raw"] == "20260211103001" and r["dt"] == "20260211"
    assert r["url"] == "http://example.com/p"
    assert r["status"] == 404 and r["length"] == 2048 and r["warc_offset"] == 4096
    assert r["mime"] == "text/html" and r["warc_filename"] == "f.warc.gz"


def test_parse_cdx_malformed_lines_null_not_fail(spark):
    df = spark.createDataFrame(
        [
            ("only-two fields",),                       # no json
            ("surt notatimestamp {\"status\": \"x\"}",),  # bad ts + status
            ("",),
        ],
        "line string",
    )
    rows = parse_cdx(df).collect()
    assert len(rows) == 3
    assert rows[0]["url"] is None
    assert rows[1]["dt"] is None and rows[1]["status"] is None
    assert rows[2]["url"] is None


def test_dedup_index_collapses_revisits_and_flags_latest(spark):
    from mashing_pumpkins_spark.sources.cdx import dedup_index

    rows = [
        # urlA: same digest captured 3x (2 revisits), then new content
        ("com,a)/", "20260101000000", "D1"),
        ("com,a)/", "20260102000000", "D1"),
        ("com,a)/", "20260103000000", "D1"),
        ("com,a)/", "20260104000000", "D2"),
        # urlB: single capture
        ("com,b)/", "20260101000000", "D9"),
        # urlC: latest-ts tie between two digests -> larger digest wins
        ("com,c)/", "20260105000000", "Dx"),
        ("com,c)/", "20260105000000", "Dy"),
    ]
    cdx = spark.createDataFrame(rows, "surt string, ts_raw string, digest string")
    got = {
        (r["surt"], r["digest"]): r
        for r in dedup_index(cdx).collect()
    }
    assert len(got) == 5
    a1 = got[("com,a)/", "D1")]
    assert a1["n_captures"] == 3 and a1["n_revisits"] == 2
    assert a1["first_ts"] == "20260101000000" and a1["last_ts"] == "20260103000000"
    assert not a1["is_latest"]
    a2 = got[("com,a)/", "D2")]
    assert a2["n_captures"] == 1 and a2["n_revisits"] == 0 and a2["is_latest"]
    assert got[("com,b)/", "D9")]["is_latest"]
    assert got[("com,c)/", "Dy")]["is_latest"] and not got[("com,c)/", "Dx")]["is_latest"]
