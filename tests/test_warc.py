"""WARC source: framing, HTTP payload split, distributed Spark ingest."""

from __future__ import annotations

import gzip
import os
from datetime import datetime, timezone

import pandas as pd
import pytest

from mashing_pumpkins_spark.sources.warc import (
    _split_http,
    build_response_record,
    iter_warc_records,
    read_warc_pages,
    write_pages_as_warc,
    write_warc,
)


def _pages(n=30, seed=3):
    from mashing_pumpkins_spark.sources.synthetic import generate_pages

    pages, _ = generate_pages(n, seed=seed)
    return pages


def test_roundtrip_gzip_members(tmp_path):
    pages = _pages(30)
    paths = write_pages_as_warc(pages, str(tmp_path), n_files=3)
    got = {}
    for p in paths:
        with open(p, "rb") as fh:
            for rec in iter_warc_records(fh.read()):
                if rec["warc_type"] == "response":
                    got[rec["url"]] = rec
    assert len(got) == 30
    for row in pages.to_dict("records"):
        rec = got[row["url"]]
        assert bytes(rec["html"]) == bytes(row["html"])
        assert rec["http_status"] == 200
        assert rec["warc_ts"] == row["warc_ts"].to_pydatetime()
        assert rec["record_id"].startswith("<urn:uuid:")


def test_roundtrip_plain_warc(tmp_path):
    pages = _pages(8)
    p = str(tmp_path / "f.warc")
    n = write_warc(p, pages.to_dict("records"), gzip_per_record=False)
    assert n == 8
    recs = list(iter_warc_records(open(p, "rb").read()))
    assert recs[0]["warc_type"] == "warcinfo"  # skipped by page readers
    assert sum(1 for r in recs if r["warc_type"] == "response") == 8


def test_record_ids_deterministic():
    ts = datetime(2024, 5, 1, tzinfo=timezone.utc)
    a = build_response_record("https://x.example/a", ts, b"<p>x</p>")
    b = build_response_record("https://x.example/a", ts, b"<p>x</p>")
    assert a == b  # no RNG anywhere in the writer


def test_http_split_chunked_and_identity():
    chunked = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
        b"5\r\nhello\r\n6\r\n world\r\n0\r\n\r\n"
    )
    assert _split_http(chunked) == (200, b"hello world")
    ident = b"HTTP/1.1 404 Not Found\r\nContent-Length: 3\r\n\r\nabcTRAILING"
    assert _split_http(ident) == (404, b"abc")  # content-length trims trailers
    raw = b"not http at all"
    assert _split_http(raw) == (None, raw)


def test_malformed_framing_raises():
    with pytest.raises(ValueError):
        list(iter_warc_records(b"GARBAGE/1.0\r\nContent-Length: 3\r\n\r\nabc"))
    # truncated body: declared length runs past the payload
    rec = build_response_record(
        "https://x.example/t", datetime(2024, 1, 1, tzinfo=timezone.utc), b"<p>hi</p>"
    )
    with pytest.raises(ValueError):
        list(iter_warc_records(rec[: len(rec) // 2]))


def test_concatenated_gzip_members_stream():
    """Common Crawl layout: each record its own gzip member; the parser
    must stream through member boundaries."""
    ts = datetime(2024, 1, 1, tzinfo=timezone.utc)
    raw = b"".join(
        gzip.compress(
            build_response_record(f"https://x.example/{i}", ts, b"<p>b</p>"), 6, mtime=0
        )
        for i in range(5)
    )
    recs = [r for r in iter_warc_records(raw) if r["warc_type"] == "response"]
    assert [r["url"] for r in recs] == [f"https://x.example/{i}" for i in range(5)]


def test_spark_read_warc_pages(spark, tmp_path):
    """Distributed ingest: sharded .warc.gz -> pages rows, byte-identical
    html, timestamps, and the extraction invariant end-to-end."""
    from pyspark.sql import functions as F

    from mashing_pumpkins_spark.operators.extraction import extracted_text_col

    pages = _pages(40, seed=9)
    write_pages_as_warc(pages, str(tmp_path), n_files=4)
    df = read_warc_pages(spark, str(tmp_path))
    assert df.count() == 40
    got = {r["url"]: r for r in df.collect()}
    for row in pages.to_dict("records"):
        rec = got[row["url"]]
        assert bytes(rec["html"]) == bytes(row["html"])
        assert rec["http_status"] == 200
    # end-to-end: WARC -> html -> extracted text == original text column
    texts = pages.set_index("url")["text"].to_dict()
    ext = {
        r["url"]: r["t"]
        for r in df.select(
            "url", extracted_text_col(F.col("html")).alias("t")
        ).collect()
    }
    assert ext == texts


# --------------------------------------------------------------- WET


def test_wet_roundtrip_gzip_members(tmp_path):
    """write_wet -> iter_warc_records: conversion records carry the text
    bytes VERBATIM (incl. multi-byte UTF-8), refers_to passes through."""
    from mashing_pumpkins_spark.sources.warc import write_wet

    pages = _pages(12).to_dict("records")
    for i, row in enumerate(pages):
        row["text"] = row["text"] + " — naïve café ✓" * (i % 3)
        row["refers_to"] = f"<urn:uuid:ref-{i}>"
    p = str(tmp_path / "f.wet.gz")
    n = write_wet(p, pages)
    assert n == 12
    recs = [r for r in iter_warc_records(open(p, "rb").read())
            if r["warc_type"] == "conversion"]
    assert len(recs) == 12
    by_url = {r["url"]: r for r in recs}
    for i, row in enumerate(pages):
        rec = by_url[row["url"]]
        assert rec["text"] == row["text"]
        assert rec["refers_to"] == f"<urn:uuid:ref-{i}>"
        assert rec["html"] is None and rec["http_status"] is None
        assert rec["record_id"].startswith("<urn:uuid:")


def test_wet_and_response_record_ids_differ():
    from mashing_pumpkins_spark.sources.warc import build_conversion_record

    ts = datetime(2024, 5, 1, tzinfo=timezone.utc)
    resp = build_response_record("https://x.example/a", ts, b"<p>x</p>")
    conv = build_conversion_record("https://x.example/a", ts, b"x")
    rid = lambda raw: [  # noqa: E731
        ln for ln in raw.decode("latin-1").split("\r\n")
        if ln.startswith("WARC-Record-ID")
    ][0]
    assert rid(resp) != rid(conv)
    # determinism
    assert conv == build_conversion_record("https://x.example/a", ts, b"x")


def test_spark_wet_write_read_distributed(spark, tmp_path):
    """The full WET export path: WARC ingest -> extraction -> distributed
    write_wet_files (one file per partition, no shuffle) -> read_wet_pages
    gives back byte-identical text per url."""
    from pyspark.sql import functions as F

    from mashing_pumpkins_spark.operators.extraction import extracted_text_col
    from mashing_pumpkins_spark.sources.warc import read_wet_pages, write_wet_files

    pages = _pages(40, seed=11)
    write_pages_as_warc(pages, str(tmp_path / "warc"), n_files=4)
    read = read_warc_pages(spark, str(tmp_path / "warc"))
    extracted = read.select(
        "url",
        "warc_ts",
        extracted_text_col(F.col("html")).alias("text"),
        F.col("record_id").alias("refers_to"),
    ).repartition(3)
    report = write_wet_files(extracted, str(tmp_path / "wet")).collect()
    assert sum(r.n_records for r in report) == 40
    assert len(report) <= 3 and all(r.path.endswith(".wet.gz") for r in report)
    back = read_wet_pages(spark, str(tmp_path / "wet"))
    got = {r["url"]: r for r in back.collect()}
    texts = pages.set_index("url")["text"].to_dict()
    assert {u: r["text"] for u, r in got.items()} == texts
    # refers_to links the conversion record to its response record
    ids = {r["url"]: r["record_id"] for r in read.collect()}
    assert all(got[u]["refers_to"] == ids[u] for u in texts)


def test_wet_files_empty_partitions_produce_no_file(spark, tmp_path):
    from mashing_pumpkins_spark.sources.warc import write_wet_files

    df = spark.createDataFrame(
        [("u1", datetime(2024, 1, 2), "hello")],
        "url string, warc_ts timestamp, text string",
    ).repartition(4)
    report = write_wet_files(df, str(tmp_path / "wet")).collect()
    assert sum(r.n_records for r in report) == 1
    files = list((tmp_path / "wet").glob("*.wet.gz"))
    assert len(files) == len(report)


def test_wet_warc_date_is_instant_correct_on_non_utc_session(spark, tmp_path):
    """Arrow hands TIMESTAMP columns to pandas as SESSION-LOCAL-naive wall
    times; the writer must not relabel those as UTC. Regression: with a
    New York session timezone an input instant of 12:00Z was written as
    WARC-Date 07:00Z. write_wet_files ships epoch micros instead, so the
    on-disk date and the read-back instant equal the input instant
    regardless of session zone."""
    from datetime import timezone as _tz

    from mashing_pumpkins_spark.sources.warc import read_wet_pages, write_wet_files

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        df = spark.createDataFrame(
            [("u1", datetime(2024, 1, 1, 12, 0, 0, tzinfo=_tz.utc), "hello")],
            "url string, warc_ts timestamp, text string",
        )
        write_wet_files(df, str(tmp_path / "wet")).collect()
        # the on-disk header carries the true instant
        import gzip as _gzip

        blobs = b"".join(
            _gzip.open(p, "rb").read()
            for p in sorted((tmp_path / "wet").glob("*.wet.gz"))
        )
        assert b"WARC-Date: 2024-01-01T12:00:00Z" in blobs
        back = read_wet_pages(spark, str(tmp_path / "wet")).collect()
        got = back[0]["warc_ts"]
        # collected timestamps are session-naive; compare as epoch seconds
        df2 = spark.createDataFrame(
            [(got,)], "ts timestamp"
        ).selectExpr("unix_micros(ts) as us")
        assert df2.first()["us"] == 1704110400_000000
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_wet_null_text_rows_are_skipped_and_plain_writer_raises(spark, tmp_path):
    """write_wet_files drops null-text rows (no conversion record, the CC
    convention); the dict-level write_wet refuses them outright — a
    silent str(None) body would corrupt the byte-identity invariant."""
    import pytest as _pytest

    from mashing_pumpkins_spark.sources.warc import write_wet, write_wet_files

    df = spark.createDataFrame(
        [
            ("u1", datetime(2024, 1, 2), "hello"),
            ("u2", datetime(2024, 1, 2), None),
        ],
        "url string, warc_ts timestamp, text string",
    ).coalesce(1)
    report = write_wet_files(df, str(tmp_path / "wet")).collect()
    assert sum(r.n_records for r in report) == 1
    with _pytest.raises(ValueError, match="non-null text"):
        write_wet(
            str(tmp_path / "x.wet.gz"),
            [{"url": "u", "warc_ts": datetime(2024, 1, 2), "text": None}],
        )
