"""WARC (ISO 28500) reader/writer — the Common Crawl container format.

The north star's input is "Common-Crawl-style web pages"; on a real crawl
those arrive as ``.warc.gz`` files (one gzip member per record, ~1 GB per
file), not parquet. This module supplies the ingest edge:

- :func:`write_warc` — serialize pages (url, warc_ts, html) as WARC
  response records wrapped in HTTP responses, optionally gzip'd per
  record (the Common Crawl layout, which concatenates cleanly and lets a
  sequential reader stream members).
- :func:`iter_warc_records` — pure-stdlib sequential parser: gzip-member
  transparent, WARC header block + Content-Length body framing, HTTP
  response payload split with identity and chunked transfer decodings.
- :func:`read_warc_pages` — the Spark source: ``binaryFile`` scan over a
  path/glob, one Arrow-batched ``mapInPandas`` parse per file, emitting
  (url, warc_ts, html, record_id, http_status). No shuffle; schema
  matches the synthetic/Iceberg ``pages`` table so every downstream
  operator (extraction, sketching, dedup) runs unchanged.

Scale shape: Common Crawl ships ~64k files per crawl at ~1 GB each; the
scan parallelizes per file (binaryFile keeps a file in one task), which
matches how every production WARC job partitions — a 1000-executor
cluster gets 64 files per core with no coordination. Records inside a
file are sequential by format design (gzip members + Content-Length
framing), so per-file is the natural split unit; sizing guidance is to
keep files ~1 GB (the crawl's own convention), not to split within.

Reference parity: the reference's ingest edge is FASTA/FASTQ
(src/sequence.py, parsed in sources/bio.py here); WARC is the equivalent
edge for the web-pages input shape.
"""

from __future__ import annotations

import gzip
import io
from datetime import datetime, timezone
from typing import Iterable, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..hashkernels import xxh64

_CRLF = b"\r\n"

WARC_PAGE_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("record_id", StringType()),
        StructField("http_status", LongType()),
    ]
)


def _record_id(url: str, ts: datetime) -> str:
    """Deterministic urn:uuid built from xxh64 of (url, ts) — reproducible
    corpora, no RNG."""
    h1 = xxh64(url.encode("utf-8"), seed=1)
    h2 = xxh64(url.encode("utf-8") + ts.isoformat().encode(), seed=2)
    hx = f"{h1:016x}{h2:016x}"
    return (
        f"<urn:uuid:{hx[0:8]}-{hx[8:12]}-{hx[12:16]}-{hx[16:20]}-{hx[20:32]}>"
    )


def build_response_record(
    url: str, ts: datetime, html: bytes, status: int = 200
) -> bytes:
    """One WARC/1.0 response record: WARC headers, then an HTTP/1.1
    response as the block, then the mandated two CRLFs."""
    http = (
        f"HTTP/1.1 {status} OK\r\n"
        "Content-Type: text/html; charset=utf-8\r\n"
        f"Content-Length: {len(html)}\r\n\r\n"
    ).encode("ascii") + html
    warc_date = ts.astimezone(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Record-ID: {_record_id(url, ts)}\r\n"
        f"WARC-Date: {warc_date}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        "Content-Type: application/http;msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode("utf-8")  # WARC/1.0 headers are UTF-8 (ISO 28500 §5.1); real
    # crawls carry non-ASCII IRIs in WARC-Target-URI, ascii would raise
    return head + http + _CRLF + _CRLF


def build_conversion_record(
    url: str, ts: datetime, text: bytes, refers_to: Optional[str] = None
) -> bytes:
    """One WARC/1.0 conversion record — the WET (text-only) sibling of a
    response record: Content-Type text/plain, body = the extracted text
    bytes VERBATIM (the byte-identity invariant the north rule pins), an
    optional WARC-Refers-To pointing at the source response record."""
    warc_date = ts.astimezone(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")
    refers = f"WARC-Refers-To: {refers_to}\r\n" if refers_to else ""
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        f"WARC-Record-ID: {_record_id(url + '#wet', ts)}\r\n"
        f"{refers}"
        f"WARC-Date: {warc_date}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        "Content-Type: text/plain\r\n"
        f"Content-Length: {len(text)}\r\n\r\n"
    ).encode("utf-8")  # UTF-8 headers, same rationale as build_response_record
    return head + text + _CRLF + _CRLF


def build_warcinfo_record(ts: datetime, info: str = "software: mashing-pumpkins-spark") -> bytes:
    body = (info + "\r\n").encode("utf-8")
    warc_date = ts.astimezone(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: warcinfo\r\n"
        f"WARC-Record-ID: {_record_id('warcinfo', ts)}\r\n"
        f"WARC-Date: {warc_date}\r\n"
        "Content-Type: application/warc-fields\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("utf-8")
    return head + body + _CRLF + _CRLF


def write_warc(
    path: str,
    pages: Iterable[dict],
    gzip_per_record: bool = True,
    warcinfo: bool = True,
) -> int:
    """Write pages (dicts with url, warc_ts, html) to one WARC file.

    ``gzip_per_record=True`` produces the Common Crawl layout: each record
    its own gzip member, members concatenated — a plain ``.warc``
    otherwise. Returns the record count (excluding warcinfo)."""
    n = 0
    with open(path, "wb") as fh:
        def emit(raw: bytes) -> None:
            fh.write(gzip.compress(raw, 6, mtime=0) if gzip_per_record else raw)

        first_ts = datetime(2024, 1, 1, tzinfo=timezone.utc)
        if warcinfo:
            emit(build_warcinfo_record(first_ts))
        for page in pages:
            ts = page["warc_ts"]
            if isinstance(ts, pd.Timestamp):
                ts = ts.to_pydatetime()
            if ts.tzinfo is None:
                ts = ts.replace(tzinfo=timezone.utc)
            emit(
                build_response_record(
                    page["url"], ts, bytes(page["html"]), status=page.get("status", 200)
                )
            )
            n += 1
    return n


def _dechunk(body: bytes) -> bytes:
    """Decode an HTTP/1.1 chunked transfer body."""
    out = io.BytesIO()
    pos = 0
    while True:
        nl = body.index(_CRLF, pos)
        size_token = body[pos:nl].split(b";", 1)[0]
        size = int(size_token, 16)
        pos = nl + 2
        if size == 0:
            break
        out.write(body[pos : pos + size])
        pos += size + 2  # skip chunk CRLF
    return out.getvalue()


def _split_http(block: bytes) -> tuple[Optional[int], bytes]:
    """Split an HTTP response payload into (status, body bytes)."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0 or not block.startswith(b"HTTP/"):
        return None, block
    head = block[:sep].decode("latin-1")
    body = block[sep + 4 :]
    lines = head.split("\r\n")
    try:
        status = int(lines[0].split(" ")[1])
    except (IndexError, ValueError):
        status = None
    headers = {}
    for ln in lines[1:]:
        if ":" in ln:
            k, v = ln.split(":", 1)
            headers[k.strip().lower()] = v.strip()
    if headers.get("transfer-encoding", "").lower() == "chunked":
        body = _dechunk(body)
    else:
        clen = headers.get("content-length")
        if clen is not None and clen.isdigit():
            body = body[: int(clen)]
    return status, body


def iter_warc_records(payload: bytes) -> Iterator[dict]:
    """Yield records from the bytes of a .warc / .warc.gz file.

    Each dict: warc_type, url, warc_ts, record_id, http_status, html
    (http_status/html only populated for response records). Malformed
    framing raises ValueError — a crawl job routes those files to a
    quarantine path rather than silently dropping records."""
    if payload[:2] == b"\x1f\x8b":
        payload = gzip.decompress(payload)  # concatenated members decode in one pass
    pos = 0
    n = len(payload)
    while pos < n:
        # tolerate inter-record CRLF padding
        while pos < n and payload[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        head_end = payload.find(b"\r\n\r\n", pos)
        if head_end < 0:
            raise ValueError("truncated WARC header block")
        head = payload[pos:head_end].decode("utf-8", errors="replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"bad WARC version line: {lines[0][:40]!r}")
        fields = {}
        for ln in lines[1:]:
            if ":" in ln:
                k, v = ln.split(":", 1)
                fields[k.strip().lower()] = v.strip()
        clen = int(fields["content-length"])
        body = payload[head_end + 4 : head_end + 4 + clen]
        if len(body) != clen:
            raise ValueError("truncated WARC record body")
        pos = head_end + 4 + clen
        rec: dict = {
            "warc_type": fields.get("warc-type"),
            "url": fields.get("warc-target-uri"),
            "record_id": fields.get("warc-record-id"),
            "refers_to": fields.get("warc-refers-to"),
            "warc_ts": None,
            "http_status": None,
            "html": None,
            "text": None,
        }
        date = fields.get("warc-date")
        if date:
            rec["warc_ts"] = datetime.strptime(
                date, "%Y-%m-%dT%H:%M:%SZ"
            ).replace(tzinfo=timezone.utc)
        if rec["warc_type"] == "response":
            status, html = _split_http(body)
            rec["http_status"] = status
            rec["html"] = html
        elif rec["warc_type"] == "conversion":
            # WET record: the block IS the extracted text, bytes verbatim.
            # Invalid UTF-8 in an externally produced WET file must follow
            # the documented malformed-framing contract (ValueError ->
            # quarantine), not leak UnicodeDecodeError past it.
            try:
                rec["text"] = body.decode("utf-8")
            except UnicodeDecodeError as exc:
                raise ValueError(
                    f"conversion record body is not valid UTF-8 "
                    f"(url={rec['url']!r}): {exc}"
                ) from exc
        yield rec


def read_warc_pages(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC ingest: binaryFile scan (one file per task — the
    Common Crawl partitioning unit) -> mapInPandas parse -> pages rows.

    Only response records are emitted; warcinfo/request/metadata are
    skipped. Output schema lines up with the synthetic/Iceberg pages
    table: (url, warc_ts, html, record_id, http_status)."""
    files = spark.read.format("binaryFile").load(path).select("content")

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("url", "warc_ts", "html", "record_id", "http_status")}
            for payload in pdf["content"]:
                for rec in iter_warc_records(bytes(payload)):
                    if rec["warc_type"] != "response":
                        continue
                    rows["url"].append(rec["url"])
                    rows["warc_ts"].append(rec["warc_ts"])
                    rows["html"].append(rec["html"])
                    rows["record_id"].append(rec["record_id"])
                    rows["http_status"].append(rec["http_status"])
            yield pd.DataFrame(rows)

    return files.mapInPandas(_parse, WARC_PAGE_SCHEMA)


WET_PAGE_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("text", StringType()),
        StructField("record_id", StringType()),
        StructField("refers_to", StringType()),
    ]
)


def write_wet(
    path: str,
    pages: Iterable[dict],
    gzip_per_record: bool = True,
    warcinfo: bool = True,
) -> int:
    """Write pages (dicts with url, warc_ts, text, optional refers_to) to
    one WET file — conversion records whose body is the extracted text
    UTF-8 bytes verbatim. Same container conventions as write_warc
    (per-record gzip members, leading warcinfo). Returns the record
    count (excluding warcinfo). Naive warc_ts values are taken as UTC
    instants; a null text raises — a silently-written "None" body would
    break the byte-identity invariant (callers that can hold nulls must
    filter first, as write_wet_files does)."""
    n = 0
    with open(path, "wb") as fh:
        def emit(raw: bytes) -> None:
            fh.write(gzip.compress(raw, 6, mtime=0) if gzip_per_record else raw)

        first_ts = datetime(2024, 1, 1, tzinfo=timezone.utc)
        if warcinfo:
            emit(build_warcinfo_record(first_ts, "software: mashing-pumpkins-spark\r\nformat: WARC conversion (WET)"))
        for page in pages:
            if page["text"] is None:
                raise ValueError(
                    f"WET conversion record needs non-null text (url={page.get('url')!r})"
                )
            ts = page["warc_ts"]
            if isinstance(ts, pd.Timestamp):
                ts = ts.to_pydatetime()
            if ts.tzinfo is None:
                ts = ts.replace(tzinfo=timezone.utc)
            emit(
                build_conversion_record(
                    page["url"],
                    ts,
                    str(page["text"]).encode("utf-8"),
                    refers_to=page.get("refers_to"),
                )
            )
            n += 1
    return n


def _distributed_container_export(
    pages: DataFrame,
    out_dir: str,
    ext: str,
    select_cols: list,
    row_to_page,
    file_writer,
) -> DataFrame:
    """Shared machinery for write_wet_files / write_warc_files: one
    container file per input partition via mapInPandas, streamed batch by
    batch (a partition is never materialized), with a task-commit
    protocol — each attempt writes an attempt-unique ._tmp name and
    atomically renames on success, so speculative/retried attempts never
    interleave and a killed job leaves only ._tmp files, never a partial
    output indistinguishable from a complete one."""
    import itertools
    import pathlib

    pathlib.Path(out_dir).mkdir(parents=True, exist_ok=True)
    out_schema = StructType(
        [StructField("path", StringType()), StructField("n_records", LongType())]
    )

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import os

        from pyspark import TaskContext

        tc = TaskContext.get()
        pid = tc.partitionId()
        path = str(pathlib.Path(out_dir) / f"part-{pid:05d}.{ext}")
        tmp_path = f"{path}._tmp-attempt-{tc.attemptNumber()}-{tc.taskAttemptId()}"

        def gen() -> Iterator[dict]:
            for pdf in batches:
                ts = pd.to_datetime(pdf["_ts_us"], unit="us", utc=True)
                for i in range(len(pdf)):
                    yield row_to_page(pdf, i, ts)

        it = gen()
        try:
            first = next(it)
        except StopIteration:
            yield pd.DataFrame({"path": [], "n_records": []}).astype(
                {"path": "string", "n_records": "int64"}
            )
            return
        try:
            n = file_writer(tmp_path, itertools.chain([first], it))
            os.replace(tmp_path, path)
        except BaseException:
            try:
                os.unlink(tmp_path)
            except OSError:
                pass
            raise
        yield pd.DataFrame({"path": [path], "n_records": [n]})

    return pages.select(*select_cols).mapInPandas(_write, out_schema)


def write_warc_files(
    pages: DataFrame, out_dir: str, gzip_per_record: bool = True
) -> DataFrame:
    """Distributed WARC export: one .warc(.gz) file per input partition —
    response records wrapping each (url, warc_ts, html) page. Input
    columns: url, warc_ts (TIMESTAMP instant), html (binary), optional
    http_status. Returns a (path, n_records) DataFrame; empty partitions
    produce no file. Same no-shuffle / task-commit / JVM-epoch-micros
    contract as write_wet_files (see that docstring); repartition
    upstream to pick file count (Common Crawl convention ~1 GB/file)."""
    from pyspark.sql.types import TimestampNTZType

    if isinstance(pages.schema["warc_ts"].dataType, TimestampNTZType):
        raise TypeError(
            "write_warc_files needs an instant (TIMESTAMP) warc_ts column; "
            "convert TIMESTAMP_NTZ explicitly before exporting"
        )
    has_status = "http_status" in pages.columns
    cols = [
        F.col("url"),
        F.unix_micros(F.col("warc_ts")).alias("_ts_us"),
        F.col("html"),
    ] + ([F.col("http_status")] if has_status else [])

    def row_to_page(pdf: pd.DataFrame, i: int, ts) -> dict:
        rec = {
            "url": pdf["url"].iat[i],
            "warc_ts": ts.iat[i],
            "html": bytes(pdf["html"].iat[i]),
        }
        if has_status:
            rec["status"] = int(pdf["http_status"].iat[i])
        return rec

    def file_writer(path: str, pages_iter: Iterator[dict]) -> int:
        return write_warc(path, pages_iter, gzip_per_record=gzip_per_record)

    return _distributed_container_export(
        pages.where(F.col("html").isNotNull()),
        out_dir,
        "warc.gz" if gzip_per_record else "warc",
        cols,
        row_to_page,
        file_writer,
    )


def write_wet_files(
    pages: DataFrame, out_dir: str, gzip_per_record: bool = True
) -> DataFrame:
    """Distributed WET export: one .wet(.gz) file per input partition via
    mapInPandas (the Common Crawl layout — files are the parallelism
    unit on both write and read). Input columns: url, warc_ts, text,
    optional refers_to. Returns a (path, n_records) DataFrame; empty
    partitions produce no file. Rows with null text are skipped (no
    conversion record — the CC convention for pages with no extractable
    text). warc_ts ships to the workers as JVM-computed epoch
    microseconds, NOT as a pandas timestamp: Arrow delivers TIMESTAMP
    columns to pandas as SESSION-LOCAL-naive wall times, which the
    writer would then mislabel as UTC on any non-UTC session.

    Scale shape: no shuffle — each task streams its partition batch by
    batch straight to its own file (never materializing the partition);
    re-partition upstream to choose file count/size (CC WET shards are
    ~150 MB compressed)."""
    from pyspark.sql.types import TimestampNTZType

    if isinstance(pages.schema["warc_ts"].dataType, TimestampNTZType):
        raise TypeError(
            "write_wet_files needs an instant (TIMESTAMP) warc_ts column; "
            "convert TIMESTAMP_NTZ explicitly (state which zone the naive "
            "values are in) before exporting"
        )
    has_refers = "refers_to" in pages.columns
    cols = [
        F.col("url"),
        F.unix_micros(F.col("warc_ts")).alias("_ts_us"),
        F.col("text"),
    ] + ([F.col("refers_to")] if has_refers else [])

    def row_to_page(pdf: pd.DataFrame, i: int, ts) -> dict:
        rec = {
            "url": pdf["url"].iat[i],
            "warc_ts": ts.iat[i],
            "text": pdf["text"].iat[i],
        }
        if has_refers:
            rec["refers_to"] = pdf["refers_to"].iat[i]
        return rec

    def file_writer(path: str, pages_iter: Iterator[dict]) -> int:
        return write_wet(path, pages_iter, gzip_per_record=gzip_per_record)

    return _distributed_container_export(
        pages.where(F.col("text").isNotNull()),
        out_dir,
        "wet.gz" if gzip_per_record else "wet",
        cols,
        row_to_page,
        file_writer,
    )


def read_wet_pages(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WET ingest, mirror of read_warc_pages: binaryFile scan
    -> mapInPandas parse -> (url, warc_ts, text, record_id, refers_to);
    only conversion records are emitted."""
    files = spark.read.format("binaryFile").load(path).select("content")

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("url", "warc_ts", "text", "record_id", "refers_to")}
            for payload in pdf["content"]:
                for rec in iter_warc_records(bytes(payload)):
                    if rec["warc_type"] != "conversion":
                        continue
                    for k in rows:
                        rows[k].append(rec[k])
            yield pd.DataFrame(rows)

    return files.mapInPandas(_parse, WET_PAGE_SCHEMA)


def write_pages_as_warc(
    pages: pd.DataFrame, out_dir: str, n_files: int = 4, gzip_per_record: bool = True
) -> list[str]:
    """Shard a pages frame into n_files .warc.gz files (round-robin by
    position — deterministic). Test/fixture helper; a production export
    would write per-partition via foreachPartition."""
    import pathlib

    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    ext = "warc.gz" if gzip_per_record else "warc"
    paths = [str(out / f"part-{i:04d}.{ext}") for i in range(n_files)]
    shards: list[list[dict]] = [[] for _ in range(n_files)]
    for i, row in enumerate(pages.to_dict("records")):
        shards[i % n_files].append(row)
    for p, shard in zip(paths, shards):
        write_warc(p, shard, gzip_per_record=gzip_per_record)
    return paths
