"""Common Crawl CDX(J) index parsing — the fetch-planning input.

A crawl's CDX index is line-oriented: `SURT timestamp {json}` per
capture, sorted by SURT so per-site scans are range scans. Fetch
planning (which captures to pull from which WARC file at which offset)
reads this index, not the archives. `parse_cdx` turns raw index lines
into a typed table in pure Column algebra: two bounded splits plus
`get_json_object` field extraction — JVM-side, scan speed, and every
extraction is replayable in ANSI SQL (json_extract_string), so the
driver gate value-checks it.

Malformed lines (fewer than three fields, or non-numeric
status/length) yield nulls in the affected columns rather than failing
the scan — index files from the wild contain the occasional torn line,
and a fetch planner drops them with a `where` instead of dying."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_cdx(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """raw index lines -> (surt, ts_raw, dt, url, status, mime, digest,
    length, warc_filename, warc_offset). `dt` is the yyyyMMdd prefix of
    the 14-digit timestamp — the natural partition key for a
    date-partitioned index store (partition pruning on `dt` makes
    point-in-time queries touch one day's files)."""
    parts = F.split(F.col(line_col), " ", 3)
    surt = F.try_element_at(parts, F.lit(1))
    ts = F.try_element_at(parts, F.lit(2))
    js = F.try_element_at(parts, F.lit(3))
    return lines.select(
        surt.alias("surt"),
        ts.alias("ts_raw"),
        F.when(ts.rlike(r"^\d{14}$"), F.substring(ts, 1, 8)).alias("dt"),
        F.get_json_object(js, "$.url").alias("url"),
        F.get_json_object(js, "$.status").try_cast("int").alias("status"),
        F.get_json_object(js, "$.mime").alias("mime"),
        F.get_json_object(js, "$.digest").alias("digest"),
        F.get_json_object(js, "$.length").try_cast("bigint").alias("length"),
        F.get_json_object(js, "$.filename").alias("warc_filename"),
        F.get_json_object(js, "$.offset").try_cast("bigint").alias("warc_offset"),
    )

def dedup_index(cdx: DataFrame) -> DataFrame:
    """Collapse a CDX index to unique content per URL — the crawl-side
    dedup tier that runs BEFORE any page is fetched: Common Crawl
    records a recrawl of byte-identical content as a revisit of an
    earlier capture (same content digest), and point-in-time fetch
    planning wants only the LATEST capture of each SURT.  One output
    row per (surt, digest): the capture count collapsed into it, the
    first/last capture timestamps, how many were revisits (later
    same-digest recrawls = fetches a deduplicating crawler skips), and
    whether this digest is the surt's CURRENT content (the digest of
    the most recent capture, ties to the larger digest string).

    Scale shape: two map-side-combinable aggregates — groupBy
    (surt, digest) then a surt-keyed winner via max(struct(last_ts,
    digest)) (the Window-free winner discipline of robots.py) — joined
    back on surt.  No window over raw captures: a hot URL recrawled
    millions of times costs its group one combined row, not a
    single-task sort."""
    g = cdx.groupBy("surt", "digest").agg(
        F.min("ts_raw").alias("first_ts"),
        F.max("ts_raw").alias("last_ts"),
        F.count(F.lit(1)).alias("n_captures"),
    )
    latest = g.groupBy("surt").agg(
        F.max(F.struct(F.col("last_ts"), F.col("digest"))).alias("_w")
    )
    return (
        g.join(latest, "surt")
        .select(
            "surt",
            "digest",
            "first_ts",
            "last_ts",
            "n_captures",
            (F.col("n_captures") - F.lit(1)).alias("n_revisits"),
            (F.col("digest") == F.col("_w")["digest"]).alias("is_latest"),
        )
    )
