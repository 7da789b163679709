#!/usr/bin/env python
"""spark-submit entry point for raw-crawl ingest: WARC -> pages table.

Completes the north-star data path ahead of the near-dup pipeline:

    .warc.gz files  --read_warc_pages-->  (url, warc_ts, html, ...)
                    --extract_text----->  + text (byte-identity invariant)
                    --write------------>  pages parquet / Iceberg table

Cluster usage:

    spark-submit --py-files mashing_pumpkins_spark.zip \\
        scripts/run_ingest.py \\
        --warc /data/crawl/segments/ \\
        --output /data/pages \\
        [--main-content] [--iceberg-table lake.pages] \\
        [--wet /data/wet_out [--wet-files 64]]

Scale shape: the WARC scan parallelizes one ~1 GB file per task (the
crawl's own partitioning unit); extraction is an Arrow-batched pandas
UDF — the whole job is a single shuffle-free scan->parse->project->write.
The report prints per-run row counts including how many payloads failed
strict UTF-8 decode (nulled, kept with text=null for quarantine queries).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warc", required=True, help="path/glob of .warc[.gz] files")
    ap.add_argument("--output", required=True, help="pages output path (parquet)")
    ap.add_argument(
        "--iceberg-table",
        default=None,
        help="write to this Iceberg table instead of parquet (needs the "
        "iceberg-spark-runtime jar + catalog conf, as in plans/iceberg.py)",
    )
    ap.add_argument(
        "--main-content",
        action="store_true",
        help="strip link-dense boilerplate blocks (extract_main_text) "
        "instead of full visible-text extraction",
    )
    ap.add_argument(
        "--wet",
        default=None,
        help="also export the extracted text as Common-Crawl-style WET "
        "(.wet.gz conversion records, one file per partition; each record "
        "WARC-Refers-To its source response record)",
    )
    ap.add_argument(
        "--wet-files",
        type=int,
        default=0,
        help="repartition to this many WET files (0 = keep scan partitioning)",
    )
    ap.add_argument(
        "--lang-default",
        default=None,
        help="optional constant lang column value (crawl-level metadata)",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from mashing_pumpkins_spark.operators.extraction import (
        extracted_text_col,
        main_text_col,
    )
    from mashing_pumpkins_spark.sources.warc import read_warc_pages

    spark = SparkSession.builder.appName("mp-spark-warc-ingest").getOrCreate()
    pages = read_warc_pages(spark, args.warc)
    text = (
        main_text_col(F.col("html"))
        if args.main_content
        else extracted_text_col(F.col("html"))
    )
    out = pages.select(
        "url",
        "warc_ts",
        "html",
        text.alias("text"),
        (
            F.lit(args.lang_default)
            if args.lang_default
            else F.lit(None).cast("string")
        ).alias("lang"),
        "record_id",
        "http_status",
    )
    if args.iceberg_table:
        out.writeTo(args.iceberg_table).createOrReplace()
        written = spark.table(args.iceberg_table)
    else:
        out.write.mode("overwrite").parquet(args.output)
        written = spark.read.parquet(args.output)
    wet_report = None
    if args.wet:
        # export from the MATERIALIZED pages table (no second WARC parse)
        from mashing_pumpkins_spark.sources.warc import write_wet_files

        wet_in = written.select(
            "url", "warc_ts", "text", F.col("record_id").alias("refers_to")
        ).where(F.col("text").isNotNull())
        if args.wet_files > 0:
            wet_in = wet_in.repartition(args.wet_files)
        wr = write_wet_files(wet_in, args.wet).agg(
            F.count("*").alias("files"), F.sum("n_records").alias("records")
        ).first()
        wet_report = {"files": wr["files"], "records": wr["records"], "path": args.wet}
    stats = written.agg(
        F.count("*").alias("rows"),
        F.sum(F.col("text").isNull().cast("long")).alias("null_text_rows"),
        F.sum(F.octet_length("html")).alias("html_bytes"),
    ).first()
    print(
        json.dumps(
            {
                "rows": stats["rows"],
                "null_text_rows": stats["null_text_rows"],
                "html_bytes": stats["html_bytes"],
                "output": args.iceberg_table or args.output,
                "main_content": bool(args.main_content),
                "wet": wet_report,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
