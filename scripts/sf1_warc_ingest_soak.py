"""sf1 WARC-ingest soak (round-7, VERDICT item 5): the production
pipeline's STAGE 1 — raw .warc.gz -> pages — has only ever run on
8-shard/500-page fixtures; every prior soak started from parquet. This
script exercises the full ingest edge at ~1M pages:

  1. build: render the synthetic corpus to HTML (Arrow-batched Column
     renderer) and export it DISTRIBUTED as N .warc.gz shards via
     write_warc_files (per-record gzip members, warcinfo, HTTP framing,
     task-commit protocol) — this also soaks the round-7 distributed
     WARC writer itself;
  2. ingest (the timed leg): binaryFile scan -> mapInPandas WARC parse
     (read_warc_pages) -> HTML text extraction -> pages parquet; MB/s is
     reported over the on-disk compressed WARC bytes (the number a crawl
     budget uses) and over decompressed record bytes;
  3. byte-identity spot-check: a deterministic ~0.5% url sample joins
     the ingested-and-extracted text against the source corpus text —
     md5 equality per url (the north rule's byte-identical-text-per-url
     invariant, end to end through render -> WARC -> parse -> extract);
  4. funnel: the round-6 gated curation funnel runs on the ingested
     table, confirming stage 1 output drives the downstream pipeline
     unchanged.

Usage: python scripts/sf1_warc_ingest_soak.py [--pages 1000000]
       [--cpus 16] [--files 64] [--workdir /tmp/sf1_warc]
Writes one JSON line at the end; record it in BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sf1_funnel_soak import BLOCKED_HOSTS, WEIGHTS, _robots_bodies  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--files", type=int, default=64)
    ap.add_argument("--workdir", default="/tmp/sf1_warc")
    ap.add_argument("--corpus-workdir", default="/tmp/sf1_soak",
                    help="shares the near-dup soak's generated corpus")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from mashing_pumpkins_spark.operators.curation import curation_funnel
    from mashing_pumpkins_spark.operators.extraction import (
        extracted_text_col,
        rendered_html_col,
    )
    from mashing_pumpkins_spark.sources.robots import parse_robots
    from mashing_pumpkins_spark.sources.synthetic import write_pages_parquet
    from mashing_pumpkins_spark.sources.warc import read_warc_pages, write_warc_files

    import bench as bench_mod

    hw_probe = {"1": bench_mod._hw_probe(1), "4": bench_mod._hw_probe(4)}

    corpus_dir = os.path.join(args.corpus_workdir, f"pages_{args.pages}")
    if not os.path.exists(os.path.join(corpus_dir, "pages.parquet")):
        print(f"generating {args.pages} pages ...", flush=True)
        write_pages_parquet(corpus_dir, args.pages, seed=42)

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(4 * args.cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "4m")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    src = spark.read.parquet(os.path.join(corpus_dir, "pages.parquet")).select(
        "url", "text"
    )

    # ---- 1. distributed WARC export (fixture build; timed separately) ----
    warc_dir = os.path.join(args.workdir, "warc")
    os.makedirs(args.workdir, exist_ok=True)
    t0 = time.monotonic()
    if not glob.glob(os.path.join(warc_dir, "*.warc.gz")):
        pages_for_export = src.select(
            "url",
            F.timestamp_seconds(
                F.lit(1704067200) + (F.crc32(F.col("url")) % 31536000)
            ).alias("warc_ts"),
            rendered_html_col(F.col("text"), F.col("url")).alias("html"),
        ).repartition(args.files)
        written = write_warc_files(pages_for_export, warc_dir).collect()
        n_written = int(sum(r["n_records"] for r in written))
    else:
        n_written = None  # reused from a previous run
    build_sec = time.monotonic() - t0
    warc_files = sorted(glob.glob(os.path.join(warc_dir, "*.warc.gz")))
    warc_bytes = sum(os.path.getsize(p) for p in warc_files)

    # ---- 2. timed ingest: WARC parse -> extract -> pages parquet ---------
    pages_out = os.path.join(args.workdir, "pages_ingested")
    t0 = time.monotonic()
    ingested = read_warc_pages(spark, warc_dir).select(
        "url",
        "warc_ts",
        extracted_text_col(F.col("html")).alias("text"),
        F.octet_length("html").alias("html_bytes"),
    )
    ingested.write.mode("overwrite").parquet(pages_out)
    ingest_sec = time.monotonic() - t0
    pages_tbl = spark.read.parquet(pages_out)
    n_ingested = pages_tbl.count()
    html_bytes = pages_tbl.agg(F.sum("html_bytes")).first()[0]

    # ---- 3. byte-identity spot-check vs the source corpus ----------------
    sample_pred = F.conv(F.substring(F.md5("url"), 1, 8), 16, 10).cast(
        "bigint"
    ) % 200 == 7
    sample = (
        pages_tbl.where(sample_pred)
        .select("url", F.md5(F.col("text").cast("binary")).alias("got"))
        .join(
            src.where(sample_pred).select(
                "url", F.md5(F.col("text").cast("binary")).alias("want")
            ),
            "url",
            "full_outer",
        )
    )
    mismatches = sample.where(
        F.col("got").isNull()
        | F.col("want").isNull()
        | (F.col("got") != F.col("want"))
    ).count()
    sample_n = sample.count()

    # ---- 4. gated funnel straight off the ingested table -----------------
    robots_rules = parse_robots(_robots_bodies(spark)).persist()
    robots_rules.count()
    t0 = time.monotonic()
    funnel, _surv = curation_funnel(
        pages_tbl.select("url", "text"),
        None,
        id_col="url",
        text_col="text",
        url_col="url",
        blocked_hosts=BLOCKED_HOSTS,
        blocked_path_terms=["00"],
        robots_rules=robots_rules,
        agent="trainbot",
        classifier_weights=WEIGHTS,
        classifier_min=0,
    )
    report = [r.asDict() for r in funnel.collect()]
    funnel_sec = time.monotonic() - t0

    result = {
        "metric": "sf1_warc_ingest_soak",
        "pages": args.pages,
        "cpus": args.cpus,
        "hw_probe_mb_per_sec": hw_probe,
        "warc_files": len(warc_files),
        "warc_bytes_compressed": int(warc_bytes),
        "warc_export_sec": round(build_sec, 1) if n_written is not None else None,
        "warc_records_written": n_written,
        "ingest_sec": round(ingest_sec, 1),
        "ingested_pages": int(n_ingested),
        "html_bytes": int(html_bytes),
        "ingest_mb_per_sec_compressed": round(warc_bytes / 1e6 / ingest_sec, 2),
        "ingest_mb_per_sec_html": round(html_bytes / 1e6 / ingest_sec, 2),
        "ingest_docs_per_sec": round(n_ingested / ingest_sec, 1),
        "byte_identity_sample": int(sample_n),
        "byte_identity_mismatches": int(mismatches),
        "funnel_report_sec": round(funnel_sec, 1),
        "funnel": report,
    }
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
