#!/usr/bin/env python
"""spark-submit entry point for the near-duplicate pipeline.

Cluster usage (the north-star deployment shape):

    spark-submit --py-files mashing_pumpkins_spark.zip \\
        scripts/run_pipeline.py \\
        --pages /data/pages_parquet_or_iceberg_path \\
        --checkpoint-dir /data/ckpt/run1 \\
        --output /data/clusters \\
        --nsize 21 --maxsize 256 --bands 32 --rows 8 --tau 0.8

Sandbox smoke: spark-submit --master local[8] scripts/run_pipeline.py ...
The job is resumable: rerunning with the same config and checkpoint dir
skips committed stages.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="input pages parquet path")
    ap.add_argument("--checkpoint-dir", required=True)
    ap.add_argument("--output", required=True, help="clusters output parquet path")
    ap.add_argument("--nsize", type=int, default=21)
    ap.add_argument("--maxsize", type=int, default=256)
    ap.add_argument("--hash", default="xxh64", choices=["xxh64", "mmh3_x64_128_low64"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--bands", type=int, default=None,
                    help="LSH bands; omit BOTH --bands/--rows for the adaptive default")
    ap.add_argument("--rows", type=int, default=None)
    ap.add_argument("--tau", type=float, default=0.8)
    ap.add_argument("--band-group-cap", type=int, default=2000)
    ap.add_argument(
        "--shard-chunk-bytes",
        type=int,
        default=0,
        help="sketch docs larger than this as overlapping chunks and merge "
        "(bounds per-task input for outlier pages; 0 = off)",
    )
    ap.add_argument(
        "--text-source",
        default="column",
        choices=["column", "html"],
        help="'column' trusts the stored text column; 'html' runs the "
        "native HTML extractor on the html column (raw-WARC ingest shape)",
    )
    ap.add_argument(
        "--normalize",
        default="none",
        choices=["none", "nfc", "nfkc"],
        help="Unicode-normalize text before hashing (raw-crawl ingest: "
        "composed vs decomposed variants otherwise defeat dedup)",
    )
    ap.add_argument(
        "--line-dedup-min-len",
        type=int,
        default=0,
        help="C4 corpus-wide line dedup inside extract: lines >= this "
        "many chars keep only their first occurrence (0 = off)",
    )
    ap.add_argument(
        "--canonical",
        default="none",
        choices=["none", "dna_rc"],
        help="pre-hash window canonicalization (dna_rc = MASH canonical k-mers)",
    )
    ap.add_argument(
        "--finalize",
        metavar="PATH",
        default=None,
        help="also write the dedup deliverable (per-page cluster_id, "
        "elected rep_url, kept flag) to PATH; downstream reads "
        "WHERE kept for the deduplicated corpus",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from mashing_pumpkins_spark.config import PipelineConfig, SketchConfig
    from mashing_pumpkins_spark.plans.pipeline import run_pipeline

    spark = SparkSession.builder.appName("mp-spark-near-dup").getOrCreate()
    cfg = PipelineConfig(
        sketch=SketchConfig(
            nsize=args.nsize,
            maxsize=args.maxsize,
            hash_name=args.hash,
            seed=args.seed,
            canonical=args.canonical,
        ),
        n_bands=args.bands,
        rows_per_band=args.rows,
        jaccard_threshold=args.tau,
        band_group_cap=args.band_group_cap,
        shard_chunk_bytes=args.shard_chunk_bytes,
        text_source=args.text_source,
        normalize=args.normalize,
        line_dedup_min_len=args.line_dedup_min_len,
    )
    pages = spark.read.parquet(args.pages)
    clusters, report = run_pipeline(spark, pages, cfg, args.checkpoint_dir)
    clusters.write.mode("overwrite").parquet(args.output)
    if args.finalize:
        from pyspark.sql import functions as F

        from mashing_pumpkins_spark.operators.cluster_report import finalize_dedup

        committed = spark.read.parquet(args.output)
        text_col = "text"
        if cfg.text_source == "html":
            # election scores come from payload size when text is derived
            # downstream of raw html (avoids re-running the extractor)
            final = finalize_dedup(
                committed, pages, text_col="html",
                score=F.octet_length(F.col("html")),
            )
        else:
            final = finalize_dedup(committed, pages, text_col=text_col)
        final.write.mode("overwrite").parquet(args.finalize)
        n_kept = spark.read.parquet(args.finalize).filter("kept").count()
        out = report.to_dict()
        out["finalize_kept"] = n_kept
        print(json.dumps(out))
    else:
        print(json.dumps(report.to_dict()))
    spark.stop()


if __name__ == "__main__":
    main()
