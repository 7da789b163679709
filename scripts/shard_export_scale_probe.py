"""1M-doc scale probe for the training-shard export writer
(sources/training_export.py) — the round-7 terminal pipeline stage, on
the same sf1 soak corpus as the other 1M probes.

Measures the full write leg (ONE shard_id shuffle + partition-local
sort + streaming gzip-JSONL writer with task-commit) and the read-back
leg (schema-pinned spark.read.json over the .gz shards), then checks:
- manifest totals == input count,
- every shard file routed correctly (file-name shard_id == md5 bucket
  for a deterministic ~0.5% url sample),
- the read-back (url, text) pairs byte-identical to the source for the
  same sample (full-outer join, so drops/orphans count).

Usage: python scripts/shard_export_scale_probe.py [--pages 1000000]
       [--cpus 16] [--shards 64] [--workdir /tmp/sf1_soak]
Writes one JSON line at the end; record it in BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument("--workdir", default="/tmp/sf1_soak")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    import bench as bench_mod
    from mashing_pumpkins_spark.sources.training_export import (
        read_training_shards,
        write_training_shards,
    )
    from mashing_pumpkins_spark.sources.synthetic import write_pages_parquet

    hw_probe = {"1": bench_mod._hw_probe(1), "4": bench_mod._hw_probe(4)}
    corpus_dir = os.path.join(args.workdir, f"pages_{args.pages}")
    if not os.path.exists(os.path.join(corpus_dir, "pages.parquet")):
        print(f"generating {args.pages} pages ...", flush=True)
        write_pages_parquet(corpus_dir, args.pages, seed=42)
    out_dir = os.path.join(args.workdir, f"shards_{args.pages}_{args.shards}")
    shutil.rmtree(out_dir, ignore_errors=True)

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
    pages = spark.read.parquet(os.path.join(corpus_dir, "pages.parquet")).select(
        "url", "text", "lang"
    )

    t0 = time.monotonic()
    report = write_training_shards(
        pages, out_dir, n_shards=args.shards, seed=7, meta_cols=["lang"]
    ).collect()
    write_sec = time.monotonic() - t0
    n_docs = sum(r.n_docs for r in report)
    n_bytes = sum(r.n_bytes for r in report)
    gz_bytes = sum(
        os.path.getsize(os.path.join(out_dir, f))
        for f in os.listdir(out_dir)
        if f.endswith(".jsonl.gz")
    )

    # read-back leg + sample byte-identity vs the source (~0.5%)
    t0 = time.monotonic()
    back = read_training_shards(spark, out_dir).withColumn(
        "file_sid",
        F.regexp_extract(F.input_file_name(), r"shard-(\d+)\.jsonl\.gz", 1).cast(
            "int"
        ),
    )
    sample_pred = (
        F.conv(F.substring(F.md5(F.col("url")), 1, 8), 16, 10).cast("long") % 200
        == 7
    )
    joined = (
        back.where(sample_pred)
        .select("url", F.col("text").alias("text_b"), "file_sid")
        .join(
            pages.where(sample_pred).select("url", "text"),
            on="url",
            how="full_outer",
        )
        .select(
            F.count(F.lit(1)).alias("sample_rows"),
            F.sum(
                (
                    F.col("text_b").isNull()
                    | F.col("text").isNull()
                    | (F.col("text_b") != F.col("text"))
                ).cast("int")
            ).alias("mismatches"),
            F.sum(
                (
                    F.col("file_sid")
                    != F.conv(
                        F.substring(
                            F.md5(F.concat(F.lit("shard:7:"), F.col("url"))), 1, 8
                        ),
                        16,
                        10,
                    ).cast("long")
                    % args.shards
                ).cast("int")
            ).alias("misrouted"),
        )
        .collect()[0]
    )
    read_sec = time.monotonic() - t0

    result = {
        "pages": args.pages,
        "cpus": args.cpus,
        "n_shards": args.shards,
        "hw_probe_mb_per_sec": hw_probe,
        "write_sec": round(write_sec, 1),
        "write_docs_per_sec": round(n_docs / write_sec, 1),
        "write_mb_per_sec_json": round(n_bytes / write_sec / 1e6, 2),
        "manifest_docs": n_docs,
        "json_bytes": n_bytes,
        "gz_bytes": gz_bytes,
        "read_and_check_sec": round(read_sec, 1),
        "sample_rows": int(joined["sample_rows"]),
        "sample_text_mismatches": int(joined["mismatches"] or 0),
        "sample_misrouted": int(joined["misrouted"] or 0),
    }
    print(json.dumps(result))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
