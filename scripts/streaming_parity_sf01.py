"""sf0.1 streaming-curation parity check (round-7, VERDICT item 7).

streaming/curation_stream.py has batch-parity UNIT tests (3-row
fixtures); this script runs the same admission gate over the full sf0.1
documents corpus STREAMED in >= 3 micro-batches (file source,
maxFilesPerTrigger=1, one input file per batch) and asserts row-for-row
and count-for-count equality with the batch operators the gate mirrors:

  quality_ok   == gopher_rules(...).keep
  contaminated == decontaminate_bloom(...).contaminated
  admitted     == quality_ok AND NOT contaminated

The comparison is a FULL OUTER join on url, so dropped or duplicated
rows across micro-batch boundaries count as mismatches too — the gate
must be exactly-once over the whole corpus, not just flag-compatible on
the rows it happens to emit. The benchmark split mirrors the
decontamination gate queries (doc_id % 10 == 0 held out).

Usage: python scripts/streaming_parity_sf01.py [--sf-dir /root/testdata/sf0.1]
       [--cpus 16] [--microbatches 8] [--workdir /tmp/stream_parity]
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
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--microbatches", type=int, default=8)
    ap.add_argument("--workdir", default="/tmp/stream_parity")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from mashing_pumpkins_spark.operators.corpus import (
        decontaminate_bloom,
        gopher_rules,
    )
    from mashing_pumpkins_spark.streaming.curation_stream import streaming_admission

    shutil.rmtree(args.workdir, ignore_errors=True)
    os.makedirs(args.workdir)
    in_dir = os.path.join(args.workdir, "in")
    out_dir = os.path.join(args.workdir, "out")
    ckpt_dir = os.path.join(args.workdir, "ckpt")

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(2 * args.cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1m")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    docs = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))
    benchmark = docs.where(F.col("doc_id") % 10 == 0).select("doc_id", "text")
    train = (
        docs.where(F.col("doc_id") % 10 != 0)
        .select(F.col("doc_id").cast("string").alias("url"), "text")
    )
    # one parquet file per requested micro-batch: maxFilesPerTrigger=1
    # turns each file into its own trigger under availableNow
    train.repartition(args.microbatches).write.mode("overwrite").parquet(in_dir)
    n_files = len(
        [f for f in os.listdir(in_dir) if f.endswith(".parquet")]
    )

    t0 = time.time()
    stream = (
        spark.readStream.schema("url string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    gated = streaming_admission(stream, benchmark, n=4)
    q = (
        gated.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    stream_wall = time.time() - t0
    batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
    n_batches = len(batches)

    streamed = spark.read.parquet(out_dir)

    # batch-side replay of the identical gates
    t1 = time.time()
    quality = gopher_rules(train, id_col="url").select(
        "url", F.coalesce(F.col("keep"), F.lit(False)).alias("b_quality_ok")
    )
    contam = decontaminate_bloom(train, benchmark, n=4, id_col="url").select(
        "url", (F.col("contaminated") == 1).alias("b_contaminated")
    )
    batch_flags = quality.join(contam, "url").withColumn(
        "b_admitted", F.col("b_quality_ok") & ~F.col("b_contaminated")
    )

    joined = streamed.join(batch_flags, "url", "full_outer").select(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (
                F.col("quality_ok").isNull()
                | F.col("b_quality_ok").isNull()
                | (F.col("quality_ok") != F.col("b_quality_ok"))
                | (F.col("contaminated") != F.col("b_contaminated"))
                | (F.col("admitted") != F.col("b_admitted"))
            ).cast("long")
        ).alias("mismatches"),
        F.sum(F.col("quality_ok").cast("long")).alias("s_quality"),
        F.sum(F.col("contaminated").cast("long")).alias("s_contam"),
        F.sum(F.col("admitted").cast("long")).alias("s_admitted"),
        F.sum(F.col("b_quality_ok").cast("long")).alias("b_quality"),
        F.sum(F.col("b_contaminated").cast("long")).alias("b_contam"),
        F.sum(F.col("b_admitted").cast("long")).alias("b_admitted_n"),
    ).collect()[0]
    batch_wall = time.time() - t1

    n_train = train.count()
    result = {
        "sf_dir": args.sf_dir,
        "docs": n_train,
        "input_files": n_files,
        "microbatches": n_batches,
        "batch_rows": [p["numInputRows"] for p in batches],
        "stream_wall_sec": round(stream_wall, 1),
        "batch_replay_wall_sec": round(batch_wall, 1),
        "rows_compared": joined["n"],
        "mismatches": joined["mismatches"],
        "funnel_counts": {
            "stream": {
                "quality_ok": joined["s_quality"],
                "contaminated": joined["s_contam"],
                "admitted": joined["s_admitted"],
            },
            "batch": {
                "quality_ok": joined["b_quality"],
                "contaminated": joined["b_contam"],
                "admitted": joined["b_admitted_n"],
            },
        },
    }
    ok = (
        n_batches >= 3
        and joined["mismatches"] == 0
        and joined["n"] == n_train
        and result["funnel_counts"]["stream"] == result["funnel_counts"]["batch"]
    )
    result["parity"] = "PASS" if ok else "FAIL"
    print(json.dumps(result))
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
