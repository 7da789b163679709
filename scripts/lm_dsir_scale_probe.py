"""1M-doc scale probe for the round-7 selection operators (the
line-dedup-probe precedent): CCNet-style LM perplexity scoring and DSIR
top-k selection over the sf1 soak corpus.

- LM: model fit on the ~10% reference split (crc32(url)%10==0), the
  remaining ~900k docs scored + banded.
- DSIR: target = the same reference split; raw model fit on a bounded
  ~5% hash-sample of the crawl side (the documented production path —
  p_raw only normalizes weights), then top-10k selection.

Both paths run the broadcast-model + single-groupBy plan shape PLANS.md
audits; this probe shows the walls at 1M docs with host probes for
normalization.

Usage: python scripts/lm_dsir_scale_probe.py [--pages 1000000]
       [--cpus 16] [--workdir /tmp/sf1_soak]
Writes one JSON line at the end; record it in BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--workdir", default="/tmp/sf1_soak")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    import bench as bench_mod
    from mashing_pumpkins_spark.operators.dsir import (
        dsir_scores,
        fit_hashed_ngram_model,
    )
    from mashing_pumpkins_spark.operators.lm import fit_bigram_lm, lm_perplexity
    from mashing_pumpkins_spark.sources.synthetic import write_pages_parquet

    hw_probe = {"1": bench_mod._hw_probe(1), "4": bench_mod._hw_probe(4)}
    corpus_dir = os.path.join(args.workdir, f"pages_{args.pages}")
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
    pages = spark.read.parquet(os.path.join(corpus_dir, "pages.parquet")).select(
        "url", "text"
    )
    ref = pages.where(F.crc32(F.col("url")) % 10 == 0)
    crawl = pages.where(F.crc32(F.col("url")) % 10 != 0)

    t0 = time.monotonic()
    lm = fit_bigram_lm(ref)
    lm_fit_sec = time.monotonic() - t0
    n_bigrams = lm.bigrams.count()

    t0 = time.monotonic()
    scored = lm_perplexity(crawl, lm, id_col="url")
    bands = {
        r["band"]: r["n"]
        for r in scored.groupBy("band").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    lm_score_sec = time.monotonic() - t0
    n_scored = sum(bands.values())

    t0 = time.monotonic()
    target_model = fit_hashed_ngram_model(ref, n_buckets=4096)
    # bounded raw sample (~5%): p_raw normalizes, it need not see the
    # whole crawl — this is the path a 10^12-doc run takes
    raw_model = fit_hashed_ngram_model(
        crawl.where(F.crc32(F.concat(F.col("url"), F.lit("#s"))) % 20 == 0),
        n_buckets=4096,
    )
    dsir_fit_sec = time.monotonic() - t0

    t0 = time.monotonic()
    picked = (
        dsir_scores(crawl, target_model, raw_model, id_col="url")
        .where(F.col("n_feats") > 0)
        .orderBy(F.col("weight_e6").desc(), F.col("url").asc())
        .limit(10_000)
        .collect()
    )
    dsir_select_sec = time.monotonic() - t0

    result = {
        "pages": args.pages,
        "cpus": args.cpus,
        "hw_probe_mb_per_sec": hw_probe,
        "lm": {
            "fit_sec": round(lm_fit_sec, 1),
            "reference_bigrams": n_bigrams,
            "vocab": lm.vocab_size,
            "score_sec": round(lm_score_sec, 1),
            "docs_scored": n_scored,
            "docs_per_sec": round(n_scored / lm_score_sec, 1),
            "bands": bands,
        },
        "dsir": {
            "fit_sec": round(dsir_fit_sec, 1),
            "target_total": target_model.total,
            "raw_sample_total": raw_model.total,
            "select_sec": round(dsir_select_sec, 1),
            "docs_per_sec": round(n_scored / dsir_select_sec, 1),
            "picked": len(picked),
            "top_weight_e6": picked[0]["weight_e6"] if picked else None,
            "cut_weight_e6": picked[-1]["weight_e6"] if picked else None,
        },
    }
    print(json.dumps(result))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
