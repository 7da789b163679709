#!/usr/bin/env python
"""spark-submit entry point for the corpus-curation funnel.

Cluster usage:

    spark-submit --py-files mashing_pumpkins_spark.zip \\
        scripts/run_curation.py \\
        --docs /data/docs_parquet --output /data/curated \\
        [--benchmark /data/benchmark_parquet] \\
        [--near-dup --nsize 21 --maxsize 256 --bands 32 --rows 8 --tau 0.8] \\
        [--quality-min 0.4] [--passage-words 16] [--max-dup-frac 0.5] [--ngram 4]

Writes <output>/survivors (id, text) and <output>/funnel (per-stage docs
and words) as parquet, and prints the funnel as JSON lines.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="input documents parquet path")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("--benchmark", default=None, help="benchmark parquet for decontamination")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--quality-min", type=float, default=0.4)
    ap.add_argument("--passage-words", type=int, default=16)
    ap.add_argument("--max-dup-frac", type=float, default=0.5)
    ap.add_argument("--ngram", type=int, default=4)
    ap.add_argument("--near-dup", action="store_true",
                    help="append the MinHash near-dup removal stage")
    ap.add_argument("--nsize", type=int, default=21)
    ap.add_argument("--maxsize", type=int, default=256)
    ap.add_argument("--bands", type=int, default=32)
    ap.add_argument("--rows", type=int, default=8)
    ap.add_argument("--tau", type=float, default=0.8)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from mashing_pumpkins_spark.operators.curation import curation_funnel

    spark = SparkSession.builder.appName("mp-curation").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    docs = spark.read.parquet(args.docs)
    benchmark = spark.read.parquet(args.benchmark) if args.benchmark else None
    near_dup = None
    if args.near_dup:
        from mashing_pumpkins_spark.config import PipelineConfig, SketchConfig

        near_dup = PipelineConfig(
            sketch=SketchConfig(nsize=args.nsize, maxsize=args.maxsize,
                                hash_name="xxh64", seed=0),
            n_bands=args.bands,
            rows_per_band=args.rows,
            jaccard_threshold=args.tau,
        )
    funnel, survivors = curation_funnel(
        docs,
        benchmark,
        quality_min=args.quality_min,
        passage_words=args.passage_words,
        max_dup_frac=args.max_dup_frac,
        ngram=args.ngram,
        near_dup=near_dup,
        id_col=args.id_col,
        text_col=args.text_col,
    )
    out = args.output.rstrip("/")
    survivors.write.mode("overwrite").parquet(f"{out}/survivors")
    funnel.write.mode("overwrite").parquet(f"{out}/funnel")
    for row in spark.read.parquet(f"{out}/funnel").orderBy("stage_idx").collect():
        print(json.dumps(row.asDict(), default=str))
    spark.stop()


if __name__ == "__main__":
    main()
