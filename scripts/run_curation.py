#!/usr/bin/env python
"""spark-submit entry point for the corpus-curation funnel.

Cluster usage:

    spark-submit --py-files mashing_pumpkins_spark.zip \\
        scripts/run_curation.py \\
        --docs /data/docs_parquet --output /data/curated \\
        [--benchmark /data/benchmark_parquet] \\
        [--near-dup --nsize 21 --maxsize 256 --bands 32 --rows 8 --tau 0.8] \\
        [--quality-min 0.4] [--passage-words 16] [--max-dup-frac 0.5] [--ngram 4] \\
        [--url-col url] [--blocked-hosts h1,h2] [--blocked-path-terms t1,t2] \\
        [--robots /data/robots_parquet --agent trainbot] \\
        [--classifier-weights w0,w1,...] [--classifier-min 0]

Writes <output>/survivors (id, text[, url]), <output>/funnel (per-stage
docs and words) and <output>/manifest.json (the CurationConfig hash that
pins which funnel produced the table) as parquet/JSON, and prints the
funnel as JSON lines. --export-shards N additionally materializes the
kept corpus as N deterministic jsonl.gz training shards (+ shard
manifest) under <output>/shards — the ready-to-train form.
--train-tokenizer N learns N BPE merges on the kept corpus
(operators/bpe.py; one extra corpus pass, then vocabulary-sized merge
iterations) and writes <output>/tokenizer/{merges,vocab} parquet.

Gate stages (round-6): --blocked-hosts/--blocked-path-terms enable the
UT1-style url_filter stage, --robots (a parquet of host,body robots.txt
bodies) enables RFC 9309 admission for --agent, --classifier-weights
(integer fixed-point) enables the hashed-n-gram linear quality model.
All three need --url-col.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def _write_manifest(spark, uri: str, payload: dict) -> None:
    """Write manifest.json through the Hadoop FileSystem API so it lands
    beside the parquet outputs under ANY URI scheme (s3a://, hdfs://,
    file:...). A driver-local pathlib write would put it on the driver's
    local disk at a mangled path for non-local --output URIs."""
    jvm = spark._jvm
    jsc = spark._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(uri)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    stream = fs.create(hpath, True)
    try:
        stream.write(bytearray(json.dumps(payload, indent=1).encode("utf-8")))
    finally:
        stream.close()


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
    ap.add_argument("--bands", type=int, default=None,
                    help="LSH bands; omit BOTH --bands/--rows for the adaptive default")
    ap.add_argument("--rows", type=int, default=None)
    ap.add_argument("--tau", type=float, default=0.8)
    ap.add_argument("--near-dup-checkpoint-dir", default=None,
                    help="run the near-dup stage CHECKPOINTED (resumable) "
                         "through this store path instead of one flow plan")
    ap.add_argument("--url-col", default=None)
    ap.add_argument("--blocked-hosts", default="",
                    help="comma-separated blocklist hosts (url_filter stage)")
    ap.add_argument("--blocked-path-terms", default="",
                    help="comma-separated path substrings (url_filter stage)")
    ap.add_argument("--robots", default=None,
                    help="parquet of (host, body) robots.txt bodies")
    ap.add_argument("--agent", default="*")
    ap.add_argument("--classifier-weights", default="",
                    help="comma-separated integer weights (quality_classifier stage)")
    ap.add_argument("--classifier-min", type=int, default=0)
    ap.add_argument("--lm-reference", default=None,
                    help="parquet of reference docs enabling the CCNet-style "
                         "LM perplexity filter (operators/lm.py)")
    ap.add_argument("--lm-head-cut-e6", type=int, default=None,
                    help="avg-ln-p head cut in 1e-6 units (default: "
                         "operators.lm.HEAD_CUT_E6; use = form for negatives)")
    ap.add_argument("--lm-tail-cut-e6", type=int, default=None)
    ap.add_argument("--lm-keep", default="head,middle",
                    help="comma-separated perplexity bands to keep")
    ap.add_argument("--export-shards", type=int, default=None,
                    help="also export the kept corpus as this many "
                         "deterministic jsonl.gz training shards under "
                         "<output>/shards (sources/training_export.py); "
                         "needs --url-col")
    ap.add_argument("--export-seed", type=int, default=0)
    ap.add_argument("--semdedup", action="store_true",
                    help="append a SemDedup stage after near-dup: "
                         "model-free signed hashed-TF embedding + "
                         "fixed-point k-means + cosine prune "
                         "(operators/semdedup.semantic_text_dedup)")
    ap.add_argument("--semdedup-clusters", type=int, default=0,
                    help="0 = auto: ceil(n_survivors / 500) "
                         "(operators/semdedup.choose_n_clusters)")
    ap.add_argument("--semdedup-tau-ppm", type=int, default=980_000)
    ap.add_argument("--semdedup-iters", type=int, default=2)
    ap.add_argument("--semdedup-dim", type=int, default=64)
    ap.add_argument("--semdedup-max-cluster-size", type=int, default=None,
                    help="salt clusters above this size into md5 "
                         "subclusters before the pairwise prune")
    ap.add_argument("--train-tokenizer", type=int, default=None,
                    help="train N BPE merges on the KEPT corpus and write "
                         "<output>/tokenizer/{merges,vocab}.parquet — one "
                         "extra corpus pass; merges learned with "
                         "operators/bpe.py's word-count-table trainer")
    ap.add_argument("--tokenizer-min-count", type=int, default=2,
                    help="stop merging below this pair frequency")
    args = ap.parse_args()
    if args.export_shards and not args.url_col:
        ap.error("--export-shards needs --url-col")

    from pyspark.sql import SparkSession

    from mashing_pumpkins_spark.config import CurationConfig
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
    cur_cfg = CurationConfig(
        quality_min=args.quality_min,
        passage_words=args.passage_words,
        max_dup_frac=args.max_dup_frac,
        ngram=args.ngram,
        url_col=args.url_col,
        blocked_hosts=tuple(h for h in args.blocked_hosts.split(",") if h),
        blocked_path_terms=tuple(t for t in args.blocked_path_terms.split(",") if t),
        robots_path=args.robots,
        agent=args.agent,
        classifier_weights=tuple(
            int(w) for w in args.classifier_weights.split(",") if w
        ),
        classifier_min=args.classifier_min,
        lm_reference_path=args.lm_reference,
        lm_head_cut_e6=args.lm_head_cut_e6,
        lm_tail_cut_e6=args.lm_tail_cut_e6,
        lm_keep=tuple(b for b in args.lm_keep.split(",") if b),
    )
    robots_rules = None
    if args.robots:
        from mashing_pumpkins_spark.sources.robots import parse_robots

        robots_rules = parse_robots(spark.read.parquet(args.robots))
    lm_reference = (
        spark.read.parquet(args.lm_reference) if args.lm_reference else None
    )
    semantic = None
    if args.semdedup:
        semantic = {
            "n_clusters": args.semdedup_clusters,
            "tau_ppm": args.semdedup_tau_ppm,
            "n_iters": args.semdedup_iters,
            "dim": args.semdedup_dim,
            "max_cluster_size": args.semdedup_max_cluster_size,
        }
    funnel, survivors = curation_funnel(
        docs,
        benchmark,
        near_dup=near_dup,
        id_col=args.id_col,
        text_col=args.text_col,
        robots_rules=robots_rules,
        lm_reference=lm_reference,
        near_dup_checkpoint_dir=args.near_dup_checkpoint_dir,
        semantic=semantic,
        **cur_cfg.funnel_kwargs(),
    )
    out = args.output.rstrip("/")
    survivors.write.mode("overwrite").parquet(f"{out}/survivors")
    _write_manifest(spark, f"{out}/manifest.json", {
        "curation_config_hash": cur_cfg.config_hash(),
        "near_dup_config_hash": near_dup.config_hash() if near_dup else None,
    })
    funnel.write.mode("overwrite").parquet(f"{out}/funnel")
    if args.export_shards:
        from mashing_pumpkins_spark.sources.training_export import (
            export_training_shards,
        )

        export_training_shards(
            spark.read.parquet(f"{out}/survivors"),
            f"{out}/shards",
            n_shards=args.export_shards,
            seed=args.export_seed,
            url_col=args.url_col,
            text_col=args.text_col,
        )
    if args.train_tokenizer:
        from pyspark.sql import functions as F

        from mashing_pumpkins_spark.operators.bpe import fit_bpe, merges_df

        model = fit_bpe(
            spark.read.parquet(f"{out}/survivors"),
            text_col=args.text_col,
            n_merges=args.train_tokenizer,
            min_count=args.tokenizer_min_count,
        )
        merges_df(spark, model).coalesce(1).write.mode("overwrite").parquet(
            f"{out}/tokenizer/merges"
        )
        model.words.select(
            "word", F.size("syms").cast("int").alias("n_tokens"), "cnt"
        ).write.mode("overwrite").parquet(f"{out}/tokenizer/vocab")
        model.words.unpersist()
        print(
            json.dumps(
                {"tokenizer_merges": len(model.merges),
                 "tokenizer_min_count": args.tokenizer_min_count}
            )
        )
    for row in spark.read.parquet(f"{out}/funnel").orderBy("stage_idx").collect():
        print(json.dumps(row.asDict(), default=str))
    spark.stop()


if __name__ == "__main__":
    main()
