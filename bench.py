#!/usr/bin/env python
"""Benchmark harness.

Default mode: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32) and prints
ONE JSON line:

    {"metric": "pipeline_docs_per_sec", "value": N, "unit": "sec",
     "queries": {...per-query seconds...}, "sf": ...}

The headline metric is end-to-end docs/sec of the near-duplicate pipeline
(extract -> exact -> sketch -> band -> candidates -> verify -> cluster) on a
deterministic synthetic pages corpus (the north-rule workload), measured at
the session's parallelism.

--scaling mode: runs the SAME pipeline job on the SAME corpus at local[8]
and local[32] (the sandbox stand-in for N and 4N executors) and writes
BENCH/BASELINE.md with throughput at both plus scaling efficiency
(tp_4N / tp_N) / 4.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import shutil
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent))

BENCH_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "20000"))
SCALING_PAGES = int(os.environ.get("SPARK_GRAFT_SCALING_PAGES", "60000"))


def _session(cpus: int, shuffle_partitions: int | None = None):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"mp-spark-bench-{cpus}")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .getOrCreate()
    )


def _bench_corpus(n_pages: int) -> str:
    """Deterministic synthetic pages corpus, cached under the repo."""
    from mashing_pumpkins_spark.sources.synthetic import write_pages_parquet

    cache = pathlib.Path(__file__).parent / ".bench_cache" / f"pages_{n_pages}"
    marker = cache / "pages.parquet"
    if not marker.exists():
        write_pages_parquet(str(cache), n_pages, seed=42)
    return str(marker)


def _run_pipeline_job(spark, pages_path: str, cpus: int) -> tuple[float, int]:
    """One full pipeline run on a fresh checkpoint dir; returns (sec, docs)."""
    from mashing_pumpkins_spark.config import PipelineConfig, SketchConfig
    from mashing_pumpkins_spark.plans.pipeline import run_pipeline

    cfg = PipelineConfig(
        sketch=SketchConfig(nsize=21, maxsize=256, hash_name="xxh64", seed=0),
        n_bands=32,
        rows_per_band=8,
        jaccard_threshold=0.8,
    )
    pages = spark.read.parquet(pages_path).repartition(cpus * 2)
    n_docs = pages.count()
    ckpt = tempfile.mkdtemp(prefix="mp_bench_ckpt_")
    t0 = time.monotonic()
    clusters, _report = run_pipeline(spark, pages, cfg, ckpt)
    clusters.count()
    sec = time.monotonic() - t0
    shutil.rmtree(ckpt, ignore_errors=True)
    return sec, n_docs


def run_default(sf_dir: str, cpus: int) -> dict:
    import __spark_entry__ as entry_mod

    spark = _session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    timings: dict[str, float] = {}
    # headline workload: the dedup pipeline on the synthetic pages corpus
    pages_path = _bench_corpus(BENCH_PAGES)
    sec, n_docs = _run_pipeline_job(spark, pages_path, cpus)
    timings["pipeline_pages"] = round(sec, 3)
    docs_per_sec = n_docs / sec

    bench_queries = [
        "sketch_stats",
        "minhash_jaccard_estimate" if "0.01" in sf_dir else None,
        "pipeline_clusters",
        "simhash_pairs",
        "word_ngram_jaccard",
        "lang_id",
        "quality_stats",
        "token_stats_by_lang",
        "embedding_near_pairs",
        "ann_topk",
        "ann_lsh",
        "events_hourly",
        "multimodal_features",
    ]
    for name in bench_queries:
        if name is None or name not in queries:
            continue
        t0 = time.monotonic()
        queries[name](spark, sf_dir).count()
        timings[name] = round(time.monotonic() - t0, 3)
    spark.stop()
    sf = sf_dir.rstrip("/").split("sf")[-1]
    return {
        "metric": "pipeline_docs_per_sec",
        "value": round(docs_per_sec, 2),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "bench_pages": BENCH_PAGES,
        "cpus": cpus,
    }


def run_scaling() -> dict:
    """Same job, same input, local[8] vs local[32] — the sandbox evidence
    for the north rule's N -> 4N scaling criterion."""
    pages_path = _bench_corpus(SCALING_PAGES)
    results = {}
    for cpus in (8, 32):
        spark = _session(cpus)
        spark.sparkContext.setLogLevel("ERROR")
        # warm-up JVM/JIT with a small slice, then measure
        _run_pipeline_job(spark, _bench_corpus(2000), cpus)
        sec, n_docs = _run_pipeline_job(spark, pages_path, cpus)
        results[cpus] = {"sec": round(sec, 2), "docs_per_sec": round(n_docs / sec, 2)}
        spark.stop()
    eff = (results[32]["docs_per_sec"] / results[8]["docs_per_sec"]) / 4.0
    out = {
        "pages": SCALING_PAGES,
        "local8": results[8],
        "local32": results[32],
        "scaling_efficiency": round(eff, 3),
    }
    bench_dir = pathlib.Path(__file__).parent / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    (bench_dir / "BASELINE.md").write_text(
        "# BENCH — throughput & scaling (sandbox evidence for the north rule)\n\n"
        "Same job (full near-dup pipeline: extract -> exact-dup collapse -> "
        "sketch -> LSH bands -> candidates -> verify -> connected components), "
        "same input, two parallelism levels (local[8] vs local[32] as the "
        "stand-in for N vs 4N executors).\n\n"
        f"| corpus | local[8] docs/s | local[32] docs/s | scaling efficiency |\n"
        f"|---|---|---|---|\n"
        f"| {SCALING_PAGES} synthetic pages | {results[8]['docs_per_sec']} "
        f"| {results[32]['docs_per_sec']} | {out['scaling_efficiency']} |\n\n"
        f"Wall: local[8] {results[8]['sec']}s, local[32] {results[32]['sec']}s. "
        f"Target efficiency >= 0.8 (north rule). Reference single-node "
        f"sketching calibration: ~9.4-19.4 MB/s (BASELINE.md).\n"
    )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    args = ap.parse_args()
    if args.scaling:
        print(json.dumps(run_scaling()))
        return
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    print(json.dumps(run_default(sf_dir, cpus)))


if __name__ == "__main__":
    main()
