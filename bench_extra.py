#!/usr/bin/env python
"""Per-query isolated measurement harness (guide §1.4) — NOT the frozen
driver bench. Times individual declared queries (or the pipeline job)
with the same session settings as bench.py, a noop-count sink, repeats,
and an adjacent hardware probe so numbers can be compared across host
states. Usage:

    python bench_extra.py q1 q2 ...           # repeat=3 each, prints JSON
    python bench_extra.py --repeats 5 q1
    python bench_extra.py --pipeline           # the headline pipeline job
    python bench_extra.py --sketch             # sketch_only_k1000 stage

The numbers cited in OPTIMIZATION_r08.md come from this file; bench.py
stays byte-identical to the round-start copy."""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent))

import bench as bench_mod  # reuse the frozen session/corpus helpers


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--pipeline", action="store_true")
    ap.add_argument("--sketch", action="store_true")
    ap.add_argument("--no-probe", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    out: dict = {"cpus": cpus, "sf_dir": sf_dir}
    if not args.no_probe:
        out["hw_probe_mb_per_sec"] = {"1": bench_mod._hw_probe(1)}

    spark = bench_mod._session(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    results: dict = {}

    if args.pipeline:
        pages_path = bench_mod._bench_corpus(bench_mod.BENCH_PAGES)
        sec, n_docs, n_bytes = bench_mod._run_pipeline_job(spark, pages_path, cpus)
        results["pipeline_pages"] = {
            "best2_sec": round(sec, 3),
            "docs_per_sec": round(n_docs / sec, 2),
        }
    if args.sketch:
        pages_path = bench_mod._bench_corpus(bench_mod.BENCH_PAGES)
        mb, sec = bench_mod._sketch_throughput(spark, pages_path, cpus)
        results["sketch_only_k1000"] = {"best2_sec": sec, "mb_per_sec": round(mb, 2)}

    for name in args.queries:
        if name not in queries:
            results[name] = {"error": "unknown query"}
            continue
        samples = []
        for _ in range(args.repeats):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.monotonic()
            queries[name](spark, sf_dir).count()
            samples.append(round(time.monotonic() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            spark.catalog.clearCache()
        results[name] = {"samples": samples, "best": min(samples)}

    if not args.no_probe:
        out["hw_probe_end_mb_per_sec"] = {"1": bench_mod._hw_probe(1)}
    out["results"] = results
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
