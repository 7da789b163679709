"""Regression-attribution probe (round-5 verdict item #1).

Times ONLY the two queries flagged as regressed in VERDICT r4
(`pipeline_clusters` 9.1->12.5 s, `sketch_only_k1000` 4.1->5.1 s) with the
documented fresh-host methodology: hw probe first, fresh session, best-of-2
per query. Run it against any checkout by pointing PYTHONPATH at the tree:

    PYTHONPATH=/tmp/r3tip python scripts/attrib_regression.py
    PYTHONPATH=/root/repo python scripts/attrib_regression.py

Prints one JSON line with the probe numbers so runs on different host
states can be normalized against each other.
"""

from __future__ import annotations

import json
import os
import sys
import time

root = os.environ.get("PYTHONPATH", os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, root)


def main() -> None:
    import bench

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    probe = {"1": bench._hw_probe(1), "4": bench._hw_probe(4)}
    spark = bench._session(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    out: dict[str, float] = {}

    # sketch_only_k1000 (already best-of-2 internally, with warm-up)
    pages_path = bench._bench_corpus(bench.BENCH_PAGES)
    mb, sec = bench._sketch_throughput(spark, pages_path, cpus)
    out["sketch_only_k1000"] = sec
    out["sketch_mb_per_sec"] = round(mb, 2)
    spark.catalog.clearCache()

    # pipeline_clusters best-of-2 (mirrors run_default's single-shot timing
    # but takes the min of two fresh runs to shed first-run warm-up)
    best = float("inf")
    for _ in range(2):
        t0 = time.monotonic()
        queries["pipeline_clusters"](spark, sf_dir).count()
        best = min(best, time.monotonic() - t0)
        spark.catalog.clearCache()
    out["pipeline_clusters"] = round(best, 3)

    probe_after = {"1": bench._hw_probe(1), "4": bench._hw_probe(4)}
    spark.stop()
    print(json.dumps({
        "tree": root,
        "hw_probe_before": probe,
        "hw_probe_after": probe_after,
        "timings": out,
    }))


if __name__ == "__main__":
    main()
