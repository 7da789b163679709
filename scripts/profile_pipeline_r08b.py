#!/usr/bin/env python
"""Instrumented headline-pipeline profile (guide §1): per-stage walls from
the run report, total wall, and the residual floor (total - stage walls),
plus an adjacent hw probe. Supplementary measurement only — bench.py stays
frozen."""

from __future__ import annotations

import json
import pathlib
import shutil
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import bench as bench_mod


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
    cpus = 32
    out = {"pages": n_pages, "hw_probe": {"1": bench_mod._hw_probe(1)}}
    spark = bench_mod._session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    from mashing_pumpkins_spark.config import PipelineConfig, SketchConfig
    from mashing_pumpkins_spark.plans.pipeline import run_pipeline

    cfg = PipelineConfig(
        sketch=SketchConfig(nsize=21, maxsize=256, hash_name="xxh64", seed=0),
        n_bands=32,
        rows_per_band=8,
        jaccard_threshold=0.8,
    )
    pages_path = bench_mod._bench_corpus(n_pages)
    pages = spark.read.parquet(pages_path).repartition(min(cpus, 16))
    pages.count()
    runs = []
    for i in range(3):
        ckpt = tempfile.mkdtemp(prefix="mp_prof_ckpt_")
        t0 = time.monotonic()
        clusters, report = run_pipeline(spark, pages, cfg, ckpt)
        clusters.count()
        total = time.monotonic() - t0
        shutil.rmtree(ckpt, ignore_errors=True)
        spark.catalog.clearCache()
        stages = {s.name: round(s.wall_sec, 3) for s in report.stages}
        runs.append(
            {
                "total": round(total, 3),
                "stages": stages,
                "floor": round(total - sum(stages.values()), 3),
            }
        )
    out["runs"] = runs
    out["hw_probe_end"] = {"1": bench_mod._hw_probe(1)}
    spark.stop()
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
