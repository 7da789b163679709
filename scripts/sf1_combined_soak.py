"""sf1 COMBINED soak (round-7, VERDICT item 3): the composed
funnel -> near-dup curation job — the shape a real curation run uses
(curation_funnel(near_dup=cfg)) — has only ever run at gate scale; the
two halves were soaked separately in rounds 5/6. This script runs the
composition at ~1M pages, CHECKPOINTED (near_dup_checkpoint_dir), and
replays a deterministic sample through DuckDB all the way THROUGH the
near-dup stage (exact shingle-Jaccard closure, the pipeline_clusters
oracle pattern).

Full-scale leg (production config): the round-6 gate stages (url
blocklist, robots admission, hashed-n-gram classifier) + quality/exact/
passage stages, then the MinHash pipeline (k=256, tau=0.8, adaptive
banding) on the survivors via the checkpointed store — per-stage walls
and row counts come from the store's manifests, which also make the
composed job resumable mid-near-dup.

Sample leg (~0.5%, md5(url) % 200 == 7): same composed funnel but with
an UNTRUNCATED sketch (maxsize=1<<30), under which sketch Jaccard ==
exact shingle Jaccard — so DuckDB can recompute the near-dup stage
independently: funnel chain (FUNNEL_CTE_PREFIX, shared with
sf1_funnel_soak.py) -> 21-byte hex-window shingles -> pairwise Jaccard
>= tau -> recursive transitive closure -> drop non-representative
members. The check compares BOTH the per-stage counts and the exact
kept-url set.

Usage: python scripts/sf1_combined_soak.py [--pages 1000000] [--cpus 16]
       [--workdir /tmp/sf1_soak] [--sample-mod 200]
Writes one JSON line at the end; record it in BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sf1_funnel_soak import (  # noqa: E402
    BLOCKED_HOSTS,
    FUNNEL_CTE_PREFIX,
    WEIGHTS,
    _robots_bodies,
)

TAU = 0.8

CLOSURE_SQL = FUNNEL_CTE_PREFIX + r""",
    sh as (
      select distinct url, substr(hx, 2*i - 1, 42) as s
      from (select url, hex(encode(text)) as hx,
                   unnest(generate_series(1, octet_length(encode(text)) - 20)) as i
            from s3 where octet_length(encode(text)) >= 21)
    ),
    ds as (select url, count(*) as n from sh group by 1),
    inter as (
      select a.url as ua, b.url as ub, count(*) as i
      from sh a join sh b on a.s = b.s and a.url < b.url
      group by 1, 2
    ),
    edges as (
      select ua, ub from inter
      join ds x on x.url = ua join ds y on y.url = ub
      where i::double / (x.n + y.n - i) >= $tau
    ),
    sym as (select ua u, ub v from edges union select ub, ua from edges),
    closure as (
      with recursive walk(u, v) as (
        select u, v from sym
        union
        select w.u, sy.v from walk w join sym sy on w.v = sy.u where w.u != sy.v
      ) select * from walk
    ),
    labels as (select u as id, least(u, min(v)) as cid from closure group by u),
    losers as (select id from labels where id != cid),
    kept as (select url from s3 where url not in (select id from losers)),
    f as (
      select 0 as i, 'input' as stage, count(*) as n from docs
      union all select 1, 'url_filter', count(*) from s_uf
      union all select 2, 'robots', count(*) from s_rb
      union all select 3, 'quality_filter', count(*) from s1
      union all select 4, 'quality_classifier', count(*) from s_qc
      union all select 5, 'exact_dedup', count(*) from s2
      union all select 6, 'passage_dedup', count(*) from s3
      union all select 7, 'near_dup', count(*) from kept
    )
    select i, stage, n from f order by i
"""

KEPT_SQL = FUNNEL_CTE_PREFIX + r""",
    sh as (
      select distinct url, substr(hx, 2*i - 1, 42) as s
      from (select url, hex(encode(text)) as hx,
                   unnest(generate_series(1, octet_length(encode(text)) - 20)) as i
            from s3 where octet_length(encode(text)) >= 21)
    ),
    ds as (select url, count(*) as n from sh group by 1),
    inter as (
      select a.url as ua, b.url as ub, count(*) as i
      from sh a join sh b on a.s = b.s and a.url < b.url
      group by 1, 2
    ),
    edges as (
      select ua, ub from inter
      join ds x on x.url = ua join ds y on y.url = ub
      where i::double / (x.n + y.n - i) >= $tau
    ),
    sym as (select ua u, ub v from edges union select ub, ua from edges),
    closure as (
      with recursive walk(u, v) as (
        select u, v from sym
        union
        select w.u, sy.v from walk w join sym sy on w.v = sy.u where w.u != sy.v
      ) select * from walk
    ),
    labels as (select u as id, least(u, min(v)) as cid from closure group by u),
    losers as (select id from labels where id != cid)
    select url from s3 where url not in (select id from losers) order by url
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--workdir", default="/tmp/sf1_soak")
    ap.add_argument("--sample-mod", type=int, default=200)
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from mashing_pumpkins_spark.config import PipelineConfig, SketchConfig
    from mashing_pumpkins_spark.operators.curation import curation_funnel
    from mashing_pumpkins_spark.sources.robots import parse_robots
    from mashing_pumpkins_spark.sources.synthetic import write_pages_parquet

    import bench as bench_mod

    hw_probe = {"1": bench_mod._hw_probe(1), "4": bench_mod._hw_probe(4)}

    corpus_dir = os.path.join(args.workdir, f"pages_{args.pages}")
    t0 = time.monotonic()
    if not os.path.exists(os.path.join(corpus_dir, "pages.parquet")):
        print(f"generating {args.pages} pages ...", flush=True)
        write_pages_parquet(corpus_dir, args.pages, seed=42)
    gen_sec = time.monotonic() - t0

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(4 * args.cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
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
    robots_rules = parse_robots(_robots_bodies(spark)).persist()
    robots_rules.count()

    nd_cfg = PipelineConfig(
        sketch=SketchConfig(nsize=21, maxsize=256, hash_name="xxh64", seed=0),
        jaccard_threshold=TAU,  # banding adaptive -> (26, 8)
    )

    def run_funnel(docs, near_dup=None, ckpt=None):
        return curation_funnel(
            docs,
            None,
            id_col="url",
            text_col="text",
            url_col="url",
            blocked_hosts=BLOCKED_HOSTS,
            blocked_path_terms=["00"],
            robots_rules=robots_rules,
            agent="trainbot",
            classifier_weights=WEIGHTS,
            classifier_min=0,
            near_dup=near_dup,
            near_dup_checkpoint_dir=ckpt,
        )

    # ---- full-scale composed run (checkpointed near-dup) -----------------
    ckpt_dir = os.path.join(args.workdir, "combined_ckpt")
    shutil.rmtree(ckpt_dir, ignore_errors=True)
    t0 = time.monotonic()
    funnel, survivors = run_funnel(pages, near_dup=nd_cfg, ckpt=ckpt_dir)
    build_sec = time.monotonic() - t0  # checkpointed stages materialize here

    t0 = time.monotonic()
    report = [r.asDict() for r in funnel.collect()]
    report_sec = time.monotonic() - t0

    out_dir = os.path.join(args.workdir, "combined_out")
    t0 = time.monotonic()
    survivors.write.mode("overwrite").parquet(os.path.join(out_dir, "kept"))
    write_sec = time.monotonic() - t0
    kept_count = spark.read.parquet(os.path.join(out_dir, "kept")).count()

    stage_manifests = {}
    for mf in sorted(glob.glob(os.path.join(ckpt_dir, "*.manifest.json"))):
        meta = json.loads(open(mf).read())
        stage_manifests[os.path.basename(mf).replace(".manifest.json", "")] = {
            k: meta[k] for k in ("rows", "wall_sec") if k in meta
        }

    # ---- sample leg: composed run vs DuckDB closure replay ---------------
    sample_pred = F.conv(F.substring(F.md5("url"), 1, 8), 16, 10).cast(
        "bigint"
    ) % args.sample_mod == 7
    sample_path = os.path.join(args.workdir, "combined_sample.parquet")
    pages.where(sample_pred).coalesce(4).write.mode("overwrite").parquet(sample_path)
    sample_docs = spark.read.parquet(sample_path)

    # untruncated sketch -> sketch Jaccard == shingle Jaccard, which DuckDB
    # recomputes exactly (the pipeline_clusters oracle trick)
    nd_exact = PipelineConfig(
        sketch=SketchConfig(nsize=21, maxsize=1 << 30, hash_name="xxh64", seed=0),
        n_bands=32,
        rows_per_band=8,
        jaccard_threshold=TAU,
    )
    t0 = time.monotonic()
    s_funnel, s_surv = run_funnel(sample_docs, near_dup=nd_exact)
    spark_stages = [
        (int(r["stage_idx"]), r["stage"], int(r["n_docs"]))
        for r in s_funnel.collect()
    ]
    spark_kept = sorted(r["url"] for r in s_surv.select("url").collect())
    sample_sec = time.monotonic() - t0

    glob_path = os.path.join(sample_path, "*.parquet")
    duck_stages = [
        (int(i), s, int(n))
        for i, s, n in duckdb.sql(
            CLOSURE_SQL, params={"path": glob_path, "tau": TAU}
        ).fetchall()
    ]
    duck_kept = [
        r[0]
        for r in duckdb.sql(
            KEPT_SQL, params={"path": glob_path, "tau": TAU}
        ).fetchall()
    ]
    stages_match = spark_stages == duck_stages
    kept_match = spark_kept == duck_kept

    result = {
        "metric": "sf1_combined_soak",
        "pages": args.pages,
        "cpus": args.cpus,
        "hw_probe_mb_per_sec": hw_probe,
        "gen_sec": round(gen_sec, 1),
        "near_dup_config": {
            "maxsize": 256,
            "bands": nd_cfg.n_bands,
            "rows": nd_cfg.rows_per_band,
            "tau": TAU,
        },
        "composed_build_sec": round(build_sec, 1),
        "funnel_report_sec": round(report_sec, 1),
        "kept_write_sec": round(write_sec, 1),
        "kept_docs": kept_count,
        "funnel": report,
        "near_dup_stage_manifests": stage_manifests,
        "sample_docs": sum(n for i, s, n in spark_stages if s == "input"),
        "sample_composed_sec": round(sample_sec, 1),
        "sample_stages_match_duckdb": stages_match,
        "sample_kept_match_duckdb": kept_match,
        "sample_kept_docs": len(spark_kept),
        "sample_spark_stages": spark_stages,
        "sample_duckdb_stages": duck_stages,
    }
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
