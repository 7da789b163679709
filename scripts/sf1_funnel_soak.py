"""sf1 funnel soak (round-6, VERDICT item 6): the full gated curation
funnel has never run above sf0.1 — exercise it at ~1M pages.

Runs curation_funnel WITH the round-6 gate stages (url blocklist, robots
admission, hashed-n-gram classifier) plus quality/exact/passage stages on
the same 1M-page synthetic corpus the near-dup soak uses, then
mixture_sample on the survivors. Everything derives from the url
construction (hosts site0000..site0199.example), so a DuckDB replay can
re-derive every stage:

  - blocked hosts: site0007/site0013/site0042 (UT1-style blocklist)
  - robots: hosts with number % 5 == 2 get 'User-agent: *\nDisallow: /'
  - classifier: the (b*2654435761) % 1001 - 500 integer weight recipe
    over 256 md5 buckets, threshold 0 (the gate query's exact config)

Evidence reported:
  - wall time of the single-scan funnel aggregate (the design point: the
    whole per-stage report is ONE job — per-stage marginal cost is not
    separable by construction, that's what makes it cheap) + survivors
    materialization + mixture_sample
  - per-stage doc/word counts at 1M pages
  - a ~1% deterministic sample (md5(url) % 100 == 7) funnel run compared
    row-for-row against a DuckDB replay of the full stage chain — the
    kept-table equality check the verdict asks for, at a size DuckDB can
    recompute exactly.

Usage: python scripts/sf1_funnel_soak.py [--pages 1000000] [--cpus 16]
       [--workdir /tmp/sf1_soak]   # shares the near-dup soak's corpus
Writes one JSON line at the end; record it in BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mashing_pumpkins_spark.functions.classifier import demo_weight_table  # noqa: E402

BLOCKED_HOSTS = ["site0007.example", "site0013.example", "site0042.example"]
ROBOTS_MOD = 5
ROBOTS_REM = 2
N_BUCKETS = 256
WEIGHTS = demo_weight_table(N_BUCKETS)


def _robots_bodies(spark):
    from pyspark.sql import functions as F

    hosts = spark.range(200).select(
        F.format_string("site%04d.example", F.col("id").cast("int")).alias("host"),
        F.when(
            F.col("id") % ROBOTS_MOD == ROBOTS_REM,
            F.lit("User-agent: *\nDisallow: /\n"),
        )
        .otherwise(F.lit("User-agent: *\nDisallow:\n"))
        .alias("body"),
    )
    return hosts


# CTE chain shared with sf1_combined_soak.py: docs -> url filter (s_uf)
# -> robots (s_rb) -> quality (s1) -> classifier (s_qc) -> exact dedup
# (s2) -> passage dedup (s3). Parameter: $path (the sample parquet glob).
FUNNEL_CTE_PREFIX = r"""
    with docs as (select url, text,
                  split_part(split_part(url, 'https://', 2), '/', 1) as host
                  from read_parquet($path)),
    hostnum as (select *, substr(host, 5, 4)::int as hn from docs),
    s_uf as (select * from hostnum
             where host not in ('site0007.example','site0013.example','site0042.example')
               and not contains(split_part(url, '.example/', 2), '00')),
    s_rb as (select * from s_uf where hn % 5 <> 2),
    q as (
      select url, text,
        (case when length(text) between 100 and 20000 then 0.4 else 0 end)
        + (case when (case when length(regexp_replace(text, '\s+', '', 'g')) > 0
             then len(regexp_extract_all(regexp_replace(text, '\s+', '', 'g'), '[^A-Za-z0-9]'))::double
                  / length(regexp_replace(text, '\s+', '', 'g')) else 0 end) < 0.2 then 0.3 else 0 end)
        + (case when (case when length(trim(text)) > 0
             then len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                      x -> list_contains(['the','and','of','to','is','in','that','for','with','a','an','it','on','as','at','by'], x)))::double
                  / len(string_split_regex(lower(trim(text)), '\s+')) else 0 end) > 0.01 then 0.3 else 0 end)
        as quality
      from s_rb),
    s1 as (select url, text from q where quality >= 0.4),
    ctk as (select t.url, t.w from (select url,
               unnest(case when length(trim(text)) > 0
                  then string_split_regex(lower(trim(text)), '\s+') else [] end) as w
             from s1) t),
    csc as (select url, sum(((('0x' || substr(md5(w), 1, 8))::bigint % 256)
              * 2654435761) % 1001 - 500)::bigint as score from ctk group by url),
    s_qc as (select s1.url, s1.text from s1 left join csc using (url)
             where coalesce(score, 0) >= 0),
    s2 as (select url, text from (
      select url, text, row_number() over (partition by md5(text) order by url) as rn
      from s_qc) where rn = 1),
    toks as (select url, case when length(trim(text)) > 0
              then string_split_regex(lower(trim(text)), '\s+') else [] end as w from s2),
    p as (select url, md5(array_to_string(w[i*16+1:i*16+16], ' ')) as ph
          from toks, unnest(generate_series(0, cast(ceil(len(w)/16.0) as int) - 1)) as t(i)
          where len(w) > 0),
    cnts as (select ph, count(*) as cnt from p group by 1),
    pstat as (select p.url, count(*) as n_pass,
                     sum(case when cnt > 1 then 1 else 0 end) as n_dup
              from p join cnts using (ph) group by 1),
    s3 as (select s2.url, s2.text from s2 left join pstat using (url)
           where coalesce(n_dup, 0)::double / greatest(coalesce(n_pass, 1), 1) <= 0.5)
"""


def _duckdb_replay(sample_parquet: str) -> list[tuple]:
    """Replay the full gated funnel on the sample with DuckDB."""
    import duckdb

    sql = FUNNEL_CTE_PREFIX + r""",
    f as (
      select 0 as i, 'input' as stage, count(*) as n from docs
      union all select 1, 'url_filter', count(*) from s_uf
      union all select 2, 'robots', count(*) from s_rb
      union all select 3, 'quality_filter', count(*) from s1
      union all select 4, 'quality_classifier', count(*) from s_qc
      union all select 5, 'exact_dedup', count(*) from s2
      union all select 6, 'passage_dedup', count(*) from s3
    )
    select i, stage, n from f order by i
    """
    return duckdb.sql(sql, params={"path": sample_parquet}).fetchall()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--workdir", default="/tmp/sf1_soak")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from mashing_pumpkins_spark.operators.corpus import mixture_sample
    from mashing_pumpkins_spark.operators.curation import curation_funnel
    from mashing_pumpkins_spark.sources.robots import parse_robots
    from mashing_pumpkins_spark.sources.synthetic import write_pages_parquet

    # host calibration (this VM's CPU quota swings whole-run; see
    # BENCH/BASELINE.md) — lets a reader normalize the wall times below
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

    def run_funnel(docs):
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
        )

    # ---- full-scale run -------------------------------------------------
    t0 = time.monotonic()
    funnel, survivors = run_funnel(pages)
    report = [r.asDict() for r in funnel.collect()]
    funnel_sec = time.monotonic() - t0

    out_dir = os.path.join(args.workdir, "funnel_out")
    t0 = time.monotonic()
    survivors.write.mode("overwrite").parquet(os.path.join(out_dir, "survivors"))
    surv_sec = time.monotonic() - t0
    kept = spark.read.parquet(os.path.join(out_dir, "survivors"))

    t0 = time.monotonic()
    mix = mixture_sample(
        kept.withColumn("source", F.regexp_extract("url", r"https://(site\d+)", 1)),
        token_budget_per_source=20_000,
        id_col="url",
        text_col="text",
    ).collect()
    n_sampled = int(sum(r["kept_docs"] for r in mix))
    rates_rows = len(mix)
    n_downsampled = sum(1 for r in mix if r["rate"] < 1.0)
    mix_sec = time.monotonic() - t0

    # ---- ~1% sample vs DuckDB replay ------------------------------------
    sample_pred = F.conv(F.substring(F.md5("url"), 1, 8), 16, 10).cast(
        "bigint"
    ) % 100 == 7
    sample = pages.where(sample_pred)
    sample_path = os.path.join(args.workdir, "funnel_sample.parquet")
    sample.coalesce(4).write.mode("overwrite").parquet(sample_path)
    t0 = time.monotonic()
    s_funnel, _ = run_funnel(spark.read.parquet(sample_path))
    spark_sample = [
        (r["stage_idx"], r["stage"], r["n_docs"]) for r in s_funnel.collect()
    ]
    sample_sec = time.monotonic() - t0
    duck_sample = [(int(i), s, int(n)) for i, s, n in _duckdb_replay(
        os.path.join(sample_path, "*.parquet")
    )]
    sample_match = spark_sample == duck_sample

    result = {
        "metric": "sf1_funnel_soak",
        "pages": args.pages,
        "cpus": args.cpus,
        "hw_probe_mb_per_sec": hw_probe,
        "gen_sec": round(gen_sec, 1),
        "funnel_report_sec": round(funnel_sec, 1),
        "survivors_write_sec": round(surv_sec, 1),
        "mixture_sample_sec": round(mix_sec, 1),
        "funnel": report,
        "mixture_sampled_docs": n_sampled,
        "mixture_sources": rates_rows,
        "mixture_downsampled_sources": n_downsampled,
        "sample_docs": sum(n for i, s, n in spark_sample if s == "input"),
        "sample_funnel_sec": round(sample_sec, 1),
        "sample_matches_duckdb": sample_match,
        "sample_spark": spark_sample,
        "sample_duckdb": duck_sample,
    }
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
