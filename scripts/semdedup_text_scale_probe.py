"""semantic_text_dedup scale probe: the FULL text -> semantic-dedup
tier (signed hashed-TF arrow embedding + fixed-point k-means + cosine
prune) at 1M+ real-shaped pages.

Corpus: the sf1 soak pages (~230 words/doc) + a reversed-token copy of
a deterministic ~10% sample under url#perm — permuted copies share the
exact bag of words, so they embed IDENTICALLY (cosine 1) while being
invisible to exact/passage text dedup.  Validation: no planted pair may
have BOTH sides kept when co-clustered (identical embeddings in one
cluster always prune one), and planted-pair co-cluster rate = the
k-means recall knob.  Natural removals are expected: the soak corpus
plants near-dup clusters of its own (oracle_clusters.parquet), which
hashed-TF cosine legitimately sees.  Writes
BENCH/r7_semdedup_text_probe.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PAGES = int(os.environ.get("SDT_PAGES", "1000000"))
CPUS = int(os.environ.get("SDT_CPUS", "16"))
K = int(os.environ.get("SDT_K", "2048"))
DIM = int(os.environ.get("SDT_DIM", "64"))
WORKDIR = os.environ.get("SDT_WORKDIR", "/tmp/sf1_soak")


def main() -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    import bench as bench_mod
    from mashing_pumpkins_spark.functions.embed import embed_documents
    from mashing_pumpkins_spark.operators.semdedup import semdedup
    from mashing_pumpkins_spark.sources.synthetic import write_pages_parquet

    hw_probe = {"1": bench_mod._hw_probe(1), "4": bench_mod._hw_probe(4)}
    corpus_dir = os.path.join(WORKDIR, f"pages_{PAGES}")
    if not os.path.exists(os.path.join(corpus_dir, "pages.parquet")):
        print(f"generating {PAGES} pages ...", flush=True)
        write_pages_parquet(corpus_dir, PAGES, seed=42)

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(4 * CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "4m")
        .config("spark.driver.memory", "40g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    pages = spark.read.parquet(os.path.join(corpus_dir, "pages.parquet")).select(
        "url", "text"
    )
    planted = pages.where(F.crc32(F.col("url")) % 10 == 3).select(
        F.concat(F.col("url"), F.lit("#perm")).alias("url"),
        F.array_join(F.reverse(F.split(F.trim("text"), r"\s+")), " ").alias("text"),
    )
    docs = pages.unionAll(planted).repartition(4 * CPUS).persist()
    n_docs = docs.count()
    n_planted = planted.count()
    text_bytes = docs.select(
        F.sum(F.octet_length("text")).alias("b")
    ).first()["b"]

    # stage 1: embedding alone (the new arrow bulk path), timed to a sum
    t0 = time.monotonic()
    emb = embed_documents(docs, dim=DIM, id_col="url", backend="arrow").persist()
    emb.select(F.sum(F.element_at("embedding", 1))).first()
    embed_sec = time.monotonic() - t0

    # stage 2: the fixed-point semdedup pass on the persisted embeddings
    t1 = time.monotonic()
    out = semdedup(
        emb, n_clusters=K, tau_ppm=980_000, n_iters=2, id_col="url"
    ).persist()
    n_out = out.count()
    dedup_sec = time.monotonic() - t1

    base_url = F.regexp_replace(F.col("url"), r"#perm$", "")
    is_planted_pair = F.crc32(base_url) % 10 == 3
    pairs = (
        out.where(is_planted_pair)
        .groupBy(base_url.alias("bu"))
        .agg(
            F.sum(F.col("kept").cast("int")).alias("nk"),
            F.count_distinct("cluster_id").alias("nc"),
            F.count(F.lit(1)).alias("nm"),
        )
        .where(F.col("nm") == 2)
    ).persist()
    n_pairs = pairs.count()
    cocl = pairs.where(F.col("nc") == 1).count()
    both_kept_cocl = pairs.where((F.col("nc") == 1) & (F.col("nk") == 2)).count()
    n_removed = out.where(~F.col("kept")).count()

    wall = embed_sec + dedup_sec
    report = {
        "probe": "semantic_text_dedup at 1M+10% planted permuted copies",
        "n_docs": n_docs,
        "n_planted_pairs": n_pairs,
        "dim": DIM,
        "n_clusters": K,
        "n_iters": 2,
        "tau_ppm": 980_000,
        "cpus": CPUS,
        "hw_probe_mb_per_sec": hw_probe,
        "embed_sec": round(embed_sec, 1),
        "embed_docs_per_sec": round(n_docs / embed_sec, 1),
        "embed_mb_per_sec": round(text_bytes / 1e6 / embed_sec, 1),
        "dedup_sec": round(dedup_sec, 1),
        "total_sec": round(wall, 1),
        "docs_per_sec": round(n_docs / wall, 1),
        "pairs_coclustered": cocl,
        "cocluster_rate": round(cocl / max(n_pairs, 1), 6),
        "coclustered_pairs_both_kept": both_kept_cocl,
        "n_removed_total": n_removed,
    }
    # invariant: a co-clustered identical pair can never keep both sides
    report["ok"] = bool(
        n_planted_pairs_ok := (both_kept_cocl == 0 and n_pairs == n_planted and cocl > 0)
    )
    path = os.path.join(REPO, "BENCH", "r7_semdedup_text_probe.json")
    with open(path, "w") as fh:
        json.dump(report, fh, indent=2)
    print(json.dumps(report, indent=2), flush=True)
    spark.stop()
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
