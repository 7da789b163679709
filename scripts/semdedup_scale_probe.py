"""SemDedup scale probe: 1M x 64-dim embeddings with 100k planted
semantic duplicates.

Corpus: 900k base vectors (seeded per-partition normal draws) + 100k
planted duplicates — a 0.99-scaled copy of each of the first 100k
vectors under id+900000 (cosine ~1 after quantization).  Run
semdedup(n_clusters=2048 -> numpy assignment backend, tau=0.95,
2 Lloyd iterations) and verify the planted structure: every pruned row
must be one side of a planted pair (no false positives at 0.95 on
random normals), and pair recall = fraction of planted pairs that were
co-clustered and pruned.  Writes BENCH/r7_semdedup_probe.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_BASE = int(os.environ.get("SD_BASE", "900000"))
N_DUP = int(os.environ.get("SD_DUP", "100000"))
DIM = 64
K = int(os.environ.get("SD_K", "2048"))
CPUS = int(os.environ.get("SD_CPUS", "16"))
WORK = os.environ.get("SD_WORKDIR", "/tmp/semdedup_probe")


def main() -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from mashing_pumpkins_spark.operators.semdedup import semdedup

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

    corpus = os.path.join(WORK, f"emb_{N_BASE + N_DUP}.parquet")
    if not os.path.exists(corpus):
        import numpy as np
        import pandas as pd

        def gen(batches):
            for pdf in batches:
                ids = pdf["id"].to_numpy()
                out = []
                for i in ids:
                    rng = np.random.default_rng(7_000_000 + int(i))
                    out.append((rng.standard_normal(DIM) * 0.15).astype(np.float32))
                yield pd.DataFrame(
                    {"vec_id": ids, "embedding": [list(map(float, v)) for v in out]}
                )

        base = (
            spark.range(N_BASE)
            .repartition(4 * CPUS)
            .mapInPandas(gen, "vec_id long, embedding array<float>")
        )
        copies = base.where(F.col("vec_id") < N_DUP).select(
            (F.col("vec_id") + 900_000).alias("vec_id"),
            F.transform(
                "embedding", lambda x: (x.cast("double") * F.lit(0.99)).cast("float")
            ).alias("embedding"),
        )
        base.unionAll(copies).write.mode("overwrite").parquet(corpus)
        print(f"corpus written: {corpus}", flush=True)

    emb = spark.read.parquet(corpus)
    t0 = time.monotonic()
    out = semdedup(emb, n_clusters=K, tau_ppm=950_000, n_iters=2)
    n_total = out.count()
    wall = time.monotonic() - t0

    removed = out.where(~F.col("kept")).select("vec_id")
    n_removed = removed.count()
    # every removed row must belong to a planted pair
    pair_key = F.when(
        F.col("vec_id") >= 900_000, F.col("vec_id") - 900_000
    ).otherwise(F.col("vec_id"))
    bad = removed.where(pair_key >= N_DUP).count()
    # pairs where BOTH sides survived (not co-clustered or missed)
    both_kept = (
        out.where(pair_key < N_DUP)
        .groupBy(pair_key.alias("pk"))
        .agg(F.sum(F.col("kept").cast("int")).alias("nk"))
        .where(F.col("nk") == 2)
        .count()
    )
    # co-clustering of planted pairs (the k-means leg of recall)
    co = (
        out.where(pair_key < N_DUP)
        .groupBy(pair_key.alias("pk"))
        .agg(F.count_distinct("cluster_id").alias("nc"))
        .where(F.col("nc") == 1)
        .count()
    )
    report = {
        "probe": "semdedup at 1M x 64-dim, 100k planted 0.99-scaled duplicates",
        "n_vectors": n_total,
        "dim": DIM,
        "n_clusters": K,
        "n_iters": 2,
        "tau_ppm": 950_000,
        "assign_backend": "numpy (auto: k > 64)",
        "cpus": CPUS,
        "wall_sec": round(wall, 1),
        "docs_per_sec": round(n_total / wall, 1),
        "n_removed": n_removed,
        "false_positive_removals": bad,
        "planted_pairs": N_DUP,
        "pairs_coclustered": co,
        "pairs_both_kept": both_kept,
        "pair_recall": round(1.0 - both_kept / N_DUP, 6),
    }
    ok = bad == 0 and n_removed > 0 and report["pair_recall"] >= 0.99
    report["ok"] = ok
    path = os.path.join(REPO, "BENCH", "r7_semdedup_probe.json")
    with open(path, "w") as fh:
        json.dump(report, fh, indent=2)
    print(json.dumps(report, indent=2), flush=True)
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
