"""Tests: simhash, ANN (exact + LSH recall), multimodal plumbing, streaming."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mashing_pumpkins_spark.config import SketchConfig
from mashing_pumpkins_spark.functions.simhash import (
    _simhash_tokens,
    hamming64,
    simhash_near_pairs,
)
from mashing_pumpkins_spark.operators.ann import cosine_topk, lsh_cosine_topk
from mashing_pumpkins_spark.operators.multimodal import (
    decode_image,
    extract_binary_features,
)


def test_simhash_properties():
    a = _simhash_tokens("the quick brown fox jumps over the lazy dog".split(), 0)
    b = _simhash_tokens("the quick brown fox jumps over the lazy cat".split(), 0)
    c = _simhash_tokens("completely different words entirely unrelated".split(), 0)

    def ham(x, y):
        return bin((x & (1 << 64) - 1) ^ (y & (1 << 64) - 1)).count("1")

    assert ham(a, a) == 0
    assert ham(a, b) < ham(a, c)
    assert _simhash_tokens([], 0) == 0
    # order-insensitive (bag of words)
    d = _simhash_tokens("dog lazy the over jumps fox brown quick the".split(), 0)
    assert d == a


def test_simhash_near_pairs_spark(spark):
    import random

    rng = random.Random(5)
    base = [f"tok{rng.randrange(500)}" for _ in range(120)]
    near = list(base)
    near[10] = "changed"  # 1/120 token edit -> tiny hamming distance
    other = [f"unrelated{rng.randrange(500)}" for _ in range(120)]
    rows = [
        (0, " ".join(base)),
        (1, " ".join(near)),
        (2, " ".join(other)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = simhash_near_pairs(df, max_hamming=8).collect()
    ids = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 1) in ids
    assert (0, 2) not in ids and (1, 2) not in ids


def test_hamming64_column(spark):
    df = spark.createDataFrame([(0b1011, 0b0001)], "a long, b long")
    assert df.select(hamming64(F.col("a"), F.col("b")).alias("h")).first()["h"] == 2


def _random_unit_vectors(n, dim, seed):
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((n, dim))
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def test_ann_exact_matches_numpy(spark):
    vecs = _random_unit_vectors(60, 16, 7)
    pdf = pd.DataFrame(
        {"vec_id": range(60), "embedding": [v.astype(np.float32).tolist() for v in vecs]}
    )
    df = spark.createDataFrame(pdf)
    out = cosine_topk(df, df.where(F.col("vec_id") < 3), k=4).collect()
    sims = vecs @ vecs.T
    for qid in range(3):
        order = [
            i for i in np.argsort(-np.round(sims[qid], 6), kind="stable") if i != qid
        ][:4]
        got = [r["neighbor_id"] for r in out if r["query_id"] == qid]
        assert got == order, qid


def test_ann_lsh_recall_vs_exact(spark):
    """LSH must recover planted near-duplicate neighbors (cos >= ~0.95);
    random far-apart vectors are exactly what hyperplane LSH prunes."""
    rng = np.random.default_rng(11)
    base = _random_unit_vectors(10, 32, 11)
    planted = base + rng.standard_normal((10, 32)) * 0.05  # near-dup of each query
    planted = planted / np.linalg.norm(planted, axis=1, keepdims=True)
    noise = _random_unit_vectors(200, 32, 13)
    all_vecs = np.vstack([base, planted, noise])
    pdf = pd.DataFrame(
        {
            "vec_id": range(len(all_vecs)),
            "embedding": [v.astype(np.float32).tolist() for v in all_vecs],
        }
    )
    df = spark.createDataFrame(pdf)
    queries = df.where(F.col("vec_id") < 10)
    approx = lsh_cosine_topk(df, queries, k=3, n_planes=64).collect()
    top1 = {r["query_id"]: r["neighbor_id"] for r in approx if r["rank"] == 1}
    # each query's nearest planted twin (vec_id = query+10) must be found
    hits = sum(1 for q in range(10) if top1.get(q) == q + 10)
    assert hits >= 9, (hits, top1)


def test_ann_ivf_recall_on_planted_twins(spark):
    from mashing_pumpkins_spark.operators.ann import ivf_cosine_topk

    rng = np.random.default_rng(21)
    base = _random_unit_vectors(10, 32, 21)
    planted = base + rng.standard_normal((10, 32)) * 0.05
    planted = planted / np.linalg.norm(planted, axis=1, keepdims=True)
    noise = _random_unit_vectors(200, 32, 23)
    all_vecs = np.vstack([base, planted, noise])
    pdf = pd.DataFrame(
        {
            "vec_id": range(len(all_vecs)),
            "embedding": [v.astype(np.float32).tolist() for v in all_vecs],
        }
    )
    df = spark.createDataFrame(pdf)
    approx = ivf_cosine_topk(
        df, df.where(F.col("vec_id") < 10), k=3, n_cells=8, n_probe=3
    ).collect()
    top1 = {r["query_id"]: r["neighbor_id"] for r in approx if r["rank"] == 1}
    hits = sum(1 for q in range(10) if top1.get(q) == q + 10)
    assert hits >= 9, (hits, top1)


def test_multimodal_plumbing(spark):
    df = spark.createDataFrame(
        [("u1", b"\x00\x10\x20\xff"), ("u2", None), ("u3", b"")],
        "url string, payload binary",
    )
    out = {r["url"]: r for r in extract_binary_features(df, "url", "payload").collect()}
    assert out["u1"]["payload_bytes"] == 4
    assert len(out["u1"]["features"]) == 16
    assert abs(sum(out["u1"]["features"]) - 1.0) < 1e-9
    assert out["u2"]["payload_bytes"] == 0
    assert sum(out["u3"]["features"]) == 0.0
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff")  # decode is explicitly stubbed


def test_streaming_sketch_aggregate(spark, tmp_path):
    """Two micro-batches of chunks -> state equals the merged sketch of all
    chunks (reference map/reduce equivalence, test_parallel.py:80-105)."""
    from mashing_pumpkins_spark.functions.sketch_np import (
        merge_signatures,
        signature,
    )
    from mashing_pumpkins_spark.hashkernels import i64_to_u64
    from mashing_pumpkins_spark.streaming.sketch_stream import (
        streaming_sketch_aggregate,
    )

    cfg = SketchConfig(nsize=5, maxsize=16, hash_name="xxh64", seed=0)
    src = tmp_path / "stream_src"
    src.mkdir()
    chunk1 = "the quick brown fox jumps over the lazy dog " * 3
    chunk2 = "pack my box with five dozen liquor jugs " * 3
    pd.DataFrame({"key": ["k1"], "text": [chunk1]}).to_parquet(src / "b1.parquet")
    pd.DataFrame({"key": ["k1"], "text": [chunk2]}).to_parquet(src / "b2.parquet")

    stream = spark.readStream.schema("key string, text string").parquet(str(src))
    out = streaming_sketch_aggregate(stream, cfg)
    q = (
        out.writeStream.format("memory")
        .queryName("sketch_stream_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "select * from sketch_stream_test order by nvisited desc limit 1"
    ).collect()
    assert rows, "no streaming output"
    got = i64_to_u64(np.array(rows[0]["sig"], dtype=np.int64)).tolist()
    s1, nv1 = signature(chunk1.encode(), cfg)
    s2, nv2 = signature(chunk2.encode(), cfg)
    expect = merge_signatures(s1, s2, cfg.maxsize).tolist()
    assert got == expect
    assert rows[0]["nvisited"] == nv1 + nv2
