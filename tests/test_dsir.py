"""DSIR-style importance resampling (operators/dsir.py).

Reference semantics: Xie et al. 2023 — hashed unigram+bigram bag
models, importance weight = log p_target - log p_raw, top-k selection
as the deterministic limit of Gumbel resampling."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from mashing_pumpkins_spark.operators.dsir import (
    dsir_scores,
    dsir_top_k,
    fit_hashed_ngram_model,
)


def _bucket(f: str, n: int) -> int:
    return int(hashlib.md5(f.encode()).hexdigest()[:8], 16) % n


def _feats(text: str) -> list[str]:
    w = text.lower().strip().split()
    return w + [" ".join(w[i : i + 2]) for i in range(len(w) - 1)]


def test_fit_counts_match_python_bucketing(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "b c")], "doc_id long, text string"
    )
    m = fit_hashed_ngram_model(docs, n_buckets=16)
    want = Counter(_bucket(f, 16) for t in ("a b c", "b c") for f in _feats(t))
    got = {r["b"]: r["c"] for r in m.counts.collect()}
    assert got == dict(want)
    assert m.total == sum(want.values()) == 8  # 5 unigrams + 3 bigrams


def test_scores_match_python_recompute(spark):
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    mk = lambda n: " ".join(rng.choice(vocab) for _ in range(n))
    target_rows = [(i, mk(rng.randint(5, 40))) for i in range(15)]
    raw_rows = [(100 + i, mk(rng.randint(0, 25))) for i in range(25)]
    B = 64
    target = fit_hashed_ngram_model(
        spark.createDataFrame(target_rows, "doc_id long, text string"), B
    )
    raw_df = spark.createDataFrame(raw_rows, "doc_id long, text string")
    raw = fit_hashed_ngram_model(raw_df, B)

    ct = Counter(_bucket(f, B) for _, t in target_rows for f in _feats(t))
    cr = Counter(_bucket(f, B) for _, t in raw_rows for f in _feats(t))
    tt, tr = sum(ct.values()), sum(cr.values())
    assert (target.total, raw.total) == (tt, tr)

    got = {r["doc_id"]: r for r in dsir_scores(raw_df, target, raw).collect()}
    for i, t in raw_rows:
        fs = _feats(t)
        want = sum(
            math.floor(math.log((ct.get(_bucket(f, B), 0) + 1) / (tt + B)) * 1e6)
            - math.floor(math.log((cr.get(_bucket(f, B), 0) + 1) / (tr + B)) * 1e6)
            for f in fs
        )
        assert got[i]["n_feats"] == len(fs), i
        assert got[i]["weight_e6"] == want, i


def test_top_k_prefers_target_like_docs(spark):
    """Docs drawn from the target vocabulary must outrank docs from a
    disjoint vocabulary, and blank docs never select."""
    target = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(20))) for i in range(5)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [(1, " ".join(f"t{j}" for j in range(15)))]  # target-like
        + [(2, " ".join(f"t{j}" for j in range(8)))]  # target-like, shorter
        + [(3, " ".join(f"z{j}" for j in range(15)))]  # off-distribution
        + [(4, "")],  # blank: zero features
        "doc_id long, text string",
    )
    picked = dsir_top_k(raw, target, k=2, n_buckets=256).collect()
    assert [r["doc_id"] for r in picked] == [1, 2]
    all3 = dsir_top_k(raw, target, k=10, n_buckets=256).collect()
    assert [r["doc_id"] for r in all3] == [1, 2, 3]  # blank doc excluded
    # the off-distribution doc carries the lowest weight
    assert all3[-1]["weight_e6"] < all3[1]["weight_e6"]


def test_validation_errors(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    a = fit_hashed_ngram_model(docs, n_buckets=8)
    b = fit_hashed_ngram_model(docs, n_buckets=16)
    with pytest.raises(ValueError):
        dsir_scores(docs, a, b)
    with pytest.raises(ValueError):
        dsir_top_k(docs, docs, k=0)
    with pytest.raises(ValueError):
        fit_hashed_ngram_model(docs, n_buckets=0)


def test_plan_broadcast_models_and_top_k_shape(spark):
    """Model joins broadcast (B-row tables) and selection plans as
    TakeOrderedAndProject — only k rows leave each partition. Since
    round 8 dsir_top_k returns an eagerly-materialized (localCheckpoint)
    result so the fused model cache can be released, so the scoring +
    selection plan is asserted on the pre-checkpoint composition."""
    docs = spark.createDataFrame(
        [(i, "a b c d e") for i in range(20)], "doc_id long, text string"
    )
    target = fit_hashed_ngram_model(docs, n_buckets=32)
    raw = fit_hashed_ngram_model(docs, n_buckets=32)
    scores = dsir_scores(docs, target, raw)
    sel = (
        scores.where(F.col("n_feats") > 0)
        .orderBy(F.col("weight_e6").desc(), F.col("doc_id").asc())
        .limit(3)
    )
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    target.counts.unpersist()
    raw.counts.unpersist()
    # the public dsir_top_k result must be lineage-truncated (checkpoint
    # scan), so its internal caches can never be recomputed-after-release
    out = dsir_top_k(docs, docs, k=3, n_buckets=32)
    assert "ExistingRDD" in out._jdf.queryExecution().executedPlan().toString()
