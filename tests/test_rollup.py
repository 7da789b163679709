"""Group sketch rollup: Spark grouped merge == heap-oracle merge; plus the
KMV distinct-count estimator property the sketch carries for free."""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
import pytest

from mashing_pumpkins_spark.config import SketchConfig
from mashing_pumpkins_spark.hashkernels import i64_to_u64
from mashing_pumpkins_spark.operators.rollup import group_sketch_rollup
from mashing_pumpkins_spark.reference_semantics import HeapSketch


def test_rollup_matches_heap_oracle_merge(spark):
    cfg = SketchConfig(nsize=21, maxsize=32, hash_name="xxh64", seed=0)
    rng = random.Random(4)
    rows = []
    for i in range(40):
        words = " ".join(f"w{rng.randrange(400)}" for _ in range(60))
        rows.append((f"g{i % 3}", f"d{i}", words))
    docs = spark.createDataFrame(rows, "source string, doc_id string, text string")
    rolled = {
        r["group"]: r
        for r in group_sketch_rollup(docs, cfg, "source").collect()
    }
    for g in ("g0", "g1", "g2"):
        oracle = HeapSketch(cfg)
        for src, _d, text in rows:
            if src == g:
                oracle.update(HeapSketch(cfg).add(text.encode("utf-8")))
        got = i64_to_u64(np.array(rolled[g]["sig"], dtype=np.int64)).tolist()
        assert got == oracle.sorted_values(), g
        assert rolled[g]["nvisited"] == oracle.nvisited, g


def test_kmv_distinct_count_estimator():
    """The bottom-k sketch IS a KMV distinct-count estimator:
    n_hat = (k-1) * 2^64 / h_(k) (SURVEY §2.2 aggregation row)."""
    from mashing_pumpkins_spark.functions.sketch_np import signature

    cfg = SketchConfig(nsize=8, maxsize=256, hash_name="xxh64", seed=0)
    rng = random.Random(8)
    data = bytes(rng.randrange(256) for _ in range(60000))
    sig, _ = signature(data, cfg)
    true_distinct = len({data[i : i + 8] for i in range(len(data) - 7)})
    kth = int(sig[-1])
    est = (cfg.maxsize - 1) * (2**64) / kth
    assert est == pytest.approx(true_distinct, rel=0.15)
