"""Long-doc sharding: chunked sketching must be bit-identical to whole-doc
sketching (the Spark analog of the reference's chunk/merge equivalence,
/root/reference/src/tests/test_minhashsketch.py:131-203)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mashing_pumpkins_spark.config import PipelineConfig, SketchConfig
from mashing_pumpkins_spark.functions.sketch_np import merge_signatures, signature
from mashing_pumpkins_spark.operators.sharding import (
    chunk_spans,
    shard_documents,
    sketch_table_sharded,
)
from mashing_pumpkins_spark.operators.signature import sketch_table

CFG = SketchConfig(nsize=21, maxsize=256, hash_name="xxh64", seed=0)


def test_chunk_spans_reference_example():
    # /root/reference/src/sequence.py docstring: nsize=3, lseq=10, w=5
    assert chunk_spans(3, 10, 5) == [(0, 5), (3, 8), (6, 10)]


def test_chunk_spans_cover_every_window_exactly_once():
    for nsize, lseq, w in [(3, 10, 5), (21, 1000, 64), (21, 999, 100),
                           (5, 23, 5), (21, 20, 64), (21, 21, 21)]:
        spans = chunk_spans(nsize, lseq, w)
        windows = []
        for beg, end in spans:
            windows.extend(range(beg, end - nsize + 1))
        expected = list(range(max(0, lseq - nsize + 1)))
        assert windows == expected, (nsize, lseq, w)


def test_numpy_chunk_merge_equals_whole_doc():
    rng = np.random.default_rng(13)
    # multibyte text so chunk boundaries cut characters mid-sequence
    words = ["alpha", "βήτα", "гамма", "delta", "北京烤鸭", "naïve"]
    text = " ".join(words[rng.integers(0, len(words))] for _ in range(5000))
    data = text.encode("utf-8")
    whole_sig, whole_nv = signature(data, CFG)
    for w in [64, 1000, 4096, len(data) + 10]:
        acc = np.empty(0, dtype=np.uint64)
        nv = 0
        for beg, end in chunk_spans(CFG.nsize, len(data), w):
            s, n = signature(data[beg:end], CFG)
            acc = merge_signatures(acc, s, CFG.maxsize, CFG.minmax)
            nv += n
        assert acc.tolist() == whole_sig.tolist(), w
        assert nv == whole_nv, w


@pytest.fixture(scope="module")
def longdoc_pages(spark):
    rng = np.random.default_rng(31)
    words = [f"w{i}" for i in range(300)] + ["héllo", "мир", "世界"]
    rows = {"url": [], "text": []}
    for i in range(40):
        n = int(rng.integers(5, 4000))  # a few docs far exceed chunk_bytes
        rows["url"].append(f"https://site.example/{i:03d}")
        rows["text"].append(" ".join(words[rng.integers(0, len(words))] for _ in range(n)))
    rows["url"].append("https://site.example/short")
    rows["text"].append("tiny")  # < nsize: empty sketch row must survive
    return spark.createDataFrame(pd.DataFrame(rows))


def test_sketch_table_sharded_matches_unsharded(spark, longdoc_pages):
    plain = {
        r["url"]: (list(r["sig"]), r["nvisited"])
        for r in sketch_table(longdoc_pages, CFG).collect()
    }
    sharded = {
        r["url"]: (list(r["sig"]), r["nvisited"])
        for r in sketch_table_sharded(longdoc_pages, CFG, chunk_bytes=2048).collect()
    }
    assert plain == sharded


def test_shard_documents_bounds_chunk_size(spark, longdoc_pages):
    chunks = shard_documents(longdoc_pages, CFG, chunk_bytes=2048).collect()
    assert all(len(r["payload"]) <= 2048 for r in chunks)
    n_urls = longdoc_pages.count()
    assert len({r["url"] for r in chunks}) == n_urls
    assert len(chunks) > n_urls  # long docs really were split


def test_pipeline_with_sharding_same_clusters(spark, longdoc_pages, tmp_path_factory):
    from mashing_pumpkins_spark.plans.pipeline import run_pipeline

    base_cfg = PipelineConfig(sketch=CFG, n_bands=32, rows_per_band=8)
    shard_cfg = PipelineConfig(
        sketch=CFG, n_bands=32, rows_per_band=8, shard_chunk_bytes=2048
    )
    c1, _ = run_pipeline(
        spark, longdoc_pages, base_cfg, str(tmp_path_factory.mktemp("ck_a"))
    )
    c2, _ = run_pipeline(
        spark, longdoc_pages, shard_cfg, str(tmp_path_factory.mktemp("ck_b"))
    )
    a1 = sorted((r["url"], r["cluster_id"]) for r in c1.collect())
    a2 = sorted((r["url"], r["cluster_id"]) for r in c2.collect())
    assert a1 == a2
