"""One-pass multi-sketch: equality with separate passes + single-Python-stage
plan guarantee (reference SketchList analog, parallel.py:56-122)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mashing_pumpkins_spark.config import SketchConfig
from mashing_pumpkins_spark.functions.simhash import make_simhash_udf
from mashing_pumpkins_spark.operators.multisketch import multi_sketch_table
from mashing_pumpkins_spark.operators.signature import (
    make_counted_signature_udf,
    sketch_table,
)

CFG = SketchConfig(nsize=21, maxsize=128, hash_name="xxh64", seed=0)


@pytest.fixture(scope="module")
def docs(spark):
    from mashing_pumpkins_spark.sources.synthetic import generate_pages

    pages_pd, _ = generate_pages(120, seed=77)
    return spark.createDataFrame(pages_pd)


def test_multi_sketch_equals_separate_passes(spark, docs):
    multi = {
        r["url"]: (list(r["sig"]), r["nvisited"], r["simhash"])
        for r in multi_sketch_table(docs, CFG).collect()
    }
    sigs = {
        r["url"]: (list(r["sig"]), r["nvisited"])
        for r in sketch_table(docs, CFG).collect()
    }
    sims = {
        r["url"]: r["sh"]
        for r in docs.select(
            "url", make_simhash_udf(0)(F.col("text")).alias("sh")
        ).collect()
    }
    assert set(multi) == set(sigs)
    for url, (sig, nv, sh) in multi.items():
        assert (sig, nv) == sigs[url], url
        assert sh == sims[url], url


def test_multi_sketch_counted_variant(spark, docs):
    sample = docs.limit(20)
    multi = {
        r["url"]: (list(r["counted_hashes"]), list(r["counts"]))
        for r in multi_sketch_table(sample, CFG, include_counted=True).collect()
    }
    udf = make_counted_signature_udf(CFG)
    sep = {
        r["url"]: (list(r["c"]["hashes"]), list(r["c"]["counts"]))
        for r in sample.select("url", udf(F.col("text")).alias("c")).collect()
    }
    assert multi == sep


def test_multi_sketch_plan_has_one_python_stage(spark, docs):
    """Both the MinHash-derived and SimHash-derived outputs must come from
    ONE ArrowEvalPython node — the whole point vs two text scans."""
    out = multi_sketch_table(docs, CFG).select(
        "url", F.size("sig").alias("k"), "simhash"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1, plan
