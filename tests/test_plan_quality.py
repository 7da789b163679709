"""Physical-plan regression guards: the pipeline must never degenerate into
cartesian products or unpruned scans (the 100TB failure modes)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mashing_pumpkins_spark.config import PipelineConfig
from mashing_pumpkins_spark.operators.banding import band_table
from mashing_pumpkins_spark.operators.candidates import candidate_pairs
from mashing_pumpkins_spark.operators.signature import sketch_table
from mashing_pumpkins_spark.operators.verify import verified_edges
from mashing_pumpkins_spark.sources.synthetic import generate_pages


@pytest.fixture(scope="module")
def plan_frames(spark):
    pages_pd, _ = generate_pages(200, seed=9)
    pages = spark.createDataFrame(pages_pd)
    cfg = PipelineConfig()
    sigs = sketch_table(pages, cfg.sketch)
    bands = band_table(sigs, cfg)
    pairs, _ = candidate_pairs(bands, cfg)
    edges = verified_edges(pairs, sigs, cfg, broadcast_cap_bytes=0)
    return {"bands": bands, "pairs": pairs, "edges": edges}


@pytest.mark.parametrize("name", ["bands", "pairs", "edges"])
def test_no_cartesian_product(plan_frames, name):
    plan = plan_frames[name]._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name


def test_band_join_is_equi_join(plan_frames):
    plan = plan_frames["pairs"]._jdf.queryExecution().executedPlan().toString()
    # within-bucket pairing must be a hash/sort-merge equi-join on band key
    assert "band_key" in plan
    assert "Join" in plan
