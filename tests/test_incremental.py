"""Batch incremental near-dup admission against a committed index."""

from __future__ import annotations

from pyspark.sql import functions as F

from mashing_pumpkins_spark.config import PipelineConfig, SketchConfig
from mashing_pumpkins_spark.operators.incremental import (
    incremental_near_dup,
    index_tables,
)


def _cfg():
    return PipelineConfig(
        sketch=SketchConfig(nsize=21, maxsize=1 << 30, hash_name="xxh64", seed=0),
        n_bands=32,
        rows_per_band=8,
        jaccard_threshold=0.8,
    )


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "url string, text string")


def _doc(tag, n=60):
    return " ".join(f"{tag}w{j}" for j in range(n))


def test_incremental_admission_splits_matches_and_fresh(spark):
    cfg = _cfg()
    committed = _corpus(
        spark, [(f"c{i}", _doc(f"c{i}")) for i in range(4)]
    )
    sigs, bands = index_tables(committed, cfg)
    near_c2 = _doc("c2").replace("c2w59", "changed")
    batch = _corpus(
        spark,
        [
            ("b1", near_c2),  # near-dup of committed c2
            ("b2", _doc("bx")),  # intra-batch pair with b3
            ("b3", _doc("bx").replace("bxw59", "altered")),
            ("b4", _doc("b4")),  # genuinely fresh
        ],
    )
    matches, fresh = incremental_near_dup(batch, sigs, bands, cfg)
    m = [(r.new_url, r.match_url) for r in matches.collect()]
    assert m == [("b1", "c2")]
    assert all(r.jaccard >= 0.8 for r in matches.collect())
    assert sorted(r.url for r in fresh.collect()) == ["b2", "b4"]  # b3 collapsed


def test_incremental_index_delta_appends_cleanly(spark):
    cfg = _cfg()
    committed = _corpus(spark, [(f"c{i}", _doc(f"c{i}")) for i in range(3)])
    sigs, bands = index_tables(committed, cfg)
    batch = _corpus(spark, [("b1", _doc("b1")), ("b2", _doc("b2"))])
    _matches, fresh = incremental_near_dup(batch, sigs, bands, cfg)
    d_sigs, d_bands = index_tables(fresh, cfg)
    assert d_sigs.schema == sigs.schema and d_bands.schema == bands.schema
    merged_sigs = sigs.unionByName(d_sigs)
    merged_bands = bands.unionByName(d_bands)
    # re-submitting the same texts under new urls now matches the merged
    # index (same-url self-matches are excluded by design)
    resubmit = _corpus(spark, [("r1", _doc("b1")), ("r2", _doc("b2"))])
    matches2, fresh2 = incremental_near_dup(
        resubmit, merged_sigs, merged_bands, cfg, intra_batch=False
    )
    assert sorted((r.new_url, r.match_url) for r in matches2.collect()) == [
        ("r1", "b1"),
        ("r2", "b2"),
    ]
    assert fresh2.count() == 0


def test_incremental_without_intra_batch_keeps_both_twins(spark):
    cfg = _cfg()
    committed = _corpus(spark, [("c0", _doc("c0"))])
    sigs, bands = index_tables(committed, cfg)
    batch = _corpus(
        spark,
        [("b2", _doc("bx")), ("b3", _doc("bx").replace("bxw59", "altered"))],
    )
    _m, fresh = incremental_near_dup(batch, sigs, bands, cfg, intra_batch=False)
    assert sorted(r.url for r in fresh.collect()) == ["b2", "b3"]
