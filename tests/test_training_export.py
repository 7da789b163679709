"""Training-shard export: deterministic assignment, manifest lineage,
writer/reader roundtrip, physical order, task-commit hygiene, plan shape."""

from __future__ import annotations

import glob
import gzip
import hashlib
import json
import os
import shutil
import tempfile

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructField

from mashing_pumpkins_spark.sources.training_export import (
    choose_n_shards,
    export_training_shards,
    read_training_shards,
    shard_assignment,
    shard_manifest,
    write_training_shards,
)


def test_choose_n_shards():
    gb = 1 << 30
    assert choose_n_shards(0) == 1
    assert choose_n_shards(1) == 1
    assert choose_n_shards(gb) == 1
    assert choose_n_shards(gb + 1) == 2
    assert choose_n_shards(100 * gb) == 100
    assert choose_n_shards(10 * gb, target_shard_bytes=2 * gb) == 5
    assert choose_n_shards(5, min_shards=8) == 8
    with pytest.raises(ValueError):
        choose_n_shards(-1)
    with pytest.raises(ValueError):
        choose_n_shards(1, target_shard_bytes=0)


def test_rerun_overwrite_is_byte_identical(spark):
    """The writer is idempotent: deterministic bytes + atomic rename mean
    a re-run (job retry, speculative twin) over an existing output dir
    reproduces every shard file exactly."""
    out = tempfile.mkdtemp(prefix="mp_shards_")
    try:
        docs = _corpus(spark, 150)
        write_training_shards(docs, out, n_shards=4, seed=2).collect()
        before = {
            f: open(os.path.join(out, f), "rb").read()
            for f in os.listdir(out)
            if f.endswith(".jsonl.gz")
        }
        write_training_shards(docs, out, n_shards=4, seed=2).collect()
        after = {
            f: open(os.path.join(out, f), "rb").read()
            for f in os.listdir(out)
            if f.endswith(".jsonl.gz")
        }
        assert before == after and len(before) == 4
    finally:
        shutil.rmtree(out, ignore_errors=True)


def _corpus(spark, n=200):
    return spark.range(n).select(
        F.concat(F.lit("https://ex.com/p"), F.col("id")).alias("url"),
        F.concat(F.lit("doc body "), F.col("id").cast("string")).alias("text"),
        (F.col("id") % 7).cast("int").alias("score"),
    )


def test_assignment_matches_md5_reference(spark):
    rows = shard_assignment(_corpus(spark, 50), n_shards=8, seed=42).collect()
    for r in rows:
        h = hashlib.md5(f"shard:42:{r.url}".encode()).hexdigest()
        assert r.shard_id == int(h[:8], 16) % 8
        assert r.sort_key == hashlib.md5(f"order:42:{r.url}".encode()).hexdigest()


def test_assignment_deterministic_and_seed_sensitive(spark):
    a = {r.url: (r.shard_id, r.sort_key)
         for r in shard_assignment(_corpus(spark), 16, seed=1).collect()}
    b = {r.url: (r.shard_id, r.sort_key)
         for r in shard_assignment(_corpus(spark), 16, seed=1).collect()}
    c = {r.url: (r.shard_id, r.sort_key)
         for r in shard_assignment(_corpus(spark), 16, seed=2).collect()}
    assert a == b
    assert any(a[u] != c[u] for u in a)


def test_assignment_balanced(spark):
    counts = [
        r.n for r in shard_assignment(_corpus(spark, 2000), 8, seed=0)
        .groupBy("shard_id").agg(F.count("*").alias("n")).collect()
    ]
    assert len(counts) == 8
    assert min(counts) > 2000 / 8 * 0.6 and max(counts) < 2000 / 8 * 1.4


def test_manifest_matches_direct_aggregation(spark):
    docs = _corpus(spark, 120)
    man = {r.shard_id: r for r in
           shard_manifest(shard_assignment(docs, 4, seed=0)).collect()}
    rows = shard_assignment(docs, 4, seed=0).collect()
    for sid in {r.shard_id for r in rows}:
        grp = [r for r in rows if r.shard_id == sid]
        m = man[sid]
        assert m.n_docs == len(grp)
        assert m.n_tokens == sum(len(r.text.split()) for r in grp)
        assert m.n_chars == sum(len(r.text) for r in grp)
        assert m.first_key == min(r.sort_key for r in grp)
        assert m.last_key == max(r.sort_key for r in grp)


def test_write_read_roundtrip_exact(spark):
    out = tempfile.mkdtemp(prefix="mp_shards_")
    try:
        docs = _corpus(spark, 300)
        report = write_training_shards(
            docs, out, n_shards=6, seed=7, meta_cols=["score"]
        ).collect()
        assert sum(r.n_docs for r in report) == 300
        assert sorted(r.shard_id for r in report) == sorted(
            {r.shard_id for r in shard_assignment(docs, 6, seed=7).collect()}
        )
        back = read_training_shards(
            spark, out, meta_fields=[StructField("score", IntegerType())]
        )
        orig = {(r.url, r.text, r.score) for r in docs.collect()}
        got = {(r.url, r.text, r.score) for r in back.collect()}
        assert got == orig
        assert not glob.glob(os.path.join(out, "*._tmp*"))
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_physical_order_is_seeded_shuffle(spark):
    out = tempfile.mkdtemp(prefix="mp_shards_")
    try:
        write_training_shards(_corpus(spark, 250), out, n_shards=3, seed=11).collect()
        files = sorted(glob.glob(os.path.join(out, "shard-*.jsonl.gz")))
        assert len(files) == 3
        for path in files:
            sid = int(os.path.basename(path)[len("shard-"):-len(".jsonl.gz")])
            keys = []
            with gzip.open(path, "rt", encoding="utf-8") as fh:
                for line in fh:
                    rec = json.loads(line)
                    h = hashlib.md5(f"shard:11:{rec['url']}".encode()).hexdigest()
                    assert int(h[:8], 16) % 3 == sid
                    keys.append(
                        hashlib.md5(f"order:11:{rec['url']}".encode()).hexdigest()
                    )
            assert keys == sorted(keys)
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_deterministic_bytes_across_runs(spark):
    out1 = tempfile.mkdtemp(prefix="mp_shards_")
    out2 = tempfile.mkdtemp(prefix="mp_shards_")
    try:
        docs = _corpus(spark, 100).repartition(5)
        write_training_shards(docs, out1, n_shards=2, seed=3).collect()
        write_training_shards(docs.repartition(2), out2, n_shards=2, seed=3).collect()
        for name in ["shard-00000.jsonl.gz", "shard-00001.jsonl.gz"]:
            b1 = open(os.path.join(out1, name), "rb").read()
            b2 = open(os.path.join(out2, name), "rb").read()
            assert b1 == b2
    finally:
        shutil.rmtree(out1, ignore_errors=True)
        shutil.rmtree(out2, ignore_errors=True)


def test_null_text_raises(spark):
    out = tempfile.mkdtemp(prefix="mp_shards_")
    try:
        docs = spark.createDataFrame(
            [("u1", "ok"), ("u2", None)], ["url", "text"]
        )
        with pytest.raises(Exception, match="non-null text"):
            write_training_shards(docs, out, n_shards=1).collect()
        assert not glob.glob(os.path.join(out, "shard-*.jsonl.gz"))
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_unicode_and_meta_null_roundtrip(spark):
    out = tempfile.mkdtemp(prefix="mp_shards_")
    try:
        docs = spark.createDataFrame(
            [("https://ex.com/é", "café 中文 \U0001f600", 1),
             ("u2", "plain", None)],
            ["url", "text", "score"],
        )
        write_training_shards(docs, out, n_shards=1, meta_cols=["score"]).collect()
        back = read_training_shards(
            spark, out, meta_fields=[StructField("score", IntegerType())]
        ).collect()
        got = {(r.url, r.text, r.score) for r in back}
        assert got == {("https://ex.com/é", "café 中文 \U0001f600", 1),
                       ("u2", "plain", None)}
        raw = gzip.open(
            os.path.join(out, "shard-00000.jsonl.gz"), "rb"
        ).read()
        assert "café".encode("utf-8") in raw
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_export_writes_manifest(spark):
    out = tempfile.mkdtemp(prefix="mp_shards_")
    try:
        rows = export_training_shards(_corpus(spark, 80), out, n_shards=4, seed=5)
        man = json.load(open(os.path.join(out, "manifest.json")))
        assert man["n_shards"] == 4 and man["seed"] == 5
        assert man["n_docs"] == 80 == sum(s["n_docs"] for s in man["shards"])
        assert [s["shard_id"] for s in man["shards"]] == sorted(
            s["shard_id"] for s in man["shards"]
        )
        assert rows == man["shards"]
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_writer_plan_single_shuffle(spark):
    """The writer moves every row exactly once: ONE hash exchange on
    shard_id, a partition-local sort, no join of any kind."""
    out = tempfile.mkdtemp(prefix="mp_shards_")
    try:
        report = write_training_shards(_corpus(spark, 50), out, n_shards=4)
        plan = report._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, plan
        assert "hashpartitioning(shard_id" in plan, plan
        assert "Join" not in plan and "CartesianProduct" not in plan
    finally:
        shutil.rmtree(out, ignore_errors=True)
