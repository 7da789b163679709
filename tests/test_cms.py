"""Count-min sketch: structural guarantees + mergeability (the scale
contract) against exact counts computed independently in Python."""

from __future__ import annotations

import random
import re

import pytest
from pyspark.sql import functions as F

from mashing_pumpkins_spark.operators.cms import (
    cms_estimate,
    merge_counters,
    token_counter_table,
)


def _exact_counts(texts):
    counts = {}
    for t in texts:
        for w in re.findall("[a-z]+", t.lower()):
            counts[w] = counts.get(w, 0) + 1
    return counts


def _rand_corpus(seed, n_docs, vocab_size=40):
    rng = random.Random(seed)
    vocab = [
        "".join(rng.choice("abcdefghij") for _ in range(rng.randrange(2, 7)))
        for _ in range(vocab_size)
    ]
    return [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(5, 40)))
        for _ in range(n_docs)
    ]


def _estimates(spark, texts, depth, width):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id int, text string")
    counters = token_counter_table(df, depth=depth, width=width)
    exact = _exact_counts(texts)
    toks = spark.createDataFrame([(w,) for w in exact], "token string")
    est = cms_estimate(counters, toks, depth=depth, width=width)
    return exact, {r["token"]: r["est_count"] for r in est.collect()}


def test_never_underestimates_and_exact_when_wide(spark):
    texts = _rand_corpus(1, 60)
    exact, est = _estimates(spark, texts, depth=4, width=65536)
    assert set(est) == set(exact)
    # 40 tokens in 65536 buckets x 4 rows: collisions essentially
    # impossible under the salted md5 — estimates are exact
    assert est == exact


def test_narrow_width_overestimates_never_under(spark):
    texts = _rand_corpus(2, 60)
    exact, est = _estimates(spark, texts, depth=3, width=8)
    assert all(est[w] >= c for w, c in exact.items())
    # 40 tokens in 8 buckets MUST collide somewhere
    assert any(est[w] > c for w, c in exact.items())


def test_width_one_returns_total_token_count(spark):
    texts = _rand_corpus(3, 20)
    exact, est = _estimates(spark, texts, depth=2, width=1)
    total = sum(exact.values())
    assert all(v == total for v in est.values())


def test_merge_equals_whole_corpus_sketch(spark):
    """CMS(A) + CMS(B) == CMS(A+B) counter-for-counter — sketches build
    per shard and fold without rescanning (the 100-TB contract)."""
    texts = _rand_corpus(4, 80)
    half = len(texts) // 2
    mk = lambda ts: token_counter_table(
        spark.createDataFrame([(i, t) for i, t in enumerate(ts)], "id int, text string"),
        depth=4,
        width=64,
    )
    merged = {
        (r["row_i"], r["bucket"]): r["cnt"]
        for r in merge_counters(mk(texts[:half]), mk(texts[half:])).collect()
    }
    whole = {
        (r["row_i"], r["bucket"]): r["cnt"] for r in mk(texts).collect()
    }
    assert merged == whole


def test_unseen_token_estimate_is_nonnegative_collision_mass(spark):
    texts = ["aa bb aa", "bb cc"]
    df = spark.createDataFrame([(0, texts[0]), (1, texts[1])], "id int, text string")
    counters = token_counter_table(df, depth=4, width=65536)
    est = cms_estimate(
        counters,
        spark.createDataFrame([("zzzz",)], "token string"),
        depth=4,
        width=65536,
    ).collect()[0]
    assert est["est_count"] == 0  # no collisions at this width


def test_counter_table_bounded_by_depth_width(spark):
    texts = _rand_corpus(5, 100)
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id int, text string")
    counters = token_counter_table(df, depth=3, width=16)
    assert counters.count() <= 3 * 16
    rows = counters.agg(
        F.min("row_i"), F.max("row_i"), F.min("bucket"), F.max("bucket")
    ).collect()[0]
    assert rows[0] >= 0 and rows[1] <= 2 and rows[2] >= 0 and rows[3] <= 15


def test_validation(spark):
    df = spark.createDataFrame([(0, "a b")], "id int, text string")
    with pytest.raises(ValueError):
        token_counter_table(df, depth=0)
    with pytest.raises(ValueError):
        token_counter_table(df, width=0)


def test_plan_is_pure_column_algebra(spark):
    df = spark.createDataFrame([(0, "a b c")], "id int, text string")
    counters = token_counter_table(df, depth=4, width=64)
    est = cms_estimate(
        counters, spark.createDataFrame([("a",)], "token string"), depth=4, width=64
    )
    for d in (counters, est):
        plan = d._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan
        assert "BatchEvalPython" not in plan
    # the counter side of the estimate join must broadcast
    assert "BroadcastHashJoin" in est._jdf.queryExecution().executedPlan().toString()


def test_streaming_counters_equal_batch(spark, tmp_path):
    """3 micro-batches through the NATIVE streaming groupBy-sum: final
    counters equal the batch sketch of the union — CMS is a pure
    additive aggregation, so micro-batch boundaries cannot change it."""
    import pandas as pd

    texts = _rand_corpus(12, 90)
    src = tmp_path / "cms_src"
    src.mkdir()
    for i in range(3):
        pd.DataFrame({"text": texts[i * 30 : (i + 1) * 30]}).to_parquet(
            src / f"b{i}.parquet"
        )

    stream = spark.readStream.schema("text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src))
    q = (
        token_counter_table(stream, depth=3, width=64)
        .writeStream.format("memory")
        .queryName("cms_stream_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.lastProgress["batchId"] >= 2, "expected >=3 micro-batches"
    got = sorted(
        map(
            tuple,
            spark.sql("select row_i, bucket, cnt from cms_stream_test").collect(),
        )
    )
    whole = sorted(
        map(
            tuple,
            token_counter_table(
                spark.createDataFrame([(t,) for t in texts], "text string"),
                depth=3,
                width=64,
            ).collect(),
        )
    )
    assert got == whole
