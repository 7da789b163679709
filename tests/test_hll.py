"""HyperLogLog vs an independent hashlib-md5 reference: register-level
parity, mergeability (the scale contract), and estimate accuracy at
cardinalities the sandbox can verify exactly."""

from __future__ import annotations

import hashlib
import math
import random

import pytest

from mashing_pumpkins_spark.operators.hll import (
    alpha_e6,
    hll_estimate,
    hll_registers,
    merge_registers,
)


def _ref_registers(keys, m):
    regs = {}
    for k in keys:
        d = hashlib.md5(str(k).encode()).hexdigest()
        j = int(d[:8], 16) % m
        h2 = int(d[8:16], 16)
        rho = 33 if h2 == 0 else 33 - h2.bit_length()
        regs[j] = max(regs.get(j, 0), rho)
    return regs


def _ref_estimate(regs, m):
    s = sum(2 ** (33 - regs.get(j, 0)) for j in range(m))
    return alpha_e6(m) * m * m * float(2**33) / s / 1e6


def _keys_df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "key string")


def test_registers_match_reference(spark):
    rng = random.Random(7)
    keys = [f"url-{rng.randrange(10**9)}" for _ in range(5000)]
    got = {
        r["bucket"]: r["m_j"]
        for r in hll_registers(_keys_df(spark, keys), m=64).collect()
    }
    assert got == _ref_registers(keys, 64)


def test_estimate_matches_reference_and_is_accurate(spark):
    rng = random.Random(8)
    for m, n in ((64, 2000), (256, 20000)):
        keys = list({f"k{rng.randrange(10**12)}" for _ in range(n)})
        regs = hll_registers(_keys_df(spark, keys), m=m)
        row = hll_estimate(regs, m=m).collect()[0]
        want = _ref_estimate(_ref_registers(keys, m), m)
        assert row["estimate"] == pytest.approx(want, rel=1e-12)
        # 3-sigma accuracy band (sigma ~ 1.04/sqrt(m))
        sigma = 1.04 / math.sqrt(m)
        assert abs(row["estimate"] - len(keys)) <= 3 * sigma * len(keys)


def test_duplicates_do_not_change_the_sketch(spark):
    keys = [f"d{i}" for i in range(500)]
    once = hll_registers(_keys_df(spark, keys), m=64)
    thrice = hll_registers(_keys_df(spark, keys * 3), m=64)
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, thrice.collect())
    )


def test_merge_equals_whole_sketch(spark):
    rng = random.Random(9)
    keys = [f"u{rng.randrange(10**9)}" for _ in range(4000)]
    half = len(keys) // 2
    a = hll_registers(_keys_df(spark, keys[:half]), m=128)
    b = hll_registers(_keys_df(spark, keys[half:]), m=128)
    merged = sorted(map(tuple, merge_registers(a, b).collect()))
    whole = sorted(
        map(tuple, hll_registers(_keys_df(spark, keys), m=128).collect())
    )
    assert merged == whole


def test_register_bounds_and_state_size(spark):
    keys = [f"z{i}" for i in range(10000)]
    regs = hll_registers(_keys_df(spark, keys), m=32)
    rows = regs.collect()
    assert len(rows) <= 32
    assert all(0 <= r["bucket"] < 32 and 1 <= r["m_j"] <= 33 for r in rows)


def test_alpha_validation_and_values(spark):
    assert alpha_e6(16) == 673_000
    assert alpha_e6(64) == 709_000
    assert alpha_e6(1024) == round(1e6 * 0.7213 / (1 + 1.079 / 1024))
    for bad in (8, 48, 0):
        with pytest.raises(ValueError):
            alpha_e6(bad)


def test_empty_input(spark):
    df = _keys_df(spark, []).where("1=0")
    row = hll_estimate(hll_registers(df, m=16), m=16).collect()[0]
    # all registers empty: s_sum = m * 2^33, estimate = alpha * m
    assert row["s_sum"] == 16 * 2**33
    assert row["n_present"] == 0
    assert row["estimate"] == pytest.approx(0.673 * 16, rel=1e-9)


def test_plan_is_pure_column_algebra(spark):
    df = _keys_df(spark, ["a", "b"])
    regs = hll_registers(df, m=16)
    for d in (regs, hll_estimate(regs, m=16)):
        plan = d._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan
        assert "BatchEvalPython" not in plan


def test_streaming_registers_equal_batch(spark, tmp_path):
    """3 micro-batches through the NATIVE streaming groupBy-max: final
    registers equal the batch sketch of the union — micro-batch
    boundaries cannot change an HLL."""
    import pandas as pd

    rng = random.Random(11)
    batches = [
        [f"s{rng.randrange(10**8)}" for _ in range(700)] for _ in range(3)
    ]
    src = tmp_path / "hll_src"
    src.mkdir()
    for i, b in enumerate(batches):
        pd.DataFrame({"key": b}).to_parquet(src / f"b{i}.parquet")

    stream = spark.readStream.schema("key string").option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src))
    q = (
        hll_registers(stream, m=64)
        .writeStream.format("memory")
        .queryName("hll_stream_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.lastProgress["batchId"] >= 2, "expected >=3 micro-batches"
    got = sorted(
        map(tuple, spark.sql("select bucket, m_j from hll_stream_test").collect())
    )
    whole = sorted(
        map(
            tuple,
            hll_registers(
                _keys_df(spark, [k for b in batches for k in b]), m=64
            ).collect(),
        )
    )
    assert got == whole
