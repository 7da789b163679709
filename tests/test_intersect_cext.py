"""The round-8 C sorted-merge intersect kernel must be bit-identical to the
numpy np.intersect1d path on every input class the verify stage can see:
sorted-unique sketch arrays (the real case), empties, missing urls, and
adversarial unsorted/duplicate arrays (which must be detected and rerouted
through the numpy fallback)."""

from __future__ import annotations

import numpy as np
import pytest

from mashing_pumpkins_spark.operators import _intersect_cext as ic
from mashing_pumpkins_spark.operators.verify import (
    _flat_layout,
    _pair_jaccard_block,
)


def _ref_jaccard(a, b) -> float:
    if a is None or b is None:
        return 0.0
    xa = np.asarray(a, dtype=np.int64)
    yb = np.asarray(b, dtype=np.int64)
    if xa.shape[0] == 0 or yb.shape[0] == 0:
        return 0.0
    inter = np.intersect1d(xa, yb, assume_unique=True).shape[0]
    return inter / (xa.shape[0] + yb.shape[0] - inter)


def _rand_sig(rng, n):
    # uint64-sorted unique values spanning the signed/unsigned boundary
    # (sketch arrays are stored int64 but sorted in UNSIGNED order)
    v = np.unique(
        rng.integers(0, 2**64, size=n, dtype=np.uint64) if n else
        np.empty(0, dtype=np.uint64)
    )
    return v.astype(np.int64)


def test_kernel_loads():
    assert ic.load() is not None, "host cc exists in this sandbox"


def test_pair_jaccard_block_matches_numpy_reference():
    rng = np.random.default_rng(11)
    cols_a, cols_b = [], []
    for _ in range(400):
        cols_a.append(_rand_sig(rng, int(rng.integers(0, 80))))
        cols_b.append(_rand_sig(rng, int(rng.integers(0, 80))))
    # plant shared values so intersections are nonzero
    for i in range(0, 400, 3):
        shared = _rand_sig(rng, 20)
        cols_a[i] = np.asarray(
            np.sort(
                np.union1d(
                    cols_a[i].view(np.uint64), shared.view(np.uint64)
                )
            ).astype(np.int64)
        )
        cols_b[i] = np.asarray(
            np.sort(
                np.union1d(
                    cols_b[i].view(np.uint64), shared.view(np.uint64)
                )
            ).astype(np.int64)
        )
    cols_a[5] = None
    cols_b[7] = None
    aflat, aoffs, alens = _flat_layout(cols_a)
    bflat, boffs, blens = _flat_layout(cols_b)
    got = _pair_jaccard_block(aflat, aoffs, alens, bflat, boffs, blens)
    exp = np.array(
        [_ref_jaccard(a, b) for a, b in zip(cols_a, cols_b)], dtype=np.float64
    )
    assert np.array_equal(got, exp)  # bit-identical, not allclose


def test_unsorted_and_duplicate_rows_reroute_to_numpy():
    rng = np.random.default_rng(13)
    cols_a, cols_b = [], []
    for i in range(120):
        a = _rand_sig(rng, int(rng.integers(2, 40)))
        b = _rand_sig(rng, int(rng.integers(2, 40)))
        if i % 4 == 0:
            a = a[::-1].copy()  # unsorted
        if i % 5 == 0:
            b = np.concatenate([b, b[:1]])  # duplicate value
        cols_a.append(a)
        cols_b.append(b)
    aflat, aoffs, alens = _flat_layout(cols_a)
    bflat, boffs, blens = _flat_layout(cols_b)
    got = _pair_jaccard_block(aflat, aoffs, alens, bflat, boffs, blens)
    exp = np.array(
        [_ref_jaccard(a, b) for a, b in zip(cols_a, cols_b)], dtype=np.float64
    )
    assert np.array_equal(got, exp)


def test_indexed_variant_matches_reference():
    rng = np.random.default_rng(17)
    arrays = [_rand_sig(rng, int(rng.integers(0, 50))) for _ in range(100)]
    lens = np.fromiter((a.shape[0] for a in arrays), np.int64, 100)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1])).astype(np.int64)
    flat = np.concatenate(arrays)
    ia = rng.integers(-1, 100, size=600).astype(np.int64)
    ib = rng.integers(-1, 100, size=600).astype(np.int64)
    got = ic.intersect_counts_indexed(flat, starts, lens, ia, ib)
    if got is None:
        pytest.skip("no host compiler")
    for p in range(600):
        if ia[p] < 0 or ib[p] < 0:
            assert got[p] == 0
            continue
        exp = np.intersect1d(
            arrays[ia[p]], arrays[ib[p]], assume_unique=True
        ).shape[0]
        assert got[p] == exp


def test_violating_rows_flags_exactly_the_bad_arrays():
    rng = np.random.default_rng(19)
    arrays = []
    bad = set()
    for i in range(150):
        a = _rand_sig(rng, int(rng.integers(0, 30)))
        if i % 7 == 0 and a.shape[0] > 2:
            a = a[::-1].copy()
        u = a.view(np.uint64)
        if a.shape[0] > 1 and bool(np.any(u[1:] <= u[:-1])):
            bad.add(i)
        arrays.append(a)
    lens = np.fromiter((a.shape[0] for a in arrays), np.int64, 150)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1])).astype(np.int64)
    flat = np.concatenate(arrays)
    got = set(ic.violating_rows(flat, starts, lens).tolist())
    assert got == bad


def test_kill_switch_falls_back(monkeypatch):
    monkeypatch.setenv("MP_SPARK_INTERSECT_CEXT", "0")
    assert ic.load() is None
    rng = np.random.default_rng(23)
    cols_a = [_rand_sig(rng, 10) for _ in range(20)]
    cols_b = [_rand_sig(rng, 10) for _ in range(20)]
    aflat, aoffs, alens = _flat_layout(cols_a)
    bflat, boffs, blens = _flat_layout(cols_b)
    got = _pair_jaccard_block(aflat, aoffs, alens, bflat, boffs, blens)
    exp = np.array(
        [_ref_jaccard(a, b) for a, b in zip(cols_a, cols_b)], dtype=np.float64
    )
    assert np.array_equal(got, exp)
