"""SemDedup (operators/semdedup.py): fixed-point k-means + within-
cluster cosine pruning.

The heavyweight check is an INDEPENDENT numpy replay of the exact
integer semantics (quantize / Lloyd / rank / prune) — the same role
the heap oracle plays for the sketch engine; the DuckDB SQL replay
lives in the `semdedup_prune` gate oracle."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StructField,
    StructType,
)

from mashing_pumpkins_spark.operators.semdedup import (
    fit_centroids,
    quantize_embeddings,
    semdedup,
)

SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def _mk_emb(spark, n=120, dim=16, seed=3):
    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(n, dim)).astype(np.float32)
    rows = [(i, [float(x) for x in mat[i]]) for i in range(n)]
    return spark.createDataFrame(rows, SCHEMA)


def _np_semdedup(rows, n_clusters, tau_ppm, n_iters):
    """Independent integer-exact replay of the documented semantics."""
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    emb = np.array([r[1] for r in rows], dtype=np.float64)
    q = np.floor(emb * 1000.0).astype(np.int64)
    norm2 = (q * q).sum(axis=1)
    order = sorted(
        range(len(ids)),
        key=lambda i: (hashlib.md5(str(ids[i]).encode()).hexdigest(), ids[i]),
    )
    cent = [q[order[j]].copy() for j in range(n_clusters)]
    cn2 = [int(norm2[order[j]]) for j in range(n_clusters)]

    def assign():
        d = np.stack(
            [norm2 - 2 * (q @ cent[c]) + cn2[c] for c in range(n_clusters)], axis=1
        )
        # argmin with ties to the smaller centroid id (np.argmin does this)
        a = d.argmin(axis=1)
        return a, d[np.arange(len(ids)), a]

    for _ in range(n_iters):
        a, _ = assign()
        for c in range(n_clusters):
            m = a == c
            if m.any():
                s = q[m].sum(axis=0)
                n = int(m.sum())
                cent[c] = (s - (((s % n) + n) % n)) // n
                cn2[c] = int((cent[c] * cent[c]).sum())
    a, d = assign()
    # rank: dist2 desc, id asc within cluster; prune vs earlier ranks
    kept = np.ones(len(ids), dtype=bool)
    t2 = tau_ppm * tau_ppm
    for c in range(n_clusters):
        idx = [i for i in range(len(ids)) if a[i] == c]
        idx.sort(key=lambda i: (-d[i], ids[i]))
        for pi, i in enumerate(idx):
            for j in idx[:pi]:
                dot = int(q[i] @ q[j])
                if dot > 0 and dot * dot * 10**12 >= t2 * int(norm2[i]) * int(
                    norm2[j]
                ):
                    kept[i] = False
                    break
    return {int(ids[i]): (int(a[i]), int(d[i]), bool(kept[i])) for i in range(len(ids))}


def test_semdedup_matches_numpy_replay(spark):
    df = _mk_emb(spark, n=120, dim=16)
    rows = [(r["vec_id"], r["embedding"]) for r in df.collect()]
    got = {
        r["vec_id"]: (r["cluster_id"], r["dist2"], r["kept"])
        for r in semdedup(df, n_clusters=6, tau_ppm=400_000, n_iters=2).collect()
    }
    want = _np_semdedup(rows, n_clusters=6, tau_ppm=400_000, n_iters=2)
    assert got == want


def test_semdedup_removes_planted_duplicates(spark):
    base = _mk_emb(spark, n=80, dim=16, seed=5)
    copies = base.select(
        (F.col("vec_id") + 100_000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x.cast("double") * F.lit(0.99)).cast("float")
        ).alias("embedding"),
    )
    out = semdedup(base.unionAll(copies), n_clusters=4, tau_ppm=950_000, n_iters=2)
    rows = {r["vec_id"]: r for r in out.collect()}
    assert len(rows) == 160
    removed = {i for i, r in rows.items() if not r["kept"]}
    # exactly one side of every planted pair is pruned, nothing else
    assert len(removed) == 80
    for i in range(80):
        pair = {i, i + 100_000}
        assert len(pair & removed) == 1
        # the pair landed in the same cluster (else neither could be pruned)
        assert rows[i]["cluster_id"] == rows[i + 100_000]["cluster_id"]


def test_semdedup_numpy_backend_equals_literal(spark):
    # the scale backend (float64 BLAS, exact under the documented < 2^53
    # bounds) must reproduce the literal-Column plan bit-for-bit
    df = _mk_emb(spark, n=150, dim=24, seed=9)
    lit = semdedup(
        df, n_clusters=7, tau_ppm=450_000, assign_backend="literal"
    ).collect()
    npy = semdedup(
        df, n_clusters=7, tau_ppm=450_000, assign_backend="numpy"
    ).collect()
    assert sorted(map(tuple, lit)) == sorted(map(tuple, npy))
    with pytest.raises(ValueError):
        semdedup(df, n_clusters=2, assign_backend="bogus")


def test_semdedup_partitioning_invariant(spark):
    df = _mk_emb(spark, n=90, dim=16, seed=11)
    a = semdedup(df.repartition(1), n_clusters=5, tau_ppm=500_000).collect()
    b = semdedup(df.repartition(16), n_clusters=5, tau_ppm=500_000).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_semdedup_cluster_cap_noop_when_large_and_splits_when_small(spark):
    df = _mk_emb(spark, n=60, dim=16, seed=7)
    uncapped = sorted(map(tuple, semdedup(df, n_clusters=3, tau_ppm=500_000).collect()))
    noop = sorted(
        map(
            tuple,
            semdedup(df, n_clusters=3, tau_ppm=500_000, max_cluster_size=10_000)
            .collect(),
        )
    )
    assert uncapped == noop
    capped = semdedup(df, n_clusters=3, tau_ppm=500_000, max_cluster_size=5)
    rows = capped.collect()
    assert len(rows) == 60  # capping never drops rows, only splits pair scope
    # a cap can only reduce the removed set (fewer comparable pairs)
    removed_capped = {r["vec_id"] for r in rows if not r["kept"]}
    removed_full = {t[0] for t in uncapped if not t[3]}
    assert removed_capped <= removed_full


def test_quantize_and_centroids_shapes(spark):
    df = _mk_emb(spark, n=30, dim=8, seed=1)
    quant = quantize_embeddings(df)
    row = quant.orderBy("vec_id").first()
    assert len(row["q"]) == 8
    assert row["norm2"] == sum(v * v for v in row["q"])
    cents = fit_centroids(quant, n_clusters=3, n_iters=1)
    assert [c[0] for c in cents] == [0, 1, 2]
    assert all(len(c[1]) == 8 for c in cents)
    assert all(c[2] == sum(v * v for v in c[1]) for c in cents)


def test_semdedup_validation(spark):
    from mashing_pumpkins_spark.operators import semdedup as m

    with pytest.raises(ValueError):
        m.fit_centroids(None, n_clusters=0, n_iters=1)
    with pytest.raises(ValueError):
        m.fit_centroids(None, n_clusters=1, n_iters=-1)
    df = _mk_emb(spark, n=10, dim=4)
    with pytest.raises(ValueError):
        semdedup(df, n_clusters=2, tau_ppm=0)
    with pytest.raises(ValueError):
        semdedup(df, n_clusters=2, tau_ppm=1_000_001)
    with pytest.raises(ValueError):
        semdedup(df, n_clusters=2, max_cluster_size=0)


def test_choose_n_clusters_pins_and_clamps():
    from mashing_pumpkins_spark.operators.semdedup import choose_n_clusters

    assert choose_n_clusters(1_000_000) == 2000
    assert choose_n_clusters(1_099_828) == 2200
    assert choose_n_clusters(0) == 1
    assert choose_n_clusters(499) == 1
    assert choose_n_clusters(501) == 2
    assert choose_n_clusters(10**12, max_clusters=1 << 20) == 1 << 20
    import pytest as _pytest

    with _pytest.raises(ValueError):
        choose_n_clusters(-1)
    with _pytest.raises(ValueError):
        choose_n_clusters(10, target_cluster_size=0)


def test_blocked_prune_equals_single_block(spark):
    """Round-8 row-blocked pairwise scoring: shrinking the block budget so
    every cluster spans many blocks must not change a single kept flag
    (the block boundary only partitions the i-rows; each block still sees
    all lower-ranked columns)."""
    import numpy as np

    from mashing_pumpkins_spark.operators import semdedup as S

    rng = np.random.default_rng(17)
    rows = [
        (int(i), [float(v) for v in rng.integers(-50, 50, size=8)])
        for i in range(120)
    ]
    # plant near-duplicates so hits actually occur
    rows += [(1000 + i, [v * 0.99 for v in rows[i][1]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    base = S.semdedup(df, n_clusters=3, tau_ppm=950_000, n_iters=1)
    got_a = {r["vec_id"]: r["kept"] for r in base.collect()}
    old = S._PRUNE_BLOCK_ELEMS
    S._PRUNE_BLOCK_ELEMS = 16  # forces bs=1 at any g — maximal blocking
    try:
        blocked = S.semdedup(df, n_clusters=3, tau_ppm=950_000, n_iters=1)
        got_b = {r["vec_id"]: r["kept"] for r in blocked.collect()}
    finally:
        S._PRUNE_BLOCK_ELEMS = old
    assert got_a == got_b
    assert any(not k for k in got_a.values())  # hits occurred
