"""Similarity search over an embedding column (array<float>).

Physical strategy: the small side (query matrix, or the full vector matrix
for all-pairs at verification scale) is broadcast to executors as a numpy
array; each Arrow batch of the streamed side is scored with ONE float64
matmul inside mapInPandas. This keeps the hot loop in BLAS instead of
Catalyst's interpreted higher-order lambdas (zip_with/aggregate evaluate
per element — measured 60s for 2M x 64-dim pairs, vs <2s for the matmul).

- cosine_topk: exact top-k, queries broadcast, vectors streamed; per-batch
  top-k inside the UDF caps shuffle volume at batches*k*queries rows.
- lsh_cosine_topk: random-hyperplane bucketing (scale path), exact re-rank
  of candidates only.
- embedding_near_dup_pairs: exact all-pairs >= threshold; the full matrix
  is broadcast, so this is the <=1e6-vector verification form — at 10^12
  scale use the LSH variant.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)
from pyspark.sql.window import Window

PAIR_SCHEMA = StructType(
    [
        StructField("id_a", LongType()),
        StructField("id_b", LongType()),
        StructField("cos_sim", DoubleType()),
    ]
)

TOPK_SCHEMA = StructType(
    [
        StructField("query_id", LongType()),
        StructField("neighbor_id", LongType()),
        StructField("cos_sim", DoubleType()),
    ]
)


def cosine(a: Column, b: Column) -> Column:
    """Exact cosine as a Column expression (small-N convenience; the bulk
    paths below use numpy)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    nb = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def _normalized_matrix(rows: list) -> tuple[np.ndarray, np.ndarray]:
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return ids, mat / norms


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query (self excluded). Deterministic ties:
    (rounded cosine desc, neighbor id asc). Queries are broadcast; the
    vector table streams through one matmul per Arrow batch."""
    spark = vectors.sparkSession
    q_rows = queries.select(id_col, vec_col).collect()
    if not q_rows:
        return spark.createDataFrame([], TOPK_SCHEMA).withColumn(
            "rank", F.lit(1)
        ).limit(0)
    q_ids, q_mat = _normalized_matrix(q_rows)
    bc = spark.sparkContext.broadcast((q_ids, q_mat))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_q, mat_q = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            n_ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            sims = (mat / norms) @ mat_q.T  # (batch, n_queries)
            out_q, out_n, out_s = [], [], []
            for j in range(ids_q.shape[0]):
                col = sims[:, j]
                mask = n_ids != ids_q[j]
                cand = np.nonzero(mask)[0]
                if cand.shape[0] > k:
                    part = cand[np.argpartition(-col[cand], k)[:k]]
                else:
                    part = cand
                out_q.extend([ids_q[j]] * part.shape[0])
                out_n.extend(n_ids[part].tolist())
                out_s.extend(np.round(col[part], 6).tolist())
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cos_sim": out_s}
            )

    scored = vectors.select(id_col, vec_col).mapInPandas(score, TOPK_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def make_hyperplane_udf(dim: int, n_planes: int, seed: int = 0):
    """pandas UDF: embedding -> array of bucket signatures, one per table of
    16 planes (multi-table LSH)."""
    rng = np.random.Generator(np.random.PCG64(seed ^ 0xC051_4E5E))
    n_tables = max(1, n_planes // 16)
    planes = rng.standard_normal((n_tables, 16, dim))

    @F.pandas_udf(ArrayType(LongType(), containsNull=False))
    def hyperplane_udf(vec_iter: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for vecs in vec_iter:
            mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
            sigs = np.zeros((mat.shape[0], n_tables), dtype=np.int64)
            for t in range(n_tables):
                proj = mat @ planes[t].T  # (n, 16)
                bits = (proj > 0).astype(np.int64)
                sigs[:, t] = (bits << np.arange(16)).sum(axis=1) | (t << 32)
            yield pd.Series(sigs.tolist())

    return hyperplane_udf


def lsh_cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 0,
) -> DataFrame:
    """Approximate top-k: candidates share >=1 hyperplane bucket across
    4 tables of 16 planes; exact cosine re-rank of candidates only."""
    dim = len(vectors.select(vec_col).first()[0])
    udf = make_hyperplane_udf(dim, n_planes, seed)
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nv"),
        F.explode(udf(F.col(vec_col))).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(udf(F.col(vec_col))).alias("bucket"),
    )
    cands = (
        q.join(v, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "qv", "neighbor_id", "nv")
        .distinct()
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("nv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def _spherical_kmeans(mat: np.ndarray, n_cells: int, seed: int, iters: int = 10) -> np.ndarray:
    """Deterministic spherical k-means (cosine) on a driver-side sample."""
    rng = np.random.Generator(np.random.PCG64(seed ^ 0x1CF5))
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    x = mat / norms
    centroids = x[rng.choice(x.shape[0], size=min(n_cells, x.shape[0]), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ centroids.T, axis=1)
        for c in range(centroids.shape[0]):
            members = x[assign == c]
            if members.shape[0]:
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    centroids[c] = v / n
    return centroids


def ivf_cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 0,
    train_sample: int = 4096,
) -> DataFrame:
    """IVF approximate top-k: spherical-k-means coarse quantizer trained on
    a driver-side sample; vectors assigned to their nearest cell, queries
    probe their n_probe nearest cells; exact cosine re-rank within probed
    cells only. The scale shape: the centroid table is tiny and broadcast,
    the shuffle key is the cell id, and per-query work is bounded by
    n_probe/n_cells of the corpus."""
    spark = vectors.sparkSession
    sample = np.array(
        [r[0] for r in vectors.select(vec_col).limit(train_sample).collect()],
        dtype=np.float64,
    )
    centroids = _spherical_kmeans(sample, n_cells, seed)
    bc = spark.sparkContext.broadcast(centroids)

    def make_cells_udf(top: int):
        @F.pandas_udf(ArrayType(LongType(), containsNull=False))
        def cells_udf(vec_iter: Iterator[pd.Series]) -> Iterator[pd.Series]:
            cents = bc.value
            for vecs in vec_iter:
                mat = np.array(list(vecs), dtype=np.float64)
                norms = np.linalg.norm(mat, axis=1, keepdims=True)
                norms[norms == 0] = 1.0
                sims = (mat / norms) @ cents.T
                order = np.argsort(-sims, axis=1)[:, :top]
                yield pd.Series(order.astype(np.int64).tolist())

        return cells_udf

    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nv"),
        F.element_at(make_cells_udf(1)(F.col(vec_col)), 1).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(make_cells_udf(n_probe)(F.col(vec_col))).alias("cell"),
    )
    scored = (
        q.join(v, "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("nv")), 6).alias("cos_sim"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def embedding_near_dup_pairs(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine >= threshold. The full (ids, matrix) is
    broadcast; each batch emits only its over-threshold pairs with
    id_a < id_b — one matmul per batch, output bounded by the match count."""
    spark = vectors.sparkSession
    all_rows = vectors.select(id_col, vec_col).collect()
    ids_all, mat_all = _normalized_matrix(all_rows)
    bc = spark.sparkContext.broadcast((ids_all, mat_all))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_b, mat_b = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            n_ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            sims = (mat / norms) @ mat_b.T
            rows_i, cols_j = np.nonzero(
                (sims >= threshold) & (n_ids[:, None] < ids_b[None, :])
            )
            yield pd.DataFrame(
                {
                    "id_a": n_ids[rows_i],
                    "id_b": ids_b[cols_j],
                    "cos_sim": np.round(sims[rows_i, cols_j], 6),
                }
            )

    return vectors.select(id_col, vec_col).mapInPandas(score, PAIR_SCHEMA)
