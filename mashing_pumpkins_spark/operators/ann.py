"""Similarity search over an embedding column (array<float>).

- cosine_topk: brute-force exact top-k — the baseline and the oracle; pure
  JVM expressions (zip_with dot product), window row_number for top-k.
- lsh_cosine_topk: random-hyperplane (sign) LSH bucketing — the scale path.
  Hyperplanes are derived deterministically from a seed; candidates =
  same-bucket (multi-probe over h tables), verified by exact cosine.

At 10^12 rows the brute-force crossJoin is impossible; the LSH variant
shuffles each side on bucket id only. An IVF (k-means coarse quantizer)
variant would slot into the same candidate->verify shape.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType
from pyspark.sql.window import Window


def cosine(a: Column, b: Column) -> Column:
    """Exact cosine similarity of two float arrays, computed in double."""
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


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query (self excluded). Deterministic ties:
    (rounded cosine desc, neighbor id asc)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    v = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
    scored = (
        q.crossJoin(v)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("nv")), 6).alias("cos_sim"),
        )
    )
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
            out = []
            sigs = np.zeros((mat.shape[0], n_tables), dtype=np.int64)
            for t in range(n_tables):
                proj = mat @ planes[t].T  # (n, 16)
                bits = (proj > 0).astype(np.int64)
                sigs[:, t] = (bits << np.arange(16)).sum(axis=1) | (t << 32)
            out = sigs.tolist()
            yield pd.Series(out)

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


def embedding_near_dup_pairs(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine >= threshold (exact; the tiny-scale oracle —
    the LSH variant is the scale path)."""
    a = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )
