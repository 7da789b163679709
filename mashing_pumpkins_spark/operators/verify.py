"""Exact verification of candidate pairs by sketch Jaccard.

Joins both sides' signatures (sort-merge on url — at bench scale Spark's
AQE may pick broadcast for the pair list; both are fine) and filters on the
exact set Jaccard of the two sketches — the reference's
FrozenSketch.jaccard_similarity (/root/reference/src/minhashsketch.py:709-718)
as a whole-stage-codegen Column expression, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..functions.estimators import jaccard_similarity


def verified_edges(
    pairs: DataFrame,
    signatures: DataFrame,
    cfg: PipelineConfig,
    url_col: str = "url",
) -> DataFrame:
    """pairs(url_a, url_b) x signatures(url, sig) -> edges(url_a, url_b, jaccard >= tau)."""
    sig_a = signatures.select(
        F.col(url_col).alias("url_a"), F.col("sig").alias("sig_a")
    )
    sig_b = signatures.select(
        F.col(url_col).alias("url_b"), F.col("sig").alias("sig_b")
    )
    return (
        pairs.join(sig_a, "url_a")
        .join(sig_b, "url_b")
        .withColumn("jaccard", jaccard_similarity(F.col("sig_a"), F.col("sig_b")))
        .where(F.col("jaccard") >= cfg.jaccard_threshold)
        .select("url_a", "url_b", "jaccard")
    )
