"""Exact verification of candidate pairs by sketch Jaccard.

Semantics: reference FrozenSketch.jaccard_similarity
(/root/reference/src/minhashsketch.py:709-718) — exact |A∩B|/|A∪B| over the
two retained sets, >= tau keeps the edge.

Physical strategy (two-phase, exact):
1. PREFILTER on the bottom-K prefix of each signature (K =
   PipelineConfig.prefilter_k, default 64). A KMV prefix is itself a KMV
   sketch, so prefix-Jaccard estimates full-sketch Jaccard with sigma =
   sqrt(s(1-s)/K) ~= 0.05 at K=64; filtering at tau - 6*sigma keeps a true
   >=tau pair with per-pair false-drop probability ~1e-7 (the
   Binomial(64, tau) tail — fatter than the ~1e-9 the normal approximation
   suggests; raise prefilter_k to 128-256 when billions of candidates make
   that tail matter) while killing the bulk of boilerplate-driven
   candidates (observed: ~95% of candidates at web-like corpora sit far
   below tau, and at tau=0.8 the cut is 0.5). This cuts the expensive join
   payload from k*8 bytes to K*8 bytes per side — round-2 profiling showed
   the candidate-pair join payload, not the Jaccard UDF, dominates the
   verify stage (1.9M candidates x 2 x k*8B through a sort-merge join).
2. EXACT pass on survivors with the full signatures — so the final edge set
   is exactly the tau-threshold set (phase 1 is only ever a superset
   filter; when maxsize <= 64 phase 1 IS exact and phase 2 is skipped).

The Jaccard itself runs as an Arrow UDF doing per-pair np.intersect1d.
Alternatives measured (round 3, 20k pairs x 64-element sorted arrays):
per-pair intersect1d 88ms, per-pair searchsorted 168ms, batched pandas
merge 957ms, batched one-big-lexsort and (n,64,64) equality-broadcast far
worse — for k<=256 sorted arrays the "vectorize the batch" refactors LOSE
to the loop; numpy call overhead per pair (~4.4us) is already below Arrow
transfer cost. Catalyst's array_intersect is worse still: interpreted per
element, measured 94s for 240k pairs of 1000-element arrays.
"""

from __future__ import annotations

import math
from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from ..config import PipelineConfig

PREFILTER_K = 64  # default when the caller's PipelineConfig predates the knob


@F.pandas_udf(DoubleType())
def _jaccard_udf(
    pairs: Iterator[Tuple[pd.Series, pd.Series]],
) -> Iterator[pd.Series]:
    for a_col, b_col in pairs:
        out = np.zeros(len(a_col), dtype=np.float64)
        for i, (a, b) in enumerate(zip(a_col, b_col)):
            if a is None or b is None:
                continue
            xa = np.asarray(a, dtype=np.int64)
            yb = np.asarray(b, dtype=np.int64)
            if xa.shape[0] == 0 or yb.shape[0] == 0:
                continue
            inter = np.intersect1d(xa, yb, assume_unique=True).shape[0]
            union = xa.shape[0] + yb.shape[0] - inter
            out[i] = inter / union
        yield pd.Series(out)


def _join_sigs(pairs: DataFrame, sigs: DataFrame) -> DataFrame:
    sig_a = sigs.select(F.col("url").alias("url_a"), F.col("sig").alias("sig_a"))
    sig_b = sigs.select(F.col("url").alias("url_b"), F.col("sig").alias("sig_b"))
    return pairs.join(sig_a, "url_a").join(sig_b, "url_b")


def _broadcast_prefilter(
    pairs: DataFrame, prefixes: DataFrame, pre_tau: float
) -> DataFrame:
    """Phase-1 prefilter as a broadcast scan: the bottom-K prefix slice of
    the candidate urls is pulled to the driver and broadcast, and the pair
    table streams through one mapInPandas — the two sort-merge joins the
    join-shaped phase 1 pays (pairs x prefix_a, then x prefix_b) disappear.
    Pure physical change: the survivor predicate is the same float
    ``inter/union >= pre_tau`` the join path's _jaccard_udf computes, on
    the same prefix arrays."""
    from pyspark.sql.types import StringType, StructField, StructType

    spark = pairs.sparkSession
    urls = pairs.select(
        F.explode(F.array("url_a", "url_b")).alias("url")
    ).distinct()
    slice_pdf = prefixes.join(urls, "url", "semi").toPandas()
    lookup = {
        u: np.asarray(s, dtype=np.int64)
        for u, s in zip(slice_pdf["url"], slice_pdf["sig"])
    }
    bc = spark.sparkContext.broadcast(lookup)
    out_schema = StructType(
        [StructField("url_a", StringType()), StructField("url_b", StringType())]
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        table = bc.value
        empty = np.empty(0, dtype=np.int64)
        for pdf in batches:
            ua = pdf["url_a"]
            ub = pdf["url_b"]
            pj = np.zeros(len(pdf), dtype=np.float64)
            for i, (a, b) in enumerate(zip(ua, ub)):
                xa = table.get(a, empty)
                yb = table.get(b, empty)
                if xa.shape[0] == 0 or yb.shape[0] == 0:
                    continue
                inter = np.intersect1d(xa, yb, assume_unique=True).shape[0]
                pj[i] = inter / (xa.shape[0] + yb.shape[0] - inter)
            keep = pj >= pre_tau
            yield pd.DataFrame({"url_a": ua[keep], "url_b": ub[keep]})

    return pairs.select("url_a", "url_b").mapInPandas(score, out_schema)


def _broadcast_verify(
    pairs: DataFrame, sigs: DataFrame, tau: float
) -> DataFrame:
    """Small-candidate-set physical strategy: semi-join signatures down to
    the urls that appear in any pair, pull that slice to the driver (Arrow)
    and broadcast it as a numpy dict — the pair table then streams through
    one mapInPandas with ZERO join shuffles. The analog of a broadcast hash
    join where the build side is the candidate signature slice."""
    from pyspark.sql.types import (
        DoubleType,
        StringType,
        StructField,
        StructType,
    )

    spark = pairs.sparkSession
    urls = pairs.select(
        F.explode(F.array("url_a", "url_b")).alias("url")
    ).distinct()
    slice_pdf = sigs.join(urls, "url", "semi").toPandas()
    lookup = {
        u: np.asarray(s, dtype=np.int64)
        for u, s in zip(slice_pdf["url"], slice_pdf["sig"])
    }
    bc = spark.sparkContext.broadcast(lookup)
    out_schema = StructType(
        [
            StructField("url_a", StringType()),
            StructField("url_b", StringType()),
            StructField("jaccard", DoubleType()),
        ]
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        table = bc.value
        empty = np.empty(0, dtype=np.int64)
        for pdf in batches:
            ua = pdf["url_a"]
            ub = pdf["url_b"]
            jac = np.zeros(len(pdf), dtype=np.float64)
            for i, (a, b) in enumerate(zip(ua, ub)):
                xa = table.get(a, empty)
                yb = table.get(b, empty)
                if xa.shape[0] == 0 or yb.shape[0] == 0:
                    continue
                inter = np.intersect1d(xa, yb, assume_unique=True).shape[0]
                jac[i] = inter / (xa.shape[0] + yb.shape[0] - inter)
            keep = jac >= tau
            yield pd.DataFrame(
                {
                    "url_a": ua[keep],
                    "url_b": ub[keep],
                    "jaccard": np.round(jac[keep], 9),
                }
            )

    return pairs.select("url_a", "url_b").mapInPandas(score, out_schema)


def verified_edges(
    pairs: DataFrame,
    signatures: DataFrame,
    cfg: PipelineConfig,
    url_col: str = "url",
    broadcast_cap_bytes: int = 48 << 20,
    n_candidate_urls: int | None = None,
) -> DataFrame:
    """pairs(url_a, url_b) x signatures(url, sig) -> edges(url_a, url_b, jaccard >= tau).

    Physical dispatch: when the candidate signature slice is genuinely
    small (n_candidate_urls * maxsize * 8B <= ~48MB) use the broadcast
    strategy — no shuffle at all; otherwise the two-phase prefix-prefilter
    join path (the 10^12-scale plan). The cap is deliberately conservative:
    driver-side toPandas + pickle of the slice is SERIAL time — measured
    ~120s for a 320MB slice, far worse than the shuffles it avoids.

    ``n_candidate_urls``: upper bound on distinct urls in ``pairs`` when the
    caller already knows it (the pipeline passes 2x the candidate-stage row
    count from the checkpoint manifest) — avoids spending an extra Spark job
    on a count that only picks the strategy."""
    tau = cfg.jaccard_threshold
    prefilter_k = getattr(cfg, "prefilter_k", PREFILTER_K)
    sigs = signatures.select(F.col(url_col).alias("url"), "sig")

    n_urls = (
        n_candidate_urls
        if n_candidate_urls is not None
        else pairs.select(F.explode(F.array("url_a", "url_b")).alias("url"))
        .distinct()
        .count()
    )
    if n_urls * cfg.sketch.maxsize * 8 <= broadcast_cap_bytes:
        return _broadcast_verify(pairs, sigs, tau)

    if cfg.sketch.maxsize <= prefilter_k:
        # signatures already fit the prefilter width: one exact pass
        joined = _join_sigs(pairs.select("url_a", "url_b"), sigs)
        return (
            joined.withColumn("jaccard", F.round(_jaccard_udf("sig_a", "sig_b"), 9))
            .where(F.col("jaccard") >= tau)
            .select("url_a", "url_b", "jaccard")
        )

    sigma = math.sqrt(tau * (1.0 - tau) / prefilter_k)
    pre_tau = max(0.0, tau - 6.0 * sigma)
    prefixes = sigs.select("url", F.slice("sig", 1, prefilter_k).alias("sig"))
    # Phase-1 physical dispatch (round 8): the PREFIX slice is prefilter_k/
    # maxsize the size of the full-signature slice, so it often fits the
    # broadcast cap when the full slice does not. The n_candidate_urls
    # manifest bound counts every pair endpoint twice-plus (dup pairs share
    # urls), so when the bound alone fails the cap, spend ONE cheap count
    # job on the narrow pair table to get the actual url count — it
    # routinely unlocks a zero-shuffle phase 1 that replaces two sort-merge
    # joins of the pair x prefix tables.
    n_act = n_urls
    if n_act * prefilter_k * 8 > broadcast_cap_bytes and n_candidate_urls is not None:
        n_act = (
            pairs.select(F.explode(F.array("url_a", "url_b")).alias("url"))
            .distinct()
            .count()
        )
    if n_act * prefilter_k * 8 <= broadcast_cap_bytes:
        survivors = _broadcast_prefilter(pairs, prefixes, pre_tau)
    else:
        pre = _join_sigs(pairs.select("url_a", "url_b"), prefixes)
        survivors = (
            pre.withColumn("pj", _jaccard_udf("sig_a", "sig_b"))
            .where(F.col("pj") >= pre_tau)
            .select("url_a", "url_b")
        )
    exact = _join_sigs(survivors, sigs)
    return (
        exact.withColumn("jaccard", F.round(_jaccard_udf("sig_a", "sig_b"), 9))
        .where(F.col("jaccard") >= tau)
        .select("url_a", "url_b", "jaccard")
    )
