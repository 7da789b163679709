"""LSH banding stage: signatures -> (url, band_id, band_key) rows.

Classic banding assumes m independent MinHash permutations; the reference
sketch is a single-hash bottom-k (KMV) set. Banding over the *sorted
positions* of the bottom-k array has catastrophic recall (one missing
element shifts every later position, so only a shared prefix can ever
match; at jaccard 0.8 and k=256 the first difference lands at position ~4).
SURVEY.md §7.3 anticipated this; we use its fallback as the primary design:

    component_j = min over x in sketch of g_j(x),  j = 0..b*r-1

where g_j is a seeded multiply-shift hash (a_j*x + b_j mod 2^64, a_j odd).
For a random g_j the minimum over A∪B falls in A∩B with probability exactly
|A∩B|/|A∪B| — the *sketch* Jaccard, which is what the verify stage measures
— so P(component match) = s and P(candidate) = 1-(1-s^r)^b, the textbook
S-curve. Components derive purely from sketch contents, preserving the
bit-compat contract of the signatures table.

PipelineConfig defaults b=16, r=16 (m=256): P(candidate) = 1-(1-s^16)^16
≈ 0.37 at s=0.80 and ≈ 0.96 at s=0.90 — a steep knee near s≈0.85 that
suppresses sub-threshold candidate volume; the end-to-end recall test
(tests/test_pipeline.py) plants duplicates right of the knee and asserts
recall ≥0.99. For a softer curve at threshold 0.8 use b=32, r=8
(P(candidate | s=0.8) = 99.7%).

Physical plan: ONE vectorized pandas UDF computes the m component minima
(numpy reduceat over the batch's flattened sigs) AND folds each r-run into
a 64-bit band key (fmix64 + FNV-style polynomial fold), emitting b keys per
doc — b-element arrays instead of m-element ones keeps Arrow transfer and
the JVM explode small. The explode + shuffle-by-key stay JVM-side.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from ..config import PipelineConfig

_FMIX1 = np.uint64(0xFF51AFD7ED558CCD)
_FMIX2 = np.uint64(0xC4CEB9FE1A85EC53)
_FNV = np.uint64(0x100000001B3)


def _band_params(cfg: PipelineConfig) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic multiply-shift params from the job config."""
    m = cfg.n_bands * cfg.rows_per_band
    rng = np.random.Generator(np.random.PCG64(cfg.sketch.seed ^ 0x5EED_BA7D))
    a = rng.integers(0, 2**63, size=m, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 2**63, size=m, dtype=np.uint64)
    return a, b


def _fmix64(k: np.ndarray) -> np.ndarray:
    k = k.copy()
    k ^= k >> np.uint64(33)
    k *= _FMIX1
    k ^= k >> np.uint64(33)
    k *= _FMIX2
    k ^= k >> np.uint64(33)
    return k


def make_band_keys_udf(cfg: PipelineConfig):
    """pandas UDF: sig array<bigint> -> array<bigint> of n_bands band keys.

    Empty/short signatures yield an empty array (no bands emitted).
    """
    a_params, b_params = _band_params(cfg)
    n_bands, r = cfg.n_bands, cfg.rows_per_band
    m = n_bands * r
    kin = cfg.band_input_k

    @F.pandas_udf(ArrayType(LongType(), containsNull=False))
    def band_keys_udf(sig_iter: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for sigs in sig_iter:
            # bottom-kin prefix of each (ascending) sig is itself a KMV
            # sketch — banding on it has the same match probability
            lens = np.fromiter(
                (0 if s is None else min(len(s), kin) for s in sigs),
                dtype=np.int64,
                count=len(sigs),
            )
            if lens.sum() == 0:
                yield pd.Series([[]] * len(sigs))
                continue
            flat = np.concatenate(
                [
                    np.asarray(s[:kin], dtype=np.int64).view(np.uint64)
                    for s in sigs
                    if s is not None and len(s)
                ]
            )
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            nonempty = lens > 0
            ne_starts = starts[nonempty]
            n_ne = int(nonempty.sum())
            comp = np.empty((n_ne, m), dtype=np.uint64)
            for j in range(m):
                y = flat * a_params[j] + b_params[j]
                comp[:, j] = np.minimum.reduceat(y, ne_starts)
            mixed = _fmix64(comp).reshape(n_ne, n_bands, r)
            keys = np.zeros((n_ne, n_bands), dtype=np.uint64)
            for rr in range(r):
                keys = keys * _FNV ^ mixed[:, :, rr]
            keys_i64 = keys.view(np.int64)
            out: list = [[]] * len(sigs)
            for row_idx, out_idx in enumerate(np.nonzero(nonempty)[0]):
                out[int(out_idx)] = keys_i64[row_idx]
            yield pd.Series(out)

    return band_keys_udf


def band_table(
    signatures: DataFrame, cfg: PipelineConfig, url_col: str = "url"
) -> DataFrame:
    """signatures(url, sig) -> bands(url, band_id, band_key)."""
    udf = make_band_keys_udf(cfg)
    return (
        signatures.select(url_col, udf(F.col("sig")).alias("band_keys"))
        .select(url_col, F.posexplode("band_keys").alias("band_id", "band_key"))
    )
