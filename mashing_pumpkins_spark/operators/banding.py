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

Defaults b=32, r=8 (m=256): P(candidate | s=0.8) = 99.7%.

Physical plan: the component minima are one vectorized pandas UDF (numpy
reduceat over the batch's flattened sigs); band slicing, 64-bit band hashing
(xxhash64) and the explode are JVM-side whole-stage codegen.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from ..config import PipelineConfig


def _band_params(cfg: PipelineConfig) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic multiply-shift params from the job config."""
    m = cfg.n_bands * cfg.rows_per_band
    rng = np.random.Generator(np.random.PCG64(cfg.sketch.seed ^ 0x5EED_BA7D))
    a = rng.integers(0, 2**63, size=m, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 2**63, size=m, dtype=np.uint64)
    return a, b


def make_components_udf(cfg: PipelineConfig):
    """pandas UDF: sig array<bigint> -> array<bigint> of m component minima.

    Empty/short signatures yield an empty array (no bands emitted).
    """
    a_params, b_params = _band_params(cfg)
    m = cfg.n_bands * cfg.rows_per_band

    @F.pandas_udf(ArrayType(LongType(), containsNull=False))
    def components_udf(sig_iter: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for sigs in sig_iter:
            lens = np.fromiter(
                (0 if s is None else len(s) for s in sigs),
                dtype=np.int64,
                count=len(sigs),
            )
            if lens.sum() == 0:
                yield pd.Series([[]] * len(sigs))
                continue
            flat = np.concatenate(
                [
                    np.asarray(s, dtype=np.int64).view(np.uint64)
                    for s in sigs
                    if s is not None and len(s)
                ]
            )
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            nonempty = lens > 0
            out_rows: list[list[int]] = [[] for _ in range(len(sigs))]
            comp = np.empty((int(nonempty.sum()), m), dtype=np.uint64)
            ne_starts = starts[nonempty]
            for j in range(m):
                y = flat * a_params[j] + b_params[j]
                comp[:, j] = np.minimum.reduceat(y, ne_starts)
            comp_i64 = comp.view(np.int64)
            for row_idx, out_idx in enumerate(np.nonzero(nonempty)[0]):
                out_rows[int(out_idx)] = comp_i64[row_idx].tolist()
            yield pd.Series(out_rows)

    return components_udf


def band_table(signatures: DataFrame, cfg: PipelineConfig, url_col: str = "url") -> DataFrame:
    """signatures(url, sig) -> bands(url, band_id, band_key).

    band_key = xxhash64(band_id, r component values) — 64-bit, JVM-side.
    """
    comp_udf = make_components_udf(cfg)
    r = cfg.rows_per_band
    with_comp = signatures.select(
        url_col, comp_udf(F.col("sig")).alias("components")
    ).where(F.size("components") > 0)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("band_id"),
                F.slice(F.col("components"), i * r + 1, r).alias("vals"),
            )
            for i in range(cfg.n_bands)
        ]
    )
    return (
        with_comp.select(url_col, F.explode(band_structs).alias("band"))
        .select(
            url_col,
            F.col("band.band_id").alias("band_id"),
            F.xxhash64(F.col("band.band_id"), F.col("band.vals")).alias("band_key"),
        )
    )
