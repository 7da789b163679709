"""SimHash (64-bit) over word tokens — vectorized pandas UDF.

Complements MinHash for near-dup detection: one bigint per doc, hamming
distance approximates cosine distance of the token multiset. Uses our
bit-exact xxh64 kernel per distinct token (hashing the token bytes), bit
votes weighted by term frequency.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from ..hashkernels import xxh64


def _simhash_tokens(tokens: list[str], seed: int) -> int:
    if not tokens:
        return 0
    votes = np.zeros(64, dtype=np.int64)
    counts: dict[str, int] = {}
    for t in tokens:
        counts[t] = counts.get(t, 0) + 1
    for tok, w in counts.items():
        h = xxh64(tok.encode("utf-8"), seed)
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        votes += np.where(bits.astype(bool), w, -w)
    out = 0
    for i in range(64):
        if votes[i] > 0:
            out |= 1 << i
    return out - (1 << 64) if out >= 1 << 63 else out


def make_simhash_udf(seed: int = 0):
    @F.pandas_udf(LongType())
    def simhash_udf(text_iter: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for texts in text_iter:
            out = [
                _simhash_tokens((t or "").lower().split(), seed)
                for t in texts.fillna("")
            ]
            yield pd.Series(out, dtype="int64")

    return simhash_udf


def hamming64(a: Column, b: Column) -> Column:
    """Popcount of XOR — JVM-side."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
    seed: int = 0,
) -> DataFrame:
    """Near-dup pairs by SimHash: block on the four 16-bit quarters (a pair
    within hamming<=d of d<=... shares at least one exact quarter when d<4;
    for larger d this is a recall/cost tradeoff, standard practice), then
    verify exact hamming. Blocking is an equi-join — shuffle on the quarter
    value, no all-pairs."""
    sim = docs.select(
        F.col(id_col).alias("id"), make_simhash_udf(seed)(F.col(text_col)).alias("sh")
    )
    quarters = sim.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("q"),
                        F.shiftrightunsigned("sh", 16 * q)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("qv"),
                    )
                    for q in range(4)
                ]
            )
        ).alias("blk"),
    ).select("id", "sh", F.col("blk.q").alias("q"), F.col("blk.qv").alias("qv"))
    a = quarters.select(F.col("q"), F.col("qv"), F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = quarters.select(F.col("q"), F.col("qv"), F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        a.join(b, ["q", "qv"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming64(F.col("sh_a"), F.col("sh_b")).alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
