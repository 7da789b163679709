"""HyperLogLog distinct counting (Flajolet et al. 2007).

The fixed-memory cardinality sketch: ``m`` registers, each holding the
max leading-zero rank seen in its hash bucket; the estimate is the
bias-corrected harmonic mean.  Complements the repo's KMV estimator
(functions/estimators.py — the reference-aligned bottom-k form): HLL
state is m SMALL INTEGERS regardless of cardinality, and two sketches
merge by elementwise register max (:func:`merge_registers`), so distinct
URLs/tokens/shingles at 10^12 rows cost one map-side-combined groupBy to
at most m rows per task — no distinct-shuffle of the keys themselves.

Determinism: the split 32+32-bit md5 hash (same idiom as the
classifier/CMS buckets) and a string-length leading-zero rank
(``33 - length(bin(h2))`` — integer, no log2) make every register, and
an all-integer scaled estimate, replayable in ANSI SQL: the gate query
`hll_distinct` is a FULL value oracle including the estimate.

All Column algebra; no Python in any per-row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "alpha_e6",
    "hll_bucket_rho",
    "hll_registers",
    "hll_estimate",
    "merge_registers",
]

# 2^(33 - rho) contributions keep the harmonic-mean denominator an exact
# BIGINT (rho <= 33), so the estimate replays bit-identically in SQL.
_K = 33


def alpha_e6(m: int) -> int:
    """Flajolet bias constant as a parts-per-million integer — computed
    once driver-side so Spark and the SQL oracle embed the SAME literal."""
    if m < 16 or m & (m - 1):
        raise ValueError(f"m must be a power of two >= 16, got {m}")
    if m == 16:
        return 673_000
    if m == 32:
        return 697_000
    if m == 64:
        return 709_000
    return round(1_000_000 * 0.7213 / (1 + 1.079 / m))


def _rho(h2: Column) -> Column:
    # rank of the first 1-bit in a 32-bit value: 33 - bit_length(h2),
    # via the binary-string length (exact integer in Spark AND DuckDB);
    # h2 == 0 (all 32 bits zero) ranks 33.
    return F.when(h2 == 0, F.lit(33)).otherwise(
        F.lit(33) - F.length(F.bin(h2))
    )


def hll_bucket_rho(key: Column, m: int) -> tuple[Column, Column]:
    """(bucket, rho) columns for one key — the per-row projection both
    :func:`hll_registers` and callers fusing extra aggregates onto the
    same pass (e.g. the hll_distinct gate query) share, so the md5
    split-hash recipe exists in exactly one place."""
    alpha_e6(m)  # validates m
    digest = F.md5(key.cast("string"))
    h1 = F.conv(F.substring(digest, 1, 8), 16, 10).cast("bigint")
    h2 = F.conv(F.substring(digest, 9, 8), 16, 10).cast("bigint")
    return F.pmod(h1, F.lit(m)), _rho(h2)


def hll_registers(
    df: DataFrame, key_col: str = "key", m: int = 1024
) -> DataFrame:
    """Sketch the distinct values of ``df[key_col]`` into at most ``m``
    register rows ``(bucket, m_j)`` — map-side combined, never a distinct
    shuffle of the keys.

    Streaming: pass a ``readStream`` DataFrame and this is a NATIVE
    Structured-Streaming aggregation (groupBy + max needs no custom
    state) — with ``outputMode("complete"/"update")`` the registers
    converge to exactly the batch sketch of everything seen, regardless
    of micro-batch boundaries (parity-pinned in tests/test_hll.py)."""
    bucket, rho = hll_bucket_rho(F.col(key_col), m)
    return (
        df.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("m_j"))
    )


def merge_registers(a: DataFrame, b: DataFrame) -> DataFrame:
    """HLL(A) merge HLL(B) = elementwise register max == HLL(A union B)
    exactly — sketches build per shard/day and fold without rescans."""
    return (
        a.unionByName(b).groupBy("bucket").agg(F.max("m_j").alias("m_j"))
    )


def hll_estimate(registers: DataFrame, m: int) -> DataFrame:
    """One-row summary: the exact-integer harmonic-mean denominator
    ``s_sum`` = sum over ALL m buckets of 2^(33 - M_j) (absent bucket:
    M_j = 0), the occupied-bucket count, and the standard HLL estimate
    ``alpha_m * m^2 * 2^33 / s_sum`` (double, for library use — the gate
    derives an all-integer scaled form from s_sum instead).

    Valid range (round-7 ADVICE): this is the RAW bias-corrected harmonic
    mean only — Flajolet's small-range correction (linear counting
    ``m * ln(m / V)`` when estimate < 2.5m and empty buckets V > 0) and
    the 2^64 large-range correction are deliberately omitted so the
    estimate stays exactly SQL-replayable. Treat estimates below ~2.5*m
    as biased (an EMPTY input reads ~0.7*m, pinned by
    tests/test_hll.py::test_empty_input); cardinalities from ~2.5*m up to
    well below 2^50 are in the standard ±1.04/sqrt(m) regime (measured
    1.23% error at m=4096 on 114.6M true distinct)."""
    a_e6 = alpha_e6(m)
    agg = registers.agg(
        F.coalesce(
            F.sum(F.pow(F.lit(2.0), F.lit(_K) - F.col("m_j")).cast("bigint")),
            F.lit(0),
        ).alias("s_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    s_sum = (
        F.col("s_present")
        + (F.lit(m) - F.col("n_present")) * F.lit(2**_K).cast("bigint")
    )
    return agg.select(
        F.lit(m).alias("m"),
        s_sum.cast("bigint").alias("s_sum"),
        F.col("n_present").cast("bigint").alias("n_present"),
        (
            F.lit(a_e6 * m * m) * F.lit(float(2**_K)) / s_sum / F.lit(1e6)
        ).alias("estimate"),
    )
