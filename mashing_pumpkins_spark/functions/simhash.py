"""SimHash (64-bit) over word tokens — fully batch-vectorized pandas UDF.

Complements MinHash for near-dup detection: one bigint per doc, hamming
distance approximates cosine distance of the token multiset (Charikar 2002).
Bit votes are weighted by term frequency; per-token hash is our bit-exact
xxh64 of the token's UTF-8 bytes.

Vectorization (round-2 rework — the old version called the pure-Python
scalar xxh64 once per distinct token per doc, the classic per-row-UDF
scale-killer):
  1. tokenize the whole Arrow batch, factorize all token occurrences into
     a distinct-token table (pd.factorize, hash-based O(P)),
  2. hash the distinct tokens with the vectorized ``xxh64_fixed`` kernel,
     grouped by byte length (a handful of numpy calls per batch),
  3. expand each distinct hash to a ±1 vote row of shape (64,), gather per
     occurrence, and segment-sum per doc with np.add.reduceat — summing ±1
     over occurrences IS the tf-weighted sum over distinct tokens,
  4. pack votes>0 into one uint64 per doc.
Outputs are bit-identical to the per-token implementation.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from ..hashkernels import xxh64, xxh64_fixed

_SHIFTS = np.arange(64, dtype=np.uint64)


def _hash_token_bytes(tokens: list[bytes], seed: int) -> np.ndarray:
    """xxh64 of each bytes element, vectorized by grouping on byte length."""
    n = len(tokens)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out
    lens = np.fromiter((len(t) for t in tokens), dtype=np.int64, count=n)
    order = np.argsort(lens, kind="stable")
    sorted_lens = lens[order]
    # contiguous runs of equal length -> one xxh64_fixed call per length
    run_starts = np.flatnonzero(np.diff(sorted_lens, prepend=-1))
    run_ends = np.append(run_starts[1:], n)
    for s, e in zip(run_starts, run_ends):
        idx = order[s:e]
        L = int(sorted_lens[s])
        if L == 0:
            out[idx] = np.uint64(xxh64(b"", seed))
            continue
        buf = np.frombuffer(b"".join(tokens[i] for i in idx), dtype=np.uint8)
        out[idx] = xxh64_fixed(buf.reshape(-1, L), seed)
    return out


def simhash_batch(texts: pd.Series, seed: int) -> np.ndarray:
    """SimHash of each text in the batch; returns int64[n] (0 for empty)."""
    toks = texts.fillna("").str.lower().str.split()
    counts = toks.str.len().to_numpy(dtype=np.int64)
    n = len(texts)
    total = int(counts.sum())
    if total == 0:
        return np.zeros(n, dtype=np.int64)
    flat = np.empty(total, dtype=object)
    pos = 0
    for lst in toks:
        k = len(lst)
        if k:
            flat[pos : pos + k] = lst
            pos += k
    codes, uniques = pd.factorize(flat)
    hashes = _hash_token_bytes([u.encode("utf-8") for u in uniques], seed)
    # ±1 vote rows per distinct token, gathered per occurrence
    bits = ((hashes[:, None] >> _SHIFTS) & np.uint64(1)).astype(np.int8)
    signs = (bits << 1) - 1  # 0/1 -> -1/+1
    occ = signs[codes]  # (total, 64)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    nonempty = counts > 0
    votes = np.add.reduceat(occ, starts[nonempty], axis=0)
    packed = ((votes > 0).astype(np.uint64) << _SHIFTS).sum(
        axis=1, dtype=np.uint64
    )
    out = np.zeros(n, dtype=np.int64)
    out[nonempty] = packed.view(np.int64)
    return out


def make_simhash_udf(seed: int = 0):
    @F.pandas_udf(LongType())
    def simhash_udf(text_iter: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for texts in text_iter:
            yield pd.Series(simhash_batch(texts, seed), dtype="int64")

    return simhash_udf


def hamming64(a: Column, b: Column) -> Column:
    """Popcount of XOR — JVM-side."""
    return F.bit_count(a.bitwiseXOR(b))


def _block_bounds(n_blocks: int) -> list[tuple[int, int]]:
    """(shift, width) per block, 64 bits split as evenly as possible."""
    base, extra = divmod(64, n_blocks)
    bounds = []
    shift = 0
    for i in range(n_blocks):
        width = base + (1 if i < extra else 0)
        bounds.append((shift, width))
        shift += width
    return bounds


def _block_value(sh_col: str, shift: int, width: int) -> Column:
    return F.shiftrightunsigned(sh_col, shift).bitwiseAND(F.lit((1 << width) - 1))


def simhash_pairs_from_values(
    sim: DataFrame,
    max_hamming: int = 8,
    id_col: str = "id",
    sh_col: str = "sh",
    index: str = "auto",
    block_candidate_cap: int = 50_000_000,
) -> DataFrame:
    """Near-dup pairs from precomputed simhash values. Both index modes are
    LOSSLESS at the configured radius; exact hamming always verifies.

    index="block": pigeonhole with n_blocks = max_hamming + 1 equal-width
    bit blocks — a pair at distance d <= max_hamming flips bits in at most
    d blocks, so at least one block matches exactly. Key width is
    64/(d+1) bits: fine for the classic web-dedup radius (d<=3 -> 16-bit
    keys) but at d=8 the keys are ~7 bits, so buckets hold n/128 of the
    corpus and within-bucket pairing goes near-quadratic at web scale.

    index="pair": block-PAIR multi-index with n_blocks = max_hamming + 2 —
    at distance d at least two blocks stay clean, so at least one of the
    C(n_blocks, 2) block pairs matches on BOTH values. Keys are twice as
    wide (~13 bits at d=8 -> buckets of n/7000), at the cost of
    C(d+2, 2) exploded rows per doc instead of d+1. This is the
    scale-safe default for radii >= 4.

    index="auto" is COST-BASED (round 4 — the width-only rule paid the
    C(d+2,2)-key explode even on corpora where 7-bit buckets are harmless,
    the one measured round-3 regression): when single-block keys are >= 13
    bits, "block" wins outright; otherwise the distinct-value count n is
    read (one count job over `sim` — cheap when the caller persisted it,
    which simhash_near_pairs does by default) and block-mode's expected
    uniform candidate volume (d+1) * n^2 / 2^(w_min+1) is compared against
    ``block_candidate_cap``: below the cap the quadratic term is smaller
    than the pair index's fixed overhead (wide explode codegen + a join
    with C(d+2,2)x the keys — measured +3.5 s at 5k docs), above it the
    block join grows quadratically while pair stays ~linear, so "pair"
    wins. Skewed (non-uniform) value distributions only make block worse
    than the estimate, so the cap errs toward "pair" exactly when it
    should. Both modes emit the byte-identical pair set, so the choice is
    purely physical.

    Dup-clique optimization (round 3): only DISTINCT sh values enter the
    blocking join. A web corpus is dup-heavy by construction — every member
    of an identical-sh clique used to ride the join under every key and be
    deduplicated at the end; now cliques and cross-group pairs are expanded
    from the (tiny) distinct-value pair set by two member joins, and the
    wide final .distinct() disappears (distinctness holds by construction:
    one row per value pair x member pair). Candidate volume becomes a
    function of DISTINCT values, not documents.
    """
    members = sim.select(F.col(id_col).alias("id"), F.col(sh_col).alias("sh"))
    values = members.select("sh").distinct()
    if index == "auto":
        w_min = 64 // (max_hamming + 1)
        if w_min >= 13:
            index = "block"
        else:
            n_values = values.count()
            est_block_cands = (
                (max_hamming + 1) * n_values * n_values / 2 ** (w_min + 1)
            )
            index = "pair" if est_block_cands > block_candidate_cap else "block"
    if index == "block":
        n_blocks = min(max_hamming + 1, 64)
        keys = [
            F.struct(
                F.lit(i).alias("q"), _block_value("sh", shift, width).alias("qv")
            )
            for i, (shift, width) in enumerate(_block_bounds(n_blocks))
        ]
    elif index == "pair":
        n_blocks = min(max_hamming + 2, 64)
        bounds = _block_bounds(n_blocks)
        keys = []
        qid = 0
        for i in range(n_blocks):
            si, wi = bounds[i]
            for j in range(i + 1, n_blocks):
                sj, wj = bounds[j]
                combined = F.shiftleft(
                    _block_value("sh", si, wi), wj
                ).bitwiseOR(_block_value("sh", sj, wj))
                keys.append(
                    F.struct(F.lit(qid).alias("q"), combined.alias("qv"))
                )
                qid += 1
    else:
        raise ValueError(f"unknown index mode: {index!r}")

    keyed = values.select(
        "sh", F.explode(F.array(*keys)).alias("blk")
    ).select("sh", F.col("blk.q").alias("q"), F.col("blk.qv").alias("qv"))
    va = keyed.select("q", "qv", F.col("sh").alias("sh_a"))
    vb = keyed.select("q", "qv", F.col("sh").alias("sh_b"))
    value_pairs = (
        va.join(vb, ["q", "qv"])
        .where(F.col("sh_a") < F.col("sh_b"))
        .select(
            "sh_a",
            "sh_b",
            hamming64(F.col("sh_a"), F.col("sh_b")).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
    ma = members.select(F.col("id").alias("_ida"), F.col("sh").alias("sh_a"))
    mb = members.select(F.col("id").alias("_idb"), F.col("sh").alias("sh_b"))
    cross = (
        value_pairs.join(ma, "sh_a")
        .join(mb, "sh_b")
        .select(
            F.least("_ida", "_idb").alias("id_a"),
            F.greatest("_ida", "_idb").alias("id_b"),
            "hamming",
        )
    )
    within = (
        ma.join(mb, F.col("sh_a") == F.col("sh_b"))
        .where(F.col("_ida") < F.col("_idb"))
        .select(
            F.col("_ida").alias("id_a"),
            F.col("_idb").alias("id_b"),
            F.lit(0).cast("int").alias("hamming"),
        )
    )
    return cross.unionAll(within)


def simhash_near_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
    seed: int = 0,
    persist: bool = True,
    index: str = "auto",
    return_signatures: bool = False,
    block_candidate_cap: int = 50_000_000,
) -> DataFrame:
    """Near-dup pairs by SimHash: compute signatures (one vectorized UDF
    pass), then lossless multi-index blocking + exact hamming verify — see
    simhash_pairs_from_values.

    The blocking self-join consumes the signature table twice; by default
    it is persisted so the text scan + simhash UDF run once (verified: no
    exchange reuse without it). CACHE CONTRACT: the persisted blocks live
    until unpersisted — in a long-lived session, pass
    ``return_signatures=True`` to get ``(pairs, signatures)`` and call
    ``signatures.unpersist()`` once the pairs are materialized, or pass
    ``persist=False`` if the caller already materialized a signature table
    (the scale path: signatures are a checkpointed stage anyway). NOTE:
    ``index="auto"`` at radius >= 4 runs a distinct-count job to pick the
    physical index (see simhash_pairs_from_values) — with ``persist=False``
    that count recomputes the signature UDF, so pass an explicit index or
    keep the default persist."""
    sim = docs.select(
        F.col(id_col).alias("id"), make_simhash_udf(seed)(F.col(text_col)).alias("sh")
    )
    if persist:
        from pyspark.storagelevel import StorageLevel

        sim = sim.persist(StorageLevel.MEMORY_AND_DISK)
    pairs = simhash_pairs_from_values(
        sim,
        max_hamming=max_hamming,
        index=index,
        block_candidate_cap=block_candidate_cap,
    )
    return (pairs, sim) if return_signatures else pairs
