"""Pure-numpy sketch kernels shared by the Spark UDFs and the test suite.

These reproduce the reference's sketch *semantics* (a sketch is the set of k
distinct extreme uint64 hashes over all nsize-byte shingles of a document —
/root/reference/src/minhashsketch.py:13-82) without its heap mechanics: a
single `np.unique` + truncate is provably the same set as the reference's
streaming insert-or-replace heap after the full pass.

Batch form: all texts of an Arrow batch are concatenated into ONE byte
buffer and hashed in a single vectorized pass; windows straddling document
boundaries are discarded by slicing per-document ranges. This is the
columnar analog of the reference's 250-wide C hash buffer
(/root/reference/src/minhashsketch.py:214) — amortizing per-call overhead,
but across a whole Arrow batch instead of 250 windows.
"""

from __future__ import annotations

import numpy as np

from ..config import SketchConfig
from ..hashkernels import HASH_FUNS, bottomk, topk, u64_to_i64

_EMPTY_U64 = np.empty(0, dtype=np.uint64)


def _kernel(cfg: SketchConfig):
    try:
        fn, _default_seed = HASH_FUNS[cfg.hash_name]
    except KeyError:
        raise ValueError(f"unknown hash_name {cfg.hash_name!r}") from None
    return fn


def doc_hashes(data: bytes, cfg: SketchConfig) -> np.ndarray:
    """All shingle hashes of one document (uint64[n-nsize+1]); empty if short."""
    if len(data) < cfg.nsize:
        return _EMPTY_U64
    return _kernel(cfg)(data, cfg.nsize, seed=cfg.seed)


def signature(data: bytes, cfg: SketchConfig) -> tuple[np.ndarray, int]:
    """(sorted uint64 sketch of <=maxsize distinct extremes, nvisited).

    nvisited counts shingles *considered* (not retained), matching
    /root/reference/src/minhashsketch.py:247.
    """
    h = doc_hashes(data, cfg)
    sel = bottomk if cfg.minmax == "min" else topk
    return sel(h, cfg.maxsize), int(h.shape[0])


def batch_signatures(
    texts: list[bytes], cfg: SketchConfig
) -> tuple[list[list[int]], list[int]]:
    """Signatures for a whole Arrow batch in one vectorized hash pass.

    Returns (signatures as signed-int64 lists for Spark bigint arrays,
    nvisited per doc).
    """
    sel = bottomk if cfg.minmax == "min" else topk
    nsize = cfg.nsize
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
    total = int(lens.sum())
    sigs: list[list[int]] = []
    nvis: list[int] = []
    if total < nsize:
        # no document long enough; avoid kernel ValueError on tiny buffers
        return [[] for _ in texts], [0] * len(texts)
    buf = np.frombuffer(b"".join(texts), dtype=np.uint8)
    allh = _kernel(cfg)(buf, nsize, seed=cfg.seed)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    for start, length in zip(starts, lens):
        nwin = int(length) - nsize + 1
        if nwin <= 0:
            sigs.append([])
            nvis.append(0)
            continue
        h = allh[start : start + nwin]
        sigs.append(u64_to_i64(sel(h, cfg.maxsize)).tolist())
        nvis.append(nwin)
    return sigs, nvis


def merge_signatures(a: np.ndarray, b: np.ndarray, k: int, minmax: str = "min") -> np.ndarray:
    """Union of two sketches truncated to k extremes — the associative,
    commutative combiner (reference __add__/update,
    /root/reference/src/minhashsketch.py:178-203, :330-384, :477-533)."""
    u = np.union1d(np.asarray(a, dtype=np.uint64), np.asarray(b, dtype=np.uint64))
    if u.shape[0] <= k:
        return u
    return u[:k] if minmax == "min" else u[-k:]


def counted_signature(
    data: bytes, cfg: SketchConfig
) -> tuple[np.ndarray, np.ndarray, int]:
    """(sketch hashes, occurrence count of each retained hash, nvisited).

    Count semantics: TRUE per-shingle multiplicities of the retained hashes
    (np.unique(return_counts=True)). This follows the reference CountTrait's
    documented/tested intent (/root/reference/src/minhashsketch.py:536-565
    and its test expectations), deliberately deviating from the reference
    *code*, which increments a count only on heap insert (update_elt is None
    in _minmaxhash_add_ngrams, so re-sightings never increment) — see
    SURVEY.md §7.3.
    """
    h = doc_hashes(data, cfg)
    if h.shape[0] == 0:
        return _EMPTY_U64, np.empty(0, dtype=np.int64), 0
    uniq, counts = np.unique(h, return_counts=True)
    k = cfg.maxsize
    if uniq.shape[0] > k:
        if cfg.minmax == "min":
            uniq, counts = uniq[:k], counts[:k]
        else:
            uniq, counts = uniq[-k:], counts[-k:]
    return uniq, counts.astype(np.int64), int(h.shape[0])


def merge_counted(
    hashes_a: np.ndarray,
    counts_a: np.ndarray,
    hashes_b: np.ndarray,
    counts_b: np.ndarray,
    k: int,
    minmax: str = "min",
) -> tuple[np.ndarray, np.ndarray]:
    """Merge two counted sketches: counts add for hashes surviving the
    truncated union (reference CountTrait.update,
    /root/reference/src/minhashsketch.py:550-558)."""
    ha = np.asarray(hashes_a, dtype=np.uint64)
    hb = np.asarray(hashes_b, dtype=np.uint64)
    allh = np.concatenate([ha, hb])
    allc = np.concatenate(
        [np.asarray(counts_a, dtype=np.int64), np.asarray(counts_b, dtype=np.int64)]
    )
    order = np.argsort(allh, kind="stable")
    allh, allc = allh[order], allc[order]
    uniq, idx = np.unique(allh, return_index=True)
    # sum counts per unique hash (at most two runs per hash)
    summed = np.add.reduceat(allc, idx)
    if uniq.shape[0] > k:
        if minmax == "min":
            uniq, summed = uniq[:k], summed[:k]
        else:
            uniq, summed = uniq[-k:], summed[-k:]
    return uniq, summed


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact sketch Jaccard |A∩B|/|A∪B| over the two retained sets —
    reference FrozenSketch.jaccard_similarity
    (/root/reference/src/minhashsketch.py:709-718)."""
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    if a.shape[0] == 0 and b.shape[0] == 0:
        return 0.0
    inter = np.intersect1d(a, b, assume_unique=True).shape[0]
    union = a.shape[0] + b.shape[0] - inter
    return inter / union


def jaccard_containment(a: np.ndarray, b: np.ndarray) -> float:
    """|A∩B|/|A| (reference :720-726)."""
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    if a.shape[0] == 0:
        return 0.0
    return np.intersect1d(a, b, assume_unique=True).shape[0] / a.shape[0]


def dice(a: np.ndarray, b: np.ndarray) -> float:
    """Sørensen–Dice 2q/(2q+r+s) (reference :728-736)."""
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    q = np.intersect1d(a, b, assume_unique=True).shape[0]
    r = a.shape[0] - q
    s = b.shape[0] - q
    denom = 2 * q + r + s
    return 2 * q / denom if denom else 0.0


def bray_curtis_dissimilarity(
    hashes_a: np.ndarray,
    counts_a: np.ndarray,
    hashes_b: np.ndarray,
    counts_b: np.ndarray,
) -> float:
    """1 - 2*C_ij/(S_i+S_j) over counted sketches, implementing the
    *documented* formula (sum of counts). The reference's version sums the
    Counter KEYS by mistake (/root/reference/src/minhashsketch.py:773,
    untested there); we deliberately implement the correct formula — see
    SURVEY.md §7.3 'reference defects to NOT reproduce'."""
    ha = np.asarray(hashes_a, dtype=np.uint64)
    hb = np.asarray(hashes_b, dtype=np.uint64)
    ca = np.asarray(counts_a, dtype=np.int64)
    cb = np.asarray(counts_b, dtype=np.int64)
    common, ia, ib = np.intersect1d(ha, hb, assume_unique=True, return_indices=True)
    c_ij = int(np.minimum(ca[ia], cb[ib]).sum())
    s_i = int(ca.sum())
    s_j = int(cb.sum())
    if s_i + s_j == 0:
        return 1.0
    return 1.0 - 2.0 * c_ij / (s_i + s_j)
