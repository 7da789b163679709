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


# DNA reverse-complement byte table: ACGT<->TGCA (case-preserving), every
# other byte maps to itself (the reference's mash kernel only ever sees
# ACGT input; identity elsewhere keeps the transform total).
_RC_TABLE = np.arange(256, dtype=np.uint8)
for _a, _b in zip(b"ACGTacgt", b"TGCAtgca"):
    _RC_TABLE[_a] = _b


def _canonical_dna_rc_hashes(
    buf: np.ndarray, nsize: int, kernel, seed: int
) -> np.ndarray:
    """MASH canonical-window hashing (reference hasharray_withrc,
    /root/reference/src/_murmurhash3_mash.cpp:60-74): for each nsize window,
    hash the lexicographically smaller of (window, reverse_complement
    (window)). Vectorized: hash the buffer forward AND its full reverse
    complement (rc window j = L-nsize-i is exactly revcomp(window i)), then
    select per window by a row-wise lex compare of the two byte matrices.

    The reference compares with strcmp from the window START TO THE END OF
    THE WHOLE STRING (suffix compare, not window compare); the choices can
    only differ when the two windows are byte-identical — and then both
    candidate hashes are equal — so outputs are provably identical to the
    reference for NUL-free input.
    """
    from numpy.lib.stride_tricks import sliding_window_view

    rc = _RC_TABLE[buf][::-1]
    fwd = kernel(buf, nsize, seed=seed)
    rev = kernel(rc, nsize, seed=seed)[::-1]
    a = sliding_window_view(buf, nsize)
    b = sliding_window_view(rc, nsize)[::-1]
    neq = a != b
    any_neq = neq.any(axis=1)
    first = np.argmax(neq, axis=1)
    rows = np.arange(a.shape[0])
    use_fwd = ~any_neq | (a[rows, first] < b[rows, first])
    return np.where(use_fwd, fwd, rev)


CANONICALIZERS = {
    "none": None,
    "dna_rc": _canonical_dna_rc_hashes,
}


def _all_hashes(buf: np.ndarray | bytes, cfg: SketchConfig) -> np.ndarray:
    """Window hashes honoring cfg.canonical; input must hold >= nsize bytes."""
    if isinstance(buf, (bytes, bytearray, memoryview)):
        buf = np.frombuffer(bytes(buf), dtype=np.uint8)
    canon = CANONICALIZERS.get(cfg.canonical, "missing")
    if canon == "missing":
        raise ValueError(f"unknown canonical scheme {cfg.canonical!r}")
    if canon is None:
        return _kernel(cfg)(buf, cfg.nsize, seed=cfg.seed)
    return canon(buf, cfg.nsize, _kernel(cfg), cfg.seed)


def doc_hashes(data: bytes, cfg: SketchConfig) -> np.ndarray:
    """All shingle hashes of one document (uint64[n-nsize+1]); empty if short."""
    if len(data) < cfg.nsize:
        return _EMPTY_U64
    return _all_hashes(data, cfg)


def signature(data: bytes, cfg: SketchConfig) -> tuple[np.ndarray, int]:
    """(sorted uint64 sketch of <=maxsize distinct extremes, nvisited).

    nvisited counts shingles *considered* (not retained), matching
    /root/reference/src/minhashsketch.py:247.
    """
    h = doc_hashes(data, cfg)
    sel = bottomk if cfg.minmax == "min" else topk
    return sel(h, cfg.maxsize), int(h.shape[0])


def signature_with_ngrams(
    data: bytes, cfg: SketchConfig
) -> tuple[np.ndarray, list[bytes], int]:
    """(sketch hashes, retained shingle BYTES per hash, nvisited) — the
    debug/interop form of the reference's make_elt, which keeps the ngram
    alongside its hash in every heap element
    (/root/reference/src/minhashsketch.py:8-10; used for sketch interchange
    in the reference notebook). Hash-only is the production default — at
    k=256/nsize=21 the payload multiplies sketch storage ~2.6x — so this is
    a separate opt-in path, not a flag on the hot one.

    For each retained hash the FIRST occurrence's forward window bytes are
    stored (under canonical="dna_rc" a hash may have been computed from the
    reverse-complement strand; the forward window is what the document
    contains, mirroring the reference's make_elt which stores the ngram as
    passed in).
    """
    if isinstance(data, (bytes, bytearray, memoryview)):
        buf = np.frombuffer(bytes(data), dtype=np.uint8)
    else:
        buf = np.asarray(data, dtype=np.uint8)
    h = doc_hashes(bytes(buf), cfg)
    if h.shape[0] == 0:
        return _EMPTY_U64, [], 0
    sel = bottomk if cfg.minmax == "min" else topk
    sig = sel(h, cfg.maxsize)
    order = np.argsort(h, kind="stable")
    sorted_h = h[order]
    first_occurrence = order[np.searchsorted(sorted_h, sig)]
    ngrams = [bytes(buf[i : i + cfg.nsize]) for i in first_occurrence]
    return sig, ngrams, int(h.shape[0])


def signatures_from_buffer(
    buf: np.ndarray,
    starts: np.ndarray,
    lens: np.ndarray,
    cfg: SketchConfig,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-document sketches over one shared byte buffer — the zero-copy
    core of both the bytes-list and Arrow paths.

    ``buf`` holds every document's bytes; document i occupies
    ``buf[starts[i] : starts[i] + lens[i]]`` (documents must be contiguous
    and in order, which Arrow string buffers guarantee). One vectorized
    hash pass covers the whole buffer; windows straddling document
    boundaries are discarded by the per-document slicing. Canonicalization
    is window-local (each window's decision and rc hash depend only on its
    own bytes), so the shared-buffer trick remains valid under it.

    Returns (flat signed-int64 signature values, int32 list offsets
    [len n+1], nvisited int64[n]) — directly assemblable into an Arrow
    ListArray with zero per-document Python objects.
    """
    sel = bottomk if cfg.minmax == "min" else topk
    nsize = cfg.nsize
    n = len(lens)
    nvis = np.maximum(lens.astype(np.int64) - nsize + 1, 0)
    offsets = np.zeros(n + 1, dtype=np.int32)
    if buf.shape[0] < nsize or int(nvis.sum()) == 0:
        return np.empty(0, dtype=np.int64), offsets, nvis
    if cfg.canonical == "none":
        # fused C fast path: per-doc sliding hash + distinct bottom/top-k in
        # one native call (bit-identical to the numpy loop below; golden
        # vectors and the batch-vs-per-doc property suite pin both paths)
        from ..hashkernels import _hash_cext

        fused = _hash_cext.sketch_from_buffer_c(
            buf, starts, lens, nsize, cfg.seed, cfg.maxsize, cfg.minmax,
            cfg.hash_name,
        )
        if fused is not None:
            flat, off64 = fused
            return flat, off64.astype(np.int32), nvis
    allh = _all_hashes(buf, cfg)
    parts: list[np.ndarray] = []
    sizes = np.zeros(n, dtype=np.int64)
    for i in range(n):
        nwin = int(nvis[i])
        if nwin == 0:
            continue
        start = int(starts[i])
        s = sel(allh[start : start + nwin], cfg.maxsize)
        sizes[i] = s.shape[0]
        parts.append(s)
    np.cumsum(sizes, out=sizes)
    offsets[1:] = sizes.astype(np.int32)
    flat = np.concatenate(parts) if parts else _EMPTY_U64
    return u64_to_i64(flat), offsets, nvis


def batch_signatures(
    texts: list[bytes], cfg: SketchConfig
) -> tuple[list[list[int]], list[int]]:
    """Signatures for a whole Arrow batch in one vectorized hash pass.

    Returns (signatures as signed-int64 lists for Spark bigint arrays,
    nvisited per doc). The hot pipeline path uses the Arrow-native
    signatures_from_buffer directly; this list form remains for the
    column-append UDFs and the test oracles.
    """
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
    starts = np.concatenate(([0], np.cumsum(lens)[:-1])) if len(texts) else lens
    buf = np.frombuffer(b"".join(texts), dtype=np.uint8)
    flat, offsets, nvis = signatures_from_buffer(buf, starts, lens, cfg)
    sigs = [
        flat[offsets[i] : offsets[i + 1]].tolist() for i in range(len(texts))
    ]
    return sigs, nvis.tolist()


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
