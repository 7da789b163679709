"""Bit-compatible hash kernels + bottom-k/top-k selection (pure numpy).

Everything downstream (signatures, LSH bands, Jaccard verification) depends
on these matching the reference C kernels bit-for-bit; see tests/test_hashkernels.py.
"""

from __future__ import annotations

import numpy as np

from .mmh3 import mmh3_x64_128_low64, mmh3_x64_128_low64_sliding
from .u64 import MASK64, i64_to_u64, u64_to_i64
from .xxh64 import xxh64, xxh64_fixed, xxh64_sliding

# name -> (sliding kernel, reference default seed)
# seeds: /root/reference/src/_xxhash.c:4 (0), /root/reference/src/_murmurhash3.cpp:4 (42)
HASH_FUNS = {
    "xxh64": (xxh64_sliding, 0),
    "mmh3_x64_128_low64": (mmh3_x64_128_low64_sliding, 42),
}


def bottomk(hashes: np.ndarray, k: int) -> np.ndarray:
    """k smallest *distinct* uint64 hashes, ascending (unsigned order).

    Exactly the content of the reference MinSketch heap after a single pass
    (/root/reference/src/minhashsketch.py:13-82 maintains k distinct minima;
    np.unique gives sorted distinct values — same set, provably).
    """
    u = np.unique(np.asarray(hashes, dtype=np.uint64))
    return u[:k] if u.shape[0] > k else u


def topk(hashes: np.ndarray, k: int) -> np.ndarray:
    """k largest distinct uint64 hashes, ascending (MaxSketch analog)."""
    u = np.unique(np.asarray(hashes, dtype=np.uint64))
    return u[-k:] if u.shape[0] > k else u


__all__ = [
    "HASH_FUNS",
    "MASK64",
    "bottomk",
    "topk",
    "i64_to_u64",
    "u64_to_i64",
    "xxh64",
    "xxh64_fixed",
    "xxh64_sliding",
    "mmh3_x64_128_low64",
    "mmh3_x64_128_low64_sliding",
]
