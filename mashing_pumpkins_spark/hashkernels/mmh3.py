"""Vectorized MurmurHash3-x64-128 (low 64 bits) over sliding byte windows.

Bit-compatible with the reference's ``_murmurhash3.hasharray``
(/root/reference/src/_murmurhash3.cpp:48-54, default seed 42 at :4): for
each window ``i`` of width ``w``, ``out[i] = low64(MMH3_x64_128(buf[i:i+w],
seed))`` where low64 is ``outh[0]`` — the finalized ``h1`` of the canonical
public-domain algorithm (Austin Appleby).

Golden anchor: hasharray(b"ACG", 3, seed=42)[0] == 1731421407650554201
(/root/reference/src/tests/test__murmurhash3.py:5-14).
"""

from __future__ import annotations

import numpy as np

from .xxh64 import _le_u64_table, _rotl

MASK64 = (1 << 64) - 1

_C1 = np.uint64(0x87C37B91114253D5)
_C2 = np.uint64(0x4CF5AD432745937F)
_M5 = np.uint64(5)
_A1 = np.uint64(0x52DCE729)
_A2 = np.uint64(0x38495AB5)
_F1 = np.uint64(0xFF51AFD7ED558CCD)
_F2 = np.uint64(0xC4CEB9FE1A85EC53)

_PY_C1 = int(_C1)
_PY_C2 = int(_C2)


def _fmix64(k: np.ndarray) -> np.ndarray:
    k ^= k >> np.uint64(33)
    k *= _F1
    k ^= k >> np.uint64(33)
    k *= _F2
    k ^= k >> np.uint64(33)
    return k


def mmh3_x64_128_low64_sliding(
    buf: np.ndarray | bytes, width: int, seed: int = 42
) -> np.ndarray:
    """low64(MurmurHash3_x64_128) of every window; returns uint64[m]."""
    if isinstance(buf, (bytes, bytearray, memoryview)):
        buf = np.frombuffer(bytes(buf), dtype=np.uint8)
    buf = np.asarray(buf, dtype=np.uint8)
    n = buf.shape[0]
    if width > n:
        raise ValueError("window width cannot exceed input length")
    if width <= 0:
        raise ValueError("window width must be positive")
    from . import _hash_cext

    out = _hash_cext.mmh3_low64_sliding_c(buf, width, seed)
    if out is not None:
        return out
    m = n - width + 1
    u64t = _le_u64_table(buf)
    seed_u = np.uint64(seed & 0xFFFFFFFF)  # reference wrapper takes uint32 seed

    h1 = np.full(m, seed_u, dtype=np.uint64)
    h2 = h1.copy()

    nblocks = width // 16
    for b in range(nblocks):
        base = 16 * b
        k1 = u64t[base : base + m] * _C1
        k1 = _rotl(k1, 31) * _C2
        h1 ^= k1
        h1 = _rotl(h1, 27) + h2
        h1 = h1 * _M5 + _A1
        k2 = u64t[base + 8 : base + 8 + m] * _C2
        k2 = _rotl(k2, 33) * _C1
        h2 ^= k2
        h2 = _rotl(h2, 31) + h1
        h2 = h2 * _M5 + _A2

    tail = width & 15
    toff = nblocks * 16
    if tail > 8:
        k2 = np.zeros(m, dtype=np.uint64)
        for i in range(8, tail):
            k2 ^= buf[toff + i : toff + i + m].astype(np.uint64) << np.uint64(
                8 * (i - 8)
            )
        k2 *= _C2
        k2 = _rotl(k2, 33) * _C1
        h2 ^= k2
    if tail > 0:
        k1 = np.zeros(m, dtype=np.uint64)
        for i in range(min(tail, 8)):
            k1 ^= buf[toff + i : toff + i + m].astype(np.uint64) << np.uint64(8 * i)
        k1 *= _C1
        k1 = _rotl(k1, 31) * _C2
        h1 ^= k1

    w = np.uint64(width)
    h1 ^= w
    h2 ^= w
    h1 += h2
    h2 += h1
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 += h2
    return h1


def mmh3_x64_128_low64(data: bytes, seed: int = 42) -> int:
    """Scalar pure-Python oracle for the vectorized kernel."""

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (64 - r))) & MASK64

    def fmix(k: int) -> int:
        k ^= k >> 33
        k = (k * 0xFF51AFD7ED558CCD) & MASK64
        k ^= k >> 33
        k = (k * 0xC4CEB9FE1A85EC53) & MASK64
        k ^= k >> 33
        return k

    n = len(data)
    h1 = h2 = seed & 0xFFFFFFFF
    nblocks = n // 16
    for b in range(nblocks):
        k1 = int.from_bytes(data[16 * b : 16 * b + 8], "little")
        k2 = int.from_bytes(data[16 * b + 8 : 16 * b + 16], "little")
        k1 = (k1 * _PY_C1) & MASK64
        k1 = (rotl(k1, 31) * _PY_C2) & MASK64
        h1 ^= k1
        h1 = (rotl(h1, 27) + h2) & MASK64
        h1 = (h1 * 5 + 0x52DCE729) & MASK64
        k2 = (k2 * _PY_C2) & MASK64
        k2 = (rotl(k2, 33) * _PY_C1) & MASK64
        h2 ^= k2
        h2 = (rotl(h2, 31) + h1) & MASK64
        h2 = (h2 * 5 + 0x38495AB5) & MASK64
    tail = data[16 * nblocks :]
    k1 = k2 = 0
    if len(tail) > 8:
        for i in range(8, len(tail)):
            k2 ^= tail[i] << (8 * (i - 8))
        k2 = (k2 * _PY_C2) & MASK64
        k2 = (rotl(k2, 33) * _PY_C1) & MASK64
        h2 ^= k2
    if len(tail) > 0:
        for i in range(min(len(tail), 8)):
            k1 ^= tail[i] << (8 * i)
        k1 = (k1 * _PY_C1) & MASK64
        k1 = (rotl(k1, 31) * _PY_C2) & MASK64
        h1 ^= k1
    h1 ^= n
    h2 ^= n
    h1 = (h1 + h2) & MASK64
    h2 = (h2 + h1) & MASK64
    h1 = fmix(h1)
    h2 = fmix(h2)
    h1 = (h1 + h2) & MASK64
    return h1
