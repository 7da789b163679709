"""Vectorized XXH64 over sliding byte windows (numpy, no C extension).

Bit-compatible with the reference's ``_xxhash.hasharray`` (a thin wrapper
around the canonical XXH64: /root/reference/src/_xxhash.c:48-53, default
seed 0 at :4): for each window position ``i`` of width ``w`` over ``buf``,
``out[i] = XXH64(buf[i:i+w], seed)``.

The reference amortizes the Python->C boundary with a 250-wide hash buffer;
here the analogous trick is full numpy vectorization across *all* windows of
an Arrow batch row at once — each algorithm step is one vector op over the
``m = n - w + 1`` window lanes.

Algorithm per the public XXH64 specification (xxHash, BSD-2 - the vendored
copy in the reference is only used by our test suite to generate golden
vectors; no code is shared).
"""

from __future__ import annotations

import numpy as np
from numpy.lib.stride_tricks import sliding_window_view

MASK64 = (1 << 64) - 1

_P1 = np.uint64(11400714785074694791)
_P2 = np.uint64(14029467366897019727)
_P3 = np.uint64(1609587929392839161)
_P4 = np.uint64(9650029242287828579)
_P5 = np.uint64(2870177450012600261)

_PY_P1 = int(_P1)
_PY_P2 = int(_P2)
_PY_P3 = int(_P3)
_PY_P4 = int(_P4)
_PY_P5 = int(_P5)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    rr = np.uint64(r)
    return (x << rr) | (x >> np.uint64(64 - r))


def _le_u64_table(buf: np.ndarray) -> np.ndarray | None:
    """Little-endian uint64 read at every byte offset of ``buf``.

    Returns array t with t[i] = LE64(buf[i:i+8]); length n-7. One 8n-byte
    copy per document — the price of turning per-window byte gathers into
    contiguous vector slices.
    """
    if buf.shape[0] < 8:
        return None
    return np.ascontiguousarray(sliding_window_view(buf, 8)).view("<u8").ravel()


def _le_u32_table(buf: np.ndarray) -> np.ndarray | None:
    if buf.shape[0] < 4:
        return None
    return np.ascontiguousarray(sliding_window_view(buf, 4)).view("<u4").ravel()


def xxh64_sliding(buf: np.ndarray | bytes, width: int, seed: int = 0) -> np.ndarray:
    """XXH64 of every ``width``-byte window of ``buf``; returns uint64[m].

    ``m = len(buf) - width + 1``. Raises ValueError when width > len(buf),
    matching the reference wrapper (/root/reference/src/_xxhash.c:28-33).
    """
    if isinstance(buf, (bytes, bytearray, memoryview)):
        buf = np.frombuffer(bytes(buf), dtype=np.uint8)
    buf = np.asarray(buf, dtype=np.uint8)
    n = buf.shape[0]
    if width > n:
        raise ValueError("window width cannot exceed input length")
    if width <= 0:
        raise ValueError("window width must be positive")
    from . import _hash_cext

    out = _hash_cext.xxh64_sliding_c(buf, width, seed)
    if out is not None:
        return out
    m = n - width + 1
    u64t = _le_u64_table(buf)
    u32t = _le_u32_table(buf)
    seed_u = seed & MASK64

    if width >= 32:
        nstripes = width // 32
        v1 = np.full(m, (seed_u + _PY_P1 + _PY_P2) & MASK64, dtype=np.uint64)
        v2 = np.full(m, (seed_u + _PY_P2) & MASK64, dtype=np.uint64)
        v3 = np.full(m, seed_u, dtype=np.uint64)
        v4 = np.full(m, (seed_u - _PY_P1) & MASK64, dtype=np.uint64)

        def _round(acc: np.ndarray, base_off: int) -> np.ndarray:
            k = u64t[base_off : base_off + m]
            acc = acc + k * _P2
            acc = _rotl(acc, 31)
            return acc * _P1

        for s in range(nstripes):
            base = 32 * s
            v1 = _round(v1, base)
            v2 = _round(v2, base + 8)
            v3 = _round(v3, base + 16)
            v4 = _round(v4, base + 24)
        h = _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        for v in (v1, v2, v3, v4):
            k = _rotl(v * _P2, 31) * _P1
            h ^= k
            h = h * _P1 + _P4
        off = nstripes * 32
    else:
        h = np.full(m, (seed_u + _PY_P5) & MASK64, dtype=np.uint64)
        off = 0

    h = h + np.uint64(width)
    rem = width - off
    while rem >= 8:
        k = _rotl(u64t[off : off + m] * _P2, 31) * _P1
        h ^= k
        h = _rotl(h, 27) * _P1 + _P4
        off += 8
        rem -= 8
    if rem >= 4:
        h ^= u32t[off : off + m].astype(np.uint64) * _P1
        h = _rotl(h, 23) * _P2 + _P3
        off += 4
        rem -= 4
    while rem > 0:
        h ^= buf[off : off + m].astype(np.uint64) * _P5
        h = _rotl(h, 11) * _P1
        off += 1
        rem -= 1
    h ^= h >> np.uint64(33)
    h *= _P2
    h ^= h >> np.uint64(29)
    h *= _P3
    h ^= h >> np.uint64(32)
    return h


def xxh64_fixed(mat: np.ndarray, seed: int = 0) -> np.ndarray:
    """XXH64 of each row of a (k, L) uint8 matrix; returns uint64[k].

    The batch analog of the scalar ``xxh64`` for equal-length inputs: used to
    hash all distinct tokens of one Arrow batch with a handful of vector ops
    instead of a Python call per token (tokens are grouped by byte length by
    the caller). Bit-identical to ``xxh64(row.tobytes(), seed)`` per row.
    """
    mat = np.ascontiguousarray(mat, dtype=np.uint8)
    if mat.ndim != 2:
        raise ValueError("xxh64_fixed expects a (k, L) matrix")
    k, L = mat.shape
    if k == 0:
        return np.empty(0, dtype=np.uint64)

    def r64(off: int) -> np.ndarray:
        return np.ascontiguousarray(mat[:, off : off + 8]).view("<u8").ravel()

    def r32(off: int) -> np.ndarray:
        return np.ascontiguousarray(mat[:, off : off + 4]).view("<u4").ravel()

    seed_u = seed & MASK64
    if L >= 32:
        v1 = np.full(k, (seed_u + _PY_P1 + _PY_P2) & MASK64, dtype=np.uint64)
        v2 = np.full(k, (seed_u + _PY_P2) & MASK64, dtype=np.uint64)
        v3 = np.full(k, seed_u, dtype=np.uint64)
        v4 = np.full(k, (seed_u - _PY_P1) & MASK64, dtype=np.uint64)
        off = 0
        while off + 32 <= L:
            v1 = _rotl(v1 + r64(off) * _P2, 31) * _P1
            v2 = _rotl(v2 + r64(off + 8) * _P2, 31) * _P1
            v3 = _rotl(v3 + r64(off + 16) * _P2, 31) * _P1
            v4 = _rotl(v4 + r64(off + 24) * _P2, 31) * _P1
            off += 32
        h = _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        for v in (v1, v2, v3, v4):
            h ^= _rotl(v * _P2, 31) * _P1
            h = h * _P1 + _P4
    else:
        h = np.full(k, (seed_u + _PY_P5) & MASK64, dtype=np.uint64)
        off = 0
    h = h + np.uint64(L)
    while off + 8 <= L:
        h ^= _rotl(r64(off) * _P2, 31) * _P1
        h = _rotl(h, 27) * _P1 + _P4
        off += 8
    if off + 4 <= L:
        h ^= r32(off).astype(np.uint64) * _P1
        h = _rotl(h, 23) * _P2 + _P3
        off += 4
    while off < L:
        h ^= mat[:, off].astype(np.uint64) * _P5
        h = _rotl(h, 11) * _P1
        off += 1
    h ^= h >> np.uint64(33)
    h *= _P2
    h ^= h >> np.uint64(29)
    h *= _P3
    h ^= h >> np.uint64(32)
    return h


def xxh64(data: bytes, seed: int = 0) -> int:
    """Scalar pure-Python XXH64 (test oracle / tiny inputs)."""

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (64 - r))) & MASK64

    n = len(data)
    seed &= MASK64
    if n >= 32:
        v1 = (seed + _PY_P1 + _PY_P2) & MASK64
        v2 = (seed + _PY_P2) & MASK64
        v3 = seed
        v4 = (seed - _PY_P1) & MASK64
        i = 0
        while i + 32 <= n:
            for j, v in enumerate((v1, v2, v3, v4)):
                k = int.from_bytes(data[i + 8 * j : i + 8 * j + 8], "little")
                v = (v + k * _PY_P2) & MASK64
                v = (rotl(v, 31) * _PY_P1) & MASK64
                if j == 0:
                    v1 = v
                elif j == 1:
                    v2 = v
                elif j == 2:
                    v3 = v
                else:
                    v4 = v
            i += 32
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & MASK64
        for v in (v1, v2, v3, v4):
            k = (rotl((v * _PY_P2) & MASK64, 31) * _PY_P1) & MASK64
            h ^= k
            h = (h * _PY_P1 + _PY_P4) & MASK64
    else:
        h = (seed + _PY_P5) & MASK64
        i = 0
    h = (h + n) & MASK64
    while i + 8 <= n:
        k = int.from_bytes(data[i : i + 8], "little")
        k = (rotl((k * _PY_P2) & MASK64, 31) * _PY_P1) & MASK64
        h ^= k
        h = (rotl(h, 27) * _PY_P1 + _PY_P4) & MASK64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _PY_P1) & MASK64
        h = (rotl(h, 23) * _PY_P2 + _PY_P3) & MASK64
        i += 4
    while i < n:
        h ^= (data[i] * _PY_P5) & MASK64
        h = (rotl(h, 11) * _PY_P1) & MASK64
        i += 1
    h ^= h >> 33
    h = (h * _PY_P2) & MASK64
    h ^= h >> 29
    h = (h * _PY_P3) & MASK64
    h ^= h >> 32
    return h
