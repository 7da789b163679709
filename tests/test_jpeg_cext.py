"""Self-compiled C JPEG entropy kernel (operators/_jpeg_cext): pixel
EQUALITY with the pure decoder over the full encode battery (the kernel
shares dequant/IDCT/color with the pure path, so unlike the Pillow
backend there is no IDCT tolerance — outputs must be identical), the
error contract, the progressive per-scan fallback, and the kill switch.

Skip-gated on a C toolchain being present (cc/gcc/clang); the
toolchain-absent fallback (load() -> None -> pure path) is exercised by
the kill-switch test either way.
"""

from __future__ import annotations

import numpy as np
import pytest

from mashing_pumpkins_spark.operators import _jpeg_cext
from mashing_pumpkins_spark.operators.jpegcodec import (
    decode_jpeg,
    decode_jpeg_auto,
    decode_jpeg_cext,
    encode_jpeg,
    encode_jpeg_progressive,
)

HAVE_CEXT = _jpeg_cext.load() is not None

pytestmark = pytest.mark.skipif(
    not HAVE_CEXT, reason="no C toolchain / kernel failed to compile"
)


def _gray(h=40, w=56):
    y, x = np.mgrid[0:h, 0:w]
    return ((x * 3 + y * 5) % 256).astype(np.uint8)


def _rgb(h=32, w=48, seed=11):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8).astype(np.uint8)


CASES = [
    ("gray_q75", lambda: encode_jpeg(_gray(), quality=75)),
    ("gray_q10", lambda: encode_jpeg(_gray(33, 41), quality=10)),
    ("gray_q95_odd", lambda: encode_jpeg(_gray(17, 19), quality=95)),
    ("rgb_444", lambda: encode_jpeg(_rgb(), quality=85, subsampling="4:4:4")),
    ("rgb_420", lambda: encode_jpeg(_rgb(30, 46), quality=60, subsampling="4:2:0")),
    (
        "rgb_420_restart",
        lambda: encode_jpeg(
            _rgb(64, 80, seed=3), quality=75, subsampling="4:2:0",
            restart_interval=2,
        ),
    ),
    (
        "gray_restart",
        lambda: encode_jpeg(_gray(48, 64), quality=75, restart_interval=5),
    ),
    (
        "progressive_420",
        lambda: encode_jpeg_progressive(_rgb(40, 56, seed=5), quality=75,
                                        subsampling="4:2:0"),
    ),
    (
        "progressive_gray",
        lambda: encode_jpeg_progressive(_gray(41, 29), quality=50),
    ),
]


@pytest.mark.parametrize("name,make", CASES, ids=[c[0] for c in CASES])
def test_pixels_identical_to_pure(name, make):
    payload = make()
    assert np.array_equal(decode_jpeg(payload), decode_jpeg_cext(payload)), name


def test_error_contract_matches_pure():
    payload = encode_jpeg(_gray(), quality=75)
    truncated = payload[: len(payload) // 2]
    with pytest.raises(ValueError):
        decode_jpeg_cext(truncated)
    with pytest.raises(ValueError):
        decode_jpeg(truncated)
    with pytest.raises(ValueError):
        decode_jpeg_cext(b"\x00\x01")


def test_bomb_cap_still_checked_before_entropy_decode():
    payload = encode_jpeg(_gray(64, 64), quality=75)
    with pytest.raises(ValueError, match="max_pixels"):
        decode_jpeg_cext(payload, max_pixels=100)


def test_auto_dispatch_cext():
    payload = encode_jpeg(_gray(), quality=75)
    assert np.array_equal(
        decode_jpeg_auto(payload, backend="cext"), decode_jpeg(payload)
    )


def test_kill_switch_disables_kernel(monkeypatch):
    monkeypatch.setenv("MP_SPARK_JPEG_CEXT", "0")
    assert _jpeg_cext.load() is None
    with pytest.raises(RuntimeError, match="unavailable"):
        decode_jpeg_cext(encode_jpeg(_gray(), quality=75))


def test_kernel_is_measurably_faster():
    """The whole point: the C entropy walk must beat the Python one by a
    wide margin on a real-size image (loose 2x bound — the pure path
    also spends time in shared numpy stages; BENCH records the real
    ratio)."""
    import time

    rng = np.random.default_rng(9)
    big = rng.integers(0, 256, (320, 480, 3), dtype=np.uint8).astype(np.uint8)
    payload = encode_jpeg(big, quality=75, subsampling="4:2:0")
    decode_jpeg(payload), decode_jpeg_cext(payload)  # warm both paths
    t0 = time.perf_counter()
    decode_jpeg(payload)
    t1 = time.perf_counter()
    for _ in range(4):
        decode_jpeg_cext(payload)
    t2 = time.perf_counter()
    assert (t1 - t0) / ((t2 - t1) / 4) > 2.0
