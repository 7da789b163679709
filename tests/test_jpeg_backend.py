"""Pluggable JPEG decode backend (jpegcodec.decode_jpeg_auto).

Resolution order: explicit arg > MP_SPARK_JPEG_BACKEND env > auto-detect
(Pillow iff importable, else the pure-numpy decoder). The container this
repo tests in has no image wheels, so the native cross-check battery is
skip-gated on Pillow's presence — the wheel-absent fallback path itself
is always exercised.

Pixel contract across backends: T.81 does not mandate a bit-exact IDCT
(decoders need only meet the old IEEE 1180 accuracy bounds), so general
images may differ by an LSB or two between libjpeg and the pure decoder;
DC-only (per-8x8-block-uniform) images reconstruct EXACTLY flat under
any conformant IDCT, which is why the SQL oracles plant those.
"""

from __future__ import annotations

import importlib.util

import numpy as np
import pytest

from mashing_pumpkins_spark.operators.jpegcodec import (
    decode_jpeg,
    decode_jpeg_auto,
    encode_jpeg,
    encode_jpeg_progressive,
    jpeg_backend,
)

HAVE_PIL = importlib.util.find_spec("PIL") is not None


def _gray_gradient(h=40, w=56):
    y, x = np.mgrid[0:h, 0:w]
    return ((x * 3 + y * 5) % 256).astype(np.uint8)


def _rgb_noise(h=32, w=48):
    rng = np.random.default_rng(11)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8).astype(np.uint8)


def _block_uniform(h=48, w=32):
    rng = np.random.default_rng(3)
    blocks = rng.integers(0, 32, (h // 8, w // 8), dtype=np.int64) * 8 + 4
    return np.kron(blocks, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)


def test_backend_autodetect_ladder():
    """pillow iff PIL imports, else cext iff the self-compiled C kernel
    loads, else pure (round-7: _jpeg_cext slots between the wheel and
    the pure fallback)."""
    from mashing_pumpkins_spark.operators import _jpeg_cext

    if HAVE_PIL:
        expected = "pillow"
    elif _jpeg_cext.load() is not None:
        expected = "cext"
    else:
        expected = "pure"
    assert jpeg_backend() == expected


def test_backend_env_override(monkeypatch):
    monkeypatch.setenv("MP_SPARK_JPEG_BACKEND", "pure")
    assert jpeg_backend() == "pure"
    monkeypatch.setenv("MP_SPARK_JPEG_BACKEND", "cext")
    assert jpeg_backend() == "cext"
    monkeypatch.setenv("MP_SPARK_JPEG_BACKEND", "bogus")
    with pytest.raises(ValueError, match="unknown JPEG backend"):
        jpeg_backend()


def test_explicit_arg_beats_env(monkeypatch):
    monkeypatch.setenv("MP_SPARK_JPEG_BACKEND", "pillow")
    assert jpeg_backend("pure") == "pure"


def test_auto_pure_is_the_pure_decoder():
    payload = encode_jpeg(_gray_gradient(), quality=75)
    a = decode_jpeg_auto(payload, backend="pure")
    b = decode_jpeg(payload)
    assert np.array_equal(a, b)


def test_auto_respects_bomb_cap():
    payload = encode_jpeg(_gray_gradient(64, 64), quality=75)
    with pytest.raises(ValueError):
        decode_jpeg_auto(payload, max_pixels=100, backend="pure")


@pytest.mark.skipif(not HAVE_PIL, reason="Pillow wheel absent in this container")
class TestNativeCrossCheck:
    """Pixel-equality battery pure vs Pillow — runs wherever the wheel
    exists (the deploy target for the 100 TB escape hatch)."""

    CASES = [
        ("gray_base", lambda: encode_jpeg(_gray_gradient(), quality=75)),
        ("gray_q90", lambda: encode_jpeg(_gray_gradient(33, 41), quality=90)),
        ("rgb_444", lambda: encode_jpeg(_rgb_noise(), quality=75, subsampling="4:4:4")),
        ("rgb_420", lambda: encode_jpeg(_rgb_noise(30, 46), quality=75, subsampling="4:2:0")),
        (
            "gray_progressive",
            lambda: encode_jpeg_progressive(_gray_gradient(), quality=75),
        ),
    ]

    @pytest.mark.parametrize("name,make", CASES, ids=[c[0] for c in CASES])
    def test_general_images_within_idct_tolerance(self, name, make):
        payload = make()
        pure = decode_jpeg_auto(payload, backend="pure")
        native = decode_jpeg_auto(payload, backend="pillow")
        assert native.shape == pure.shape and native.dtype == pure.dtype
        diff = np.abs(pure.astype(np.int32) - native.astype(np.int32))
        # IEEE 1180-style bound: tiny per-pixel error, near-zero mean
        assert diff.max() <= 2, f"{name}: max LSB diff {diff.max()}"
        assert diff.mean() <= 0.1

    def test_dc_only_images_bitexact_across_backends(self):
        # per-8x8-block-uniform grayscale at q75 (luma DC quant = 8):
        # what the SQL oracle fixtures plant — must be identical
        payload = encode_jpeg(_block_uniform(), quality=75)
        pure = decode_jpeg_auto(payload, backend="pure")
        native = decode_jpeg_auto(payload, backend="pillow")
        assert np.array_equal(pure, native)
