"""Baseline JPEG codec tests (operators/jpegcodec.py).

Independence strategy mirrors the PNG suite: roundtrips pin encoder and
decoder against each other, and a HAND-CRAFTED single-block fixture —
built bit-by-bit in this file straight from the T.81 spec tables, never
touching encode_jpeg — pins the decoder against the spec itself.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from mashing_pumpkins_spark.operators.jpegcodec import (
    AC_LUMA_BITS,
    AC_LUMA_VALS,
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
    quality_tables,
)


def test_quality75_luma_dc_step_is_8():
    """quality 75 scales Annex K luma [0][0]=16 by 0.5 -> 8: with that DC
    step every uniform 8x8 block roundtrips EXACTLY (DC = 8*(v-128) is a
    multiple of 8), which the driver query's SQL oracle relies on."""
    luma, _ = quality_tables(75)
    assert luma[0, 0] == 8


@pytest.mark.parametrize("v", [0, 1, 31, 127, 128, 129, 200, 254, 255])
def test_uniform_gray_roundtrip_exact(v):
    img = np.full((16, 24), v, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=75))
    assert out.shape == (16, 24) and out.dtype == np.uint8
    assert np.all(out == v)


def test_per_block_uniform_gray_roundtrip_exact():
    """Distinct value per 8x8 block: exercises DC prediction chains and
    multi-MCU Huffman decode, still bit-exact at quality 75."""
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 256, size=(5, 7))
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=75))
    assert np.array_equal(out, img)


def test_gradient_gray_close_roundtrip():
    x = np.linspace(0, 255, 64)
    img = np.clip(np.rint(0.5 * x[None, :] + 0.5 * x[:, None]), 0, 255).astype(
        np.uint8
    )
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 6


def test_nonmultiple_of_8_dims_crop():
    img = np.full((13, 19), 77, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=75))
    assert out.shape == (13, 19) and np.all(out == 77)


def test_rgb_444_uniform_close():
    img = np.zeros((16, 16, 3), np.uint8)
    img[...] = (200, 100, 50)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert out.shape == (16, 16, 3)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


def test_rgb_gray_content_exact_at_q75():
    """R=G=B content: Y carries the value, Cb=Cr=128 exactly, so the
    color path roundtrips bit-exact at quality 75 (the driver query's
    color form)."""
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 256, size=(3, 4))
    gray = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1).astype(np.uint8)
    img = np.stack([gray] * 3, axis=-1)
    for subsampling in ("4:4:4", "4:2:0"):
        out = decode_jpeg(encode_jpeg(img, quality=75, subsampling=subsampling))
        assert np.array_equal(out, img), subsampling


def test_rgb_420_odd_dims_smooth():
    rng = np.random.default_rng(11)
    img = ((rng.integers(0, 8, size=(37, 43, 3)) * 32) + 16).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=85, subsampling="4:2:0"))
    assert out.shape == (37, 43, 3)


def test_restart_markers_roundtrip_exact():
    rng = np.random.default_rng(5)
    vals = rng.integers(0, 256, size=(6, 6))
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1).astype(np.uint8)
    for ri in (1, 5, 7):
        out = decode_jpeg(encode_jpeg(img, quality=75, restart_interval=ri))
        assert np.array_equal(out, img), ri


def test_bomb_cap_checked_before_entropy_decode():
    payload = encode_jpeg(np.zeros((64, 64), np.uint8))
    with pytest.raises(ValueError, match="max_pixels"):
        decode_jpeg(payload, max_pixels=1000)


def test_error_contract():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG....")  # not a JPEG
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xd9")  # SOI+EOI, no frame
    good = bytearray(encode_jpeg(np.full((8, 8), 9, np.uint8)))
    with pytest.raises(ValueError):
        decode_jpeg(bytes(good[: len(good) // 2]))  # truncated
    # arithmetic coding (SOF9) must raise NotImplementedError, not ValueError
    sof0 = bytes(good).find(b"\xff\xc0")
    arith = bytes(good[:sof0]) + b"\xff\xc9" + bytes(good[sof0 + 2 :])
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(arith)
    # a baseline scan relabeled SOF2 is a MALFORMED progressive file
    # (sequential Ss=0,Se=63 is illegal for a progressive DC scan)
    prog = bytes(good[:sof0]) + b"\xff\xc2" + bytes(good[sof0 + 2 :])
    with pytest.raises(ValueError, match="Se=0"):
        decode_jpeg(prog)
    # non-interleaved multi-scan (SOS covering fewer components than the
    # frame) is NotImplementedError too, decided before entropy decode
    color = bytearray(encode_jpeg(np.zeros((8, 8, 3), np.uint8), quality=75))
    sos = bytes(color).find(b"\xff\xda")
    single = (
        bytes(color[:sos])
        + b"\xff\xda\x00\x08\x01\x01\x00\x00\x3f\x00"
        + bytes(color[sos + 14 :])  # original SOS (Ns=3) is 14 bytes
    )
    with pytest.raises(NotImplementedError, match="multi-scan"):
        decode_jpeg(single)


# ---------------------------------------------------------------------------
# Independent spec fixture: a single 8x8 grayscale block hand-encoded with
# pencil-and-paper Huffman bits from T.81 Annex K tables. encode_jpeg is
# NOT used anywhere below.
# ---------------------------------------------------------------------------


def _canonical_codes(bits, vals):
    table = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[i]] = (code, length)
            i += 1
            code += 1
        code <<= 1
    return table


class _Bits:
    def __init__(self):
        self.s = ""

    def put(self, value, nbits):
        if nbits:
            self.s += format(value & ((1 << nbits) - 1), f"0{nbits}b")

    def bytes(self):
        s = self.s + "1" * ((8 - len(self.s) % 8) % 8)
        raw = bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))
        return raw.replace(b"\xff", b"\xff\x00")


def _handmade_single_block_jpeg(dc_quantized: int, qdc: int) -> bytes:
    """8x8 grayscale JPEG whose only nonzero coefficient is the quantized
    DC = `dc_quantized`, with an all-`qdc` quantization table. Decoded
    image must be uniform clamp(round_half_even(dc_quantized*qdc/8)+128).
    """
    dc_codes = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    b = _Bits()
    size = int(abs(dc_quantized)).bit_length()
    code, length = dc_codes[size]
    b.put(code, length)
    amp = dc_quantized if dc_quantized >= 0 else dc_quantized + (1 << size) - 1
    b.put(amp, size)
    code, length = ac_codes[0x00]  # EOB
    b.put(code, length)
    scan = b.bytes()

    def seg(marker, payload):
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    qt = bytes([0x00]) + bytes([qdc] * 64)
    out = b"\xff\xd8"
    out += seg(0xDB, qt)
    out += seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += scan
    out += b"\xff\xd9"
    return out


@pytest.mark.parametrize(
    "dcq,qdc", [(0, 16), (5, 8), (-5, 8), (100, 8), (-128, 8), (63, 3)]
)
def test_handmade_fixture_decodes_to_spec_value(dcq, qdc):
    """DC-only block: IDCT output is uniform DC*Q/8; decoded pixel must be
    clamp(rint(DC*Q/8 + 128)). Fixture is built without encode_jpeg."""
    payload = _handmade_single_block_jpeg(dcq, qdc)
    out = decode_jpeg(payload)
    expected = int(np.clip(np.rint(dcq * qdc / 8.0 + 128.0), 0, 255))
    assert out.shape == (8, 8)
    assert np.all(out == expected), (out[0, 0], expected)


def test_sixteen_bit_dqt_accepted():
    """Pq=1 (16-bit) quantization tables parse; build the same handmade
    fixture with a 16-bit table."""
    dc_codes = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    b = _Bits()
    dcq = 10
    size = int(abs(dcq)).bit_length()
    code, length = dc_codes[size]
    b.put(code, length)
    b.put(dcq, size)
    code, length = ac_codes[0x00]
    b.put(code, length)

    def seg(marker, payload):
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    qt16 = bytes([0x10]) + struct.pack(">64H", *([8] * 64))
    out = b"\xff\xd8"
    out += seg(0xDB, qt16)
    out += seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += b.bytes()
    out += b"\xff\xd9"
    img = decode_jpeg(out)
    assert np.all(img == 10 * 8 // 8 + 128)


def test_zigzag_is_the_spec_order():
    """First/last few entries of the T.81 zig-zag sequence, from the
    figure in the spec (independent of the generator comprehension)."""
    assert list(ZIGZAG[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert list(ZIGZAG[-4:]) == [47, 55, 62, 63]


def test_decode_image_dispatches_jpeg():
    from mashing_pumpkins_spark.operators.multimodal import decode_image

    img = np.full((8, 8), 42, np.uint8)
    out = decode_image(encode_jpeg(img, quality=75))
    assert np.array_equal(out, img)


def test_image_summary_handles_jpeg_payloads(spark):
    from mashing_pumpkins_spark.operators.multimodal import image_summary

    good = encode_jpeg(np.full((16, 16), 50, np.uint8), quality=75)
    rows = [("j", bytearray(good)), ("bad", bytearray(b"\xff\xd8\x00\x00"))]
    df = spark.createDataFrame(rows, "url string, payload binary")
    out = {r["url"]: r for r in image_summary(df).collect()}
    assert out["j"]["height"] == 16 and out["j"]["width"] == 16
    assert abs(out["j"]["mean_intensity"] - 50.0) < 1e-9
    assert out["bad"]["height"] is None


# ---------------------------------------------------------------------------
# Progressive (SOF2) — Annex G spectral selection + successive approximation
# ---------------------------------------------------------------------------


def _prog_cases():
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 256, size=(4, 5))
    uniform = np.repeat(np.repeat(vals, 8, 0), 8, 1).astype(np.uint8)
    noisy = rng.integers(0, 256, size=(40, 56)).astype(np.uint8)
    x = np.linspace(0, 255, 64)
    grad = np.clip(np.rint(0.5 * x[None, :] + 0.5 * x[:, None]), 0, 255).astype(
        np.uint8
    )
    rgb = rng.integers(0, 256, size=(37, 43, 3)).astype(np.uint8)
    return uniform, noisy, grad, rgb


@pytest.mark.parametrize(
    "case,quality,sub",
    [
        ("uniform", 75, "4:4:4"),
        ("noisy", 80, "4:4:4"),
        ("noisy", 10, "4:4:4"),  # huge quantizers -> long EOB runs
        ("grad", 90, "4:4:4"),
        ("rgb", 85, "4:2:0"),
        ("rgb", 70, "4:4:4"),
    ],
)
def test_progressive_decodes_identical_to_baseline(case, quality, sub):
    """The progressive scan script re-encodes the SAME quantized
    coefficients, so full progressive decode must be pixel-identical to
    the baseline decode — any drift means a bug in one of the four Annex G
    scan algorithms (DC/AC x first/refinement) or in EOB-run handling."""
    from mashing_pumpkins_spark.operators.jpegcodec import encode_jpeg_progressive

    uniform, noisy, grad, rgb = _prog_cases()
    img = {"uniform": uniform, "noisy": noisy, "grad": grad, "rgb": rgb}[case]
    if img.ndim == 2:
        sub = "4:4:4"
    base = decode_jpeg(encode_jpeg(img, quality=quality, subsampling=sub))
    prog = decode_jpeg(
        encode_jpeg_progressive(img, quality=quality, subsampling=sub)
    )
    assert np.array_equal(prog, base)


def test_progressive_uniform_blocks_still_exact_at_q75():
    """quality-75 DC-exactness survives the progressive path (DC first at
    Al=1 + refinement bit reassemble the full DC)."""
    from mashing_pumpkins_spark.operators.jpegcodec import encode_jpeg_progressive

    uniform, *_ = _prog_cases()
    out = decode_jpeg(encode_jpeg_progressive(uniform, quality=75))
    assert np.array_equal(out, uniform)


def test_progressive_eob_runs_span_many_blocks():
    """A mostly-flat image with one busy corner forces EOBn runs > 1
    (whole-band skips across consecutive blocks) in both first and
    refinement AC scans."""
    from mashing_pumpkins_spark.operators.jpegcodec import encode_jpeg_progressive

    rng = np.random.default_rng(3)
    img = np.full((64, 64), 100, dtype=np.uint8)
    img[:8, :8] = rng.integers(0, 256, size=(8, 8))
    base = decode_jpeg(encode_jpeg(img, quality=85))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=85))
    assert np.array_equal(prog, base)


def test_progressive_stream_is_sof2_with_many_scans():
    from mashing_pumpkins_spark.operators.jpegcodec import encode_jpeg_progressive

    uniform, *_ = _prog_cases()
    payload = encode_jpeg_progressive(uniform, quality=75)
    assert b"\xff\xc2" in payload and b"\xff\xc0" not in payload
    assert payload.count(b"\xff\xda") == 6  # 2 DC + 4 AC scans (grayscale)


def test_decode_image_dispatches_progressive():
    from mashing_pumpkins_spark.operators.jpegcodec import encode_jpeg_progressive
    from mashing_pumpkins_spark.operators.multimodal import decode_image

    img = np.full((8, 8), 42, np.uint8)
    assert np.array_equal(decode_image(encode_jpeg_progressive(img)), img)
