"""Native netpbm decode + resize + the decode->featurize Spark operator."""

from __future__ import annotations

import numpy as np
import pytest

from mashing_pumpkins_spark.operators.multimodal import (
    decode_image,
    image_summary,
    resize_nearest,
)


def make_ppm(w: int, h: int, seed: int = 0, comment: bool = False) -> tuple[bytes, np.ndarray]:
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    header = b"P6\n" + (b"# synthetic test image\n" if comment else b"")
    header += f"{w} {h}\n255\n".encode()
    return header + img.tobytes(), img


def make_pgm16(w: int, h: int, seed: int = 0) -> tuple[bytes, np.ndarray]:
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 65536, (h, w), dtype=np.uint16)
    payload = f"P5\n{w} {h}\n65535\n".encode() + img.astype(">u2").tobytes()
    return payload, img


def test_decode_ppm_roundtrip_with_comment_header():
    payload, img = make_ppm(17, 9, seed=3, comment=True)
    out = decode_image(payload)
    assert out.shape == (9, 17, 3)
    assert np.array_equal(out, img)


def test_decode_pgm_16bit_big_endian():
    payload, img = make_pgm16(5, 4, seed=7)
    out = decode_image(payload)
    assert out.shape == (4, 5) and out.dtype == np.dtype(">u2")
    assert np.array_equal(out.astype(np.uint16), img)


def test_decode_unsupported_format_still_raises():
    # WebP needs a codec this container lacks; baseline JPEG now decodes
    # natively (jpegcodec.py) so a malformed JPEG is ValueError instead
    with pytest.raises(NotImplementedError):
        decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 ")
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0 truncated jpeg")
    with pytest.raises(ValueError):
        decode_image(b"")


def test_resize_nearest_shapes_and_identity():
    _, img = make_ppm(8, 6, seed=1)
    small = resize_nearest(img, 3, 4)
    assert small.shape == (3, 4, 3)
    assert np.array_equal(resize_nearest(img, 6, 8), img)  # same size = identity
    with pytest.raises(ValueError):
        resize_nearest(img, 0, 4)


def test_image_summary_decodes_and_null_rows_for_bad_payloads(spark):
    p1, img1 = make_ppm(10, 4, seed=5)
    p2, img2 = make_pgm16(3, 3, seed=6)
    rows = [("a", bytearray(p1)), ("b", bytearray(p2)), ("c", bytearray(b"PNG..."))]
    df = spark.createDataFrame(rows, "url string, payload binary")
    out = {r.url: r for r in image_summary(df).collect()}
    assert (out["a"].width, out["a"].height, out["a"].channels) == (10, 4, 3)
    assert out["a"].mean_intensity == round(float(img1.mean()), 6)
    assert (out["b"].width, out["b"].height, out["b"].channels) == (3, 3, 1)
    assert out["b"].mean_intensity == round(float(img2.mean()), 6)
    assert out["c"].width is None and out["c"].mean_intensity is None


def test_image_summary_thumbnail_path(spark):
    p1, img1 = make_ppm(16, 16, seed=9)
    df = spark.createDataFrame([("a", bytearray(p1))], "url string, payload binary")
    out = image_summary(df, thumb=4).collect()[0]
    thumb = resize_nearest(img1, 4, 4)
    assert (out.width, out.height) == (4, 4)
    assert out.mean_intensity == round(float(thumb.astype(np.float64).mean()), 6)


def make_png(
    img: np.ndarray,
    color: int,
    depth: int = 8,
    filters: list[int] | None = None,
    palette: np.ndarray | None = None,
    interlace: int = 0,
) -> bytes:
    """Minimal spec-following PNG encoder (test oracle): applies the given
    per-row filter types (cycling), so the decoder's five filter paths are
    each exercised against independently-filtered bytes."""
    import struct
    import zlib

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    h, w = img.shape[0], img.shape[1]
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    arr = img.reshape(h, w, channels)
    bpp = channels * (depth // 8)
    filters = filters or [0]

    def filter_rows(sub: np.ndarray) -> bytes:
        """Filter one (sub-)image's scanlines; prior resets per call (the
        per-pass reset Adam7 requires)."""
        sh = sub.shape[0]
        if depth == 16:
            rows = sub.astype(">u2").reshape(sh, -1).view(np.uint8)
        else:
            rows = sub.astype(np.uint8).reshape(sh, -1)
        body = bytearray()
        prior = np.zeros(rows.shape[1], dtype=np.int16)
        for y in range(sh):
            line = rows[y].astype(np.int16)
            f = filters[y % len(filters)]
            left = np.concatenate([np.zeros(bpp, np.int16), line[:-bpp]]) if bpp <= line.size else np.zeros_like(line)
            upleft = (
                np.concatenate([np.zeros(bpp, np.int16), prior[:-bpp]])
                if bpp <= line.size
                else np.zeros_like(line)
            )
            if f == 0:
                filt = line
            elif f == 1:
                filt = line - left
            elif f == 2:
                filt = line - prior
            elif f == 3:
                filt = line - ((left + prior) >> 1)
            else:  # Paeth
                p = left + prior - upleft
                pa, pb, pc = np.abs(p - left), np.abs(p - prior), np.abs(p - upleft)
                pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, upleft))
                filt = line - pred
            body += bytes([f]) + (filt & 0xFF).astype(np.uint8).tobytes()
            prior = line
        return bytes(body)

    out = bytearray()
    if interlace == 0:
        out += filter_rows(arr)
    else:  # Adam7: serialize the 7 passes, skipping empty ones
        for x0, y0, dx, dy in [
            (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
            (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
        ]:
            sub = arr[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                out += filter_rows(sub)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    body = b"".join(
        [chunk(b"IHDR", ihdr)]
        + ([chunk(b"PLTE", palette.astype(np.uint8).tobytes())] if palette is not None else [])
        + [chunk(b"IDAT", zlib.compress(bytes(out))), chunk(b"IEND", b"")]
    )
    return b"\x89PNG\r\n\x1a\n" + body


@pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_decode_png_gray8_all_filters(filters):
    from mashing_pumpkins_spark.operators.multimodal import decode_image

    rng = np.random.default_rng(sum(filters) + 1)
    img = rng.integers(0, 256, (11, 7), dtype=np.uint8)
    out = decode_image(make_png(img, color=0, filters=filters))
    assert out.shape == (11, 7)
    assert np.array_equal(out, img), filters


@pytest.mark.parametrize(
    "color,channels", [(2, 3), (4, 2), (6, 4)]
)
def test_decode_png_multichannel_mixed_filters(color, channels):
    from mashing_pumpkins_spark.operators.multimodal import decode_image

    rng = np.random.default_rng(color)
    img = rng.integers(0, 256, (9, 13, channels), dtype=np.uint8)
    out = decode_image(make_png(img, color=color, filters=[4, 3, 1, 2, 0]))
    assert out.shape == (9, 13, channels)
    assert np.array_equal(out, img)


def test_decode_png_16bit_gray_and_rgb():
    from mashing_pumpkins_spark.operators.multimodal import decode_image

    rng = np.random.default_rng(99)
    gray = rng.integers(0, 65536, (6, 5), dtype=np.uint16)
    out = decode_image(make_png(gray, color=0, depth=16, filters=[0, 2, 4]))
    assert out.dtype == np.dtype(">u2") and out.shape == (6, 5)
    assert np.array_equal(out.astype(np.uint16), gray)
    rgb = rng.integers(0, 65536, (4, 3, 3), dtype=np.uint16)
    out3 = decode_image(make_png(rgb, color=2, depth=16, filters=[1, 3]))
    assert np.array_equal(out3.astype(np.uint16), rgb)


def test_decode_png_palette():
    from mashing_pumpkins_spark.operators.multimodal import decode_image

    rng = np.random.default_rng(7)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (8, 8), dtype=np.uint8)
    out = decode_image(make_png(idx, color=3, filters=[1, 4], palette=pal))
    assert out.shape == (8, 8, 3)
    assert np.array_equal(out, pal[idx])


def test_decode_png_error_contract():
    from mashing_pumpkins_spark.operators.multimodal import decode_image, decode_png

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (4, 4), dtype=np.uint8)
    # Adam7 decodes natively since round 5; an invalid interlace METHOD
    # is the malformed-IHDR ValueError
    with pytest.raises(ValueError):
        decode_image(make_png(img, color=0, interlace=2))
    good = make_png(img, color=0)
    with pytest.raises(ValueError):  # truncated chunk
        decode_png(good[:30])
    with pytest.raises(ValueError):  # corrupt DEFLATE stream
        decode_png(good[:-30] + b"\x00" * 30)
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\n")  # no chunks at all


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_encode_png_roundtrips_through_decoder(ftype):
    """The library encoder must roundtrip bit-exactly through decode_png
    for every filter type and channel count (the test-local make_png stays
    the INDEPENDENT spec oracle for the decoder itself)."""
    from mashing_pumpkins_spark.operators.multimodal import decode_image, encode_png

    rng = np.random.default_rng(40 + ftype)
    gray = rng.integers(0, 256, (7, 11), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_png(gray, ftype)), gray)
    rgba = rng.integers(0, 256, (5, 6, 4), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_png(rgba, ftype)), rgba)
    assert np.array_equal(decode_image(encode_png(gray, ftype, level=1)), gray)
    with pytest.raises(ValueError):
        encode_png(gray.astype(np.uint16), ftype)
    with pytest.raises(ValueError):
        encode_png(gray, 7)


def test_image_summary_decodes_png_payloads(spark):
    """The Spark operator path handles PNG through the same decode seam,
    same null-row contract for the still-unsupported formats."""
    from mashing_pumpkins_spark.operators.multimodal import image_summary

    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (6, 10, 3), dtype=np.uint8)
    rows = [
        ("png", bytearray(make_png(img, color=2, filters=[4, 2]))),
        ("jpeg", bytearray(b"\xff\xd8\xff\xe0 jpeg bytes")),
    ]
    df = spark.createDataFrame(rows, "url string, payload binary")
    out = {r.url: r for r in image_summary(df).collect()}
    assert (out["png"].width, out["png"].height, out["png"].channels) == (10, 6, 3)
    assert out["png"].mean_intensity == round(float(img.mean()), 6)
    assert out["jpeg"].width is None


def make_wav(n: int, channels: int = 1, rate: int = 8000, seed: int = 0,
             bits: int = 16) -> tuple[bytes, np.ndarray]:
    rng = np.random.default_rng(seed)
    if bits == 16:
        raw = rng.integers(-32768, 32768, (n, channels), dtype=np.int16)
        data = raw.astype("<i2").tobytes()
        samples = raw.astype(np.float64) / 32768.0
    else:
        raw = rng.integers(0, 256, (n, channels), dtype=np.uint8)
        data = raw.tobytes()
        samples = (raw.astype(np.float64) - 128.0) / 128.0
    block = channels * (bits // 8)
    fmt = (
        (1).to_bytes(2, "little") + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little") + (rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little") + bits.to_bytes(2, "little")
    )
    payload = (
        b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(data).to_bytes(4, "little") + data
    )
    return payload, samples


def test_decode_wav_16bit_stereo_roundtrip():
    from mashing_pumpkins_spark.operators.multimodal import decode_audio

    payload, samples = make_wav(100, channels=2, rate=44100, seed=4)
    out, rate = decode_audio(payload)
    assert rate == 44100 and out.shape == (100, 2)
    assert np.allclose(out, samples)


def test_decode_wav_8bit_and_unsupported():
    from mashing_pumpkins_spark.operators.multimodal import decode_audio

    payload, samples = make_wav(50, bits=8, seed=2)
    out, _ = decode_audio(payload)
    assert np.allclose(out, samples)
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x04mp3 bytes here...")


def test_decode_wav_zero_channels_raises_value_error_not_zerodiv():
    """A malformed fmt chunk (channels=0) must raise ValueError — which the
    operator-level null-row handler catches — not ZeroDivisionError, which
    would escape it and fail the whole Spark task (round-4 ADVICE)."""
    from mashing_pumpkins_spark.operators.multimodal import decode_audio

    payload, _ = make_wav(20, channels=1, seed=1)
    # fmt chunk starts at byte 20 (RIFF+size+WAVE+'fmt '+len); channels is
    # its bytes [2:4], sample_rate its bytes [4:8]
    broken_ch = bytearray(payload)
    broken_ch[22:24] = (0).to_bytes(2, "little")
    with pytest.raises(ValueError):
        decode_audio(bytes(broken_ch))
    broken_rate = bytearray(payload)
    broken_rate[24:28] = (0).to_bytes(4, "little")
    with pytest.raises(ValueError):
        decode_audio(bytes(broken_rate))


def test_audio_summary_null_row_for_zero_channel_wav(spark):
    from mashing_pumpkins_spark.operators.multimodal import audio_summary

    payload, _ = make_wav(20, channels=1, seed=1)
    broken = bytearray(payload)
    broken[22:24] = (0).to_bytes(2, "little")
    df = spark.createDataFrame([("z", broken)], "url string, payload binary")
    out = audio_summary(df).collect()[0]
    assert out.url == "z" and out.sample_rate is None and out.rms is None


def test_audio_summary_reports_rms_and_null_rows(spark):
    from mashing_pumpkins_spark.operators.multimodal import audio_summary

    p1, s1 = make_wav(200, channels=2, rate=16000, seed=8)
    rows = [("a", bytearray(p1)), ("b", bytearray(b"OggS..."))]
    df = spark.createDataFrame(rows, "url string, payload binary")
    out = {r.url: r for r in audio_summary(df).collect()}
    assert (out["a"].sample_rate, out["a"].channels, out["a"].n_samples) == (16000, 2, 200)
    assert out["a"].rms == round(float(np.sqrt((s1 ** 2).mean())), 6)
    assert out["b"].sample_rate is None and out["b"].rms is None


def test_iter_frames_concatenated_netpbm():
    from mashing_pumpkins_spark.operators.multimodal import iter_frames

    frames = [make_ppm(4, 3, seed=i, comment=(i == 1)) for i in range(3)]
    payload = b"".join(p for p, _ in frames)
    out = list(iter_frames(payload))
    assert len(out) == 3
    for got, (_, want) in zip(out, frames):
        assert np.array_equal(got, want)


def test_frame_sample_every_k_and_bad_payloads(spark):
    from mashing_pumpkins_spark.operators.multimodal import frame_sample
    import pytest as _pytest

    frames = [make_ppm(4, 4, seed=10 + i) for i in range(5)]
    payload = b"".join(p for p, _ in frames)
    rows = [("v", bytearray(payload)), ("bad", bytearray(b"mp4 junk"))]
    df = spark.createDataFrame(rows, "url string, payload binary")
    out = frame_sample(df, every_k=2).collect()
    assert sorted(r.frame_idx for r in out) == [0, 2, 4]
    assert all(r.url == "v" and (r.width, r.height) == (4, 4) for r in out)
    for r in out:
        want = frames[r.frame_idx][1].astype(np.float64).mean()
        assert r.mean_intensity == round(float(want), 6)
    with _pytest.raises(ValueError):
        frame_sample(df, every_k=0)


def test_frame_sample_drops_whole_payload_on_mid_payload_corruption(spark):
    """A payload whose later frames are corrupt must emit NO rows — leading
    frames decoded before the failure are rolled back (round-4 ADVICE: the
    old code leaked them, contradicting the docstring)."""
    from mashing_pumpkins_spark.operators.multimodal import frame_sample

    good = [make_ppm(4, 4, seed=20 + i)[0] for i in range(2)]
    corrupt = b"".join(good) + b"P6\n4 4\n255\n" + b"\x00" * 5  # truncated frame
    clean = b"".join(make_ppm(4, 4, seed=30 + i)[0] for i in range(2))
    df = spark.createDataFrame(
        [("partial", bytearray(corrupt)), ("ok", bytearray(clean))],
        "url string, payload binary",
    )
    out = frame_sample(df, every_k=1).collect()
    assert sorted((r.url, r.frame_idx) for r in out) == [("ok", 0), ("ok", 1)]


def _wav(fmt_code, bits, channels, rate, data):
    import struct as _struct

    fmt = _struct.pack(
        "<HHIIHH", fmt_code, channels, rate,
        rate * channels * bits // 8, channels * bits // 8, bits,
    )
    body = b"WAVE" + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
    body += b"data" + _struct.pack("<I", len(data)) + data
    return b"RIFF" + _struct.pack("<I", len(body)) + body


@pytest.mark.parametrize(
    "shape,color,channels,depth",
    [
        ((13, 11), 0, 1, 8),   # gray, both odd dims (exercises empty-ish passes)
        ((9, 16, 3), 2, 3, 8),
        ((7, 5), 0, 1, 16),
        ((4, 3, 4), 6, 4, 8),  # smaller than one 8x8 Adam7 tile
        ((1, 1), 0, 1, 8),     # single pixel: only pass 1 is nonempty
    ],
)
def test_decode_png_adam7_interlaced(shape, color, channels, depth):
    from mashing_pumpkins_spark.operators.multimodal import decode_image

    rng = np.random.default_rng(sum(shape))
    hi = 65536 if depth == 16 else 256
    dt = np.uint16 if depth == 16 else np.uint8
    img = rng.integers(0, hi, shape).astype(dt)
    payload = make_png(img, color=color, depth=depth, filters=[0, 1, 2, 3, 4], interlace=1)
    out = decode_image(payload)
    assert np.array_equal(np.asarray(out).astype(dt).reshape(shape), img)


def test_decode_png_adam7_matches_noninterlaced():
    from mashing_pumpkins_spark.operators.multimodal import decode_image

    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (20, 17, 3), dtype=np.uint8)
    seq = decode_image(make_png(img, color=2, filters=[4]))
    i7 = decode_image(make_png(img, color=2, filters=[4], interlace=1))
    assert np.array_equal(seq, i7)


def test_decode_wav_float32_and_float64():
    import struct as _struct

    from mashing_pumpkins_spark.operators.multimodal import decode_audio

    vals = [0.5, -0.25, 0.0, 0.125]
    for bits, pack in ((32, "<4f"), (64, "<4d")):
        payload = _wav(3, bits, 2, 48000, _struct.pack(pack, *vals))
        samples, rate = decode_audio(payload)
        assert rate == 48000 and samples.shape == (2, 2)
        assert np.allclose(samples.reshape(-1), vals)


def test_decode_wav_24_and_32_bit_int():
    import struct as _struct

    from mashing_pumpkins_spark.operators.multimodal import decode_audio

    # 24-bit: values +-2^23-scaled; pack manually little-endian
    def p24(v):
        return int(v).to_bytes(3, "little", signed=True)

    data24 = p24(1 << 22) + p24(-(1 << 22)) + p24(0) + p24((1 << 23) - 1)
    samples, rate = decode_audio(_wav(1, 24, 1, 8000, data24))
    assert rate == 8000
    assert np.allclose(
        samples.reshape(-1), [0.5, -0.5, 0.0, (2**23 - 1) / 2**23]
    )
    data32 = _struct.pack("<4i", 1 << 30, -(1 << 30), 0, (1 << 31) - 1)
    samples32, _ = decode_audio(_wav(1, 32, 1, 8000, data32))
    assert np.allclose(
        samples32.reshape(-1), [0.5, -0.5, 0.0, (2**31 - 1) / 2**31]
    )


def test_decode_wav_unsupported_format_still_raises():
    import pytest as _pytest

    from mashing_pumpkins_spark.operators.multimodal import decode_audio

    with _pytest.raises(NotImplementedError):
        decode_audio(_wav(85, 16, 1, 8000, b"\x00\x00"))  # MP3-in-WAV
