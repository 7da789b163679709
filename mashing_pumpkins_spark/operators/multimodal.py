"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The netpbm formats (PGM ``P5`` / PPM ``P6``) decode NATIVELY in pure
numpy (decode_image), with nearest-neighbor resize (resize_nearest) and a
decode -> resize -> featurize mapInPandas operator (image_summary).
Compressed codecs (JPEG/PNG/audio/video) are NOT in this container, so
those formats raise NotImplementedError from the same decode entry point
— wire PIL/turbojpeg there at deploy time; the Spark plumbing (schema,
Arrow batch shape, bounded batches, null-safe error rows) is identical.

The byte-histogram "features" path (extract_binary_features) works on any
binary payload without decoding — a 16-bin high-nibble histogram (L1
normalized) + payload length, enough to drive downstream similarity joins
on real bytes; its f0 bin is SQL-oracle-checked by `multimodal_features`.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("payload_bytes", LongType()),
        StructField("features", ArrayType(DoubleType(), containsNull=False)),
        StructField("modality", StringType()),
    ]
)


def decode_image(payload: bytes) -> np.ndarray:
    """Decode a binary netpbm image (PGM ``P5`` -> HxW, PPM ``P6`` ->
    HxWx3; 8-bit or 16-bit big-endian) in pure numpy — a REAL decoder for
    the formats this container can handle without external libraries.
    Compressed formats (JPEG/PNG/...) still raise NotImplementedError:
    their codecs are not present here; wire PIL/turbojpeg at deploy time.
    The Spark-side contract either way is binary in, ndarray out."""
    if payload is None or len(payload) < 2:
        raise ValueError("empty payload")
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise NotImplementedError(
            f"decode for format {magic!r} is stubbed in this environment; "
            "only netpbm P5/P6 decode natively — wire PIL/turbojpeg here"
        )
    # header: magic, then 3 ASCII ints (width height maxval) separated by
    # whitespace, '#' comments running to end-of-line, then ONE whitespace
    # byte before the raster
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    width, height, maxval = fields[0], fields[1], fields[2]
    channels = 3 if magic == b"P6" else 1
    dtype = np.dtype(">u2") if maxval > 255 else np.dtype(np.uint8)
    n = width * height * channels
    raster = np.frombuffer(payload, dtype=dtype, count=n, offset=pos)
    img = raster.reshape(height, width, channels)
    return img[:, :, 0] if channels == 1 else img


def _netpbm_extent(payload: bytes, pos: int) -> int:
    """Length of the netpbm image starting at `pos` (header + raster)."""
    start, fields = pos + 2, []
    p = start
    while len(fields) < 3:
        while payload[p : p + 1].isspace():
            p += 1
        if payload[p : p + 1] == b"#":
            while p < len(payload) and payload[p] != 0x0A:
                p += 1
            continue
        s = p
        while p < len(payload) and not payload[p : p + 1].isspace():
            p += 1
        fields.append(int(payload[s:p]))
    p += 1
    width, height, maxval = fields
    channels = 3 if payload[pos : pos + 2] == b"P6" else 1
    itemsize = 2 if maxval > 255 else 1
    return (p - pos) + width * height * channels * itemsize


def iter_frames(payload: bytes):
    """Yield each frame of a concatenated-netpbm 'video' payload (the
    deterministic stand-in for a real container format; real MP4/MKV
    demuxers are absent here and would plug in at this seam) as a decoded
    ndarray."""
    pos = 0
    while pos + 2 <= len(payload):
        if payload[pos : pos + 2] not in (b"P5", b"P6"):
            raise NotImplementedError(
                f"frame {payload[pos:pos + 2]!r} at offset {pos} is not netpbm; "
                "wire a real demuxer here"
            )
        extent = _netpbm_extent(payload, pos)
        yield decode_image(payload[pos : pos + extent])
        pos += extent


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize via index arithmetic (no interpolation
    libraries): deterministic, O(out pixels), any channel count."""
    if out_h < 1 or out_w < 1:
        raise ValueError(f"target size must be >= 1, got {(out_h, out_w)}")
    h, w = img.shape[0], img.shape[1]
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return img[rows][:, cols]


def _byte_histogram(payload: bytes) -> list[float]:
    if not payload:
        return [0.0] * 16
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr >> 4, minlength=16).astype(np.float64)
    return (hist / hist.sum()).tolist()


def extract_binary_features(
    df: DataFrame,
    url_col: str = "url",
    payload_col: str = "html",
    modality: str = "html",
) -> DataFrame:
    """mapInPandas over the binary column: per-batch vectorized feature
    extraction. Narrow input projection keeps the scan pruned; batches are
    bounded by spark.sql.execution.arrow.maxRecordsPerBatch so executor
    memory is payload-size * batch, not partition size."""
    narrow = df.select(url_col, payload_col)

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "url": pdf[url_col],
                    "payload_bytes": [
                        len(p) if p is not None else 0 for p in payloads
                    ],
                    "features": [
                        _byte_histogram(p if p is not None else b"")
                        for p in payloads
                    ],
                    "modality": modality,
                }
            )

    return narrow.mapInPandas(_extract, FEATURE_SCHEMA)


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE PCM payload (8/16-bit integer PCM) in pure
    numpy: returns (samples as float64 in [-1, 1), shape n x channels,
    sample_rate). Compressed audio (MP3/AAC/...) raises
    NotImplementedError — those codecs are not in this container."""
    if payload is None or len(payload) < 12:
        raise ValueError("empty payload")
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            "only RIFF/WAVE PCM decodes natively; wire ffmpeg/soundfile here"
        )
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        chunk_id = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if chunk_id == b"fmt ":
            fmt = body
        elif chunk_id == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits not in (8, 16):
        raise NotImplementedError(f"PCM format {audio_format}/{bits}-bit unsupported")
    if channels < 1 or sample_rate < 1:
        # malformed fmt chunk: dividing by channels=0 would escape the
        # null-row contract as ZeroDivisionError and fail the Spark task
        raise ValueError(f"malformed fmt chunk: channels={channels} rate={sample_rate}")
    if bits == 16:
        raw = np.frombuffer(data, dtype="<i2", count=len(data) // 2)
        samples = raw.astype(np.float64) / 32768.0
    else:  # 8-bit WAV is unsigned
        raw = np.frombuffer(data, dtype=np.uint8)
        samples = (raw.astype(np.float64) - 128.0) / 128.0
    n = (len(samples) // channels) * channels
    return samples[:n].reshape(-1, channels), sample_rate


AUDIO_SUMMARY_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("sample_rate", LongType()),
        StructField("channels", LongType()),
        StructField("n_samples", LongType()),
        StructField("rms", DoubleType()),
    ]
)


def audio_summary(
    df: DataFrame, url_col: str = "url", payload_col: str = "payload"
) -> DataFrame:
    """Decode WAV payloads per Arrow batch and report (sample_rate,
    channels, frames, RMS amplitude); undecodable payloads yield null
    rows — same plumbing contract as image_summary."""
    narrow = df.select(url_col, payload_col)

    def _summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, payload in zip(pdf[url_col], pdf[payload_col]):
                try:
                    samples, rate = decode_audio(payload)
                except (NotImplementedError, ValueError):
                    rows.append((url, None, None, None, None))
                    continue
                rows.append(
                    (
                        url,
                        int(rate),
                        int(samples.shape[1]),
                        int(samples.shape[0]),
                        float(round(float(np.sqrt(np.mean(samples**2))), 6))
                        if samples.size
                        else 0.0,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["url", "sample_rate", "channels", "n_samples", "rms"]
            )

    return narrow.mapInPandas(_summarize, AUDIO_SUMMARY_SCHEMA)


FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("frame_idx", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("mean_intensity", DoubleType()),
    ]
)


def frame_sample(
    df: DataFrame,
    every_k: int = 1,
    url_col: str = "url",
    payload_col: str = "payload",
) -> DataFrame:
    """Sample every k-th frame of concatenated-netpbm video payloads and
    emit per-frame stats (one output row per SAMPLED frame) — the
    frame-sampling shape of a video curation pipeline: bounded Arrow
    batches, payload decoded once, undecodable payloads dropped with no
    batch failure."""
    if every_k < 1:
        raise ValueError(f"every_k must be >= 1, got {every_k}")
    narrow = df.select(url_col, payload_col)

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, payload in zip(pdf[url_col], pdf[payload_col]):
                payload_rows = []
                try:
                    for idx, frame in enumerate(iter_frames(payload)):
                        if idx % every_k:
                            continue
                        payload_rows.append(
                            (
                                url,
                                idx,
                                int(frame.shape[1]),
                                int(frame.shape[0]),
                                float(round(frame.astype(np.float64).mean(), 6)),
                            )
                        )
                except (NotImplementedError, ValueError):
                    # drop the WHOLE payload: frames decoded before a
                    # mid-payload failure must not leak partial rows
                    continue
                rows.extend(payload_rows)
            yield pd.DataFrame(
                rows,
                columns=["url", "frame_idx", "width", "height", "mean_intensity"],
            )

    return narrow.mapInPandas(_sample, FRAME_SAMPLE_SCHEMA)


IMAGE_SUMMARY_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("channels", LongType()),
        StructField("mean_intensity", DoubleType()),
    ]
)


def image_summary(
    df: DataFrame,
    url_col: str = "url",
    payload_col: str = "payload",
    thumb: int | None = None,
) -> DataFrame:
    """Decode netpbm payloads (decode_image) per Arrow batch and report
    (width, height, channels, mean intensity); with `thumb` set, stats
    come from a nearest-neighbor thumbnail instead (the decode -> resize
    -> featurize shape of a real image pipeline). Undecodable payloads
    yield null dimensions rather than failing the batch."""
    narrow = df.select(url_col, payload_col)

    def _summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, payload in zip(pdf[url_col], pdf[payload_col]):
                try:
                    img = decode_image(payload)
                except (NotImplementedError, ValueError):
                    rows.append((url, None, None, None, None))
                    continue
                if thumb is not None:
                    img = resize_nearest(img, thumb, thumb)
                channels = 1 if img.ndim == 2 else img.shape[2]
                rows.append(
                    (
                        url,
                        int(img.shape[1]),
                        int(img.shape[0]),
                        int(channels),
                        float(round(img.astype(np.float64).mean(), 6)),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["url", "width", "height", "channels", "mean_intensity"]
            )

    return narrow.mapInPandas(_summarize, IMAGE_SUMMARY_SCHEMA)
