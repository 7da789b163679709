"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video decode libraries are NOT in this container, so the decode
step is STUBBED (deterministic fake or NotImplementedError) — but the Spark
plumbing is real and tested: schema (binary + struct metadata), Arrow batch
shape through mapInPandas, partition-friendly feature extraction.

The deterministic fake "features" are a 16-bin byte histogram (L1
normalized) + payload length — enough to exercise downstream similarity
joins on real bytes without pretending to decode JPEGs.
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


def decode_image(payload: bytes):
    """STUB — real decode requires an image library not present here.

    The Spark-side contract (binary in, ndarray out) is what downstream
    feature extraction assumes; swap in PIL/libjpeg at deploy time.
    """
    raise NotImplementedError(
        "image decode is stubbed in this environment; wire PIL/turbojpeg here"
    )


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
