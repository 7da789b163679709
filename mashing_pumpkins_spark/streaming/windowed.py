"""Structured Streaming: event-time windowed corpus statistics with a
watermark — the late-data story for continuously ingested crawls.

Pure JVM plan (window + hash aggregate, no Python): per event-time window,
document count and byte volume. The watermark bounds state (windows close
once event time passes window_end + delay) and defines late-data policy:
rows older than the watermark are dropped, so a replayed/straggler crawl
record cannot silently distort an already-emitted window. Append output
mode emits each window exactly once, on close — the right contract for
writing immutable per-window partitions to the lake.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_windowed_doc_stats(
    stream: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    window_duration: str = "1 hour",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """stream(ts, text, ...) -> per-window (window_start, window_end,
    n_docs, n_bytes), append-mode with bounded state."""
    return (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(ts_col, window_duration).alias("w"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.octet_length(F.encode(F.col(text_col), "utf-8"))).alias(
                "n_bytes"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_docs",
            "n_bytes",
        )
    )
