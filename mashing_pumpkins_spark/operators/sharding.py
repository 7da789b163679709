"""Long-document sharding: sketch arbitrarily large documents as bounded
chunks, then merge — the Spark analog of the reference's chunked parallel
sketching (chunkpos_iter, /root/reference/src/sequence.py:6-49, exercised by
/root/reference/src/tests/test_minhashsketch.py:131-203).

Why: the signature UDF otherwise receives each document as ONE Arrow row —
a 500 MB outlier page lands whole in a single Python batch (memory spike,
one-core stall). Chunks overlap by nsize-1 bytes so every shingle window is
seen exactly once across chunks: the merged sketch is bit-identical to the
whole-document sketch and the summed nvisited equals the whole-document
window count (the no-duplicates/no-misses decomposition the reference
guarantees).

Plan shape: one mapInPandas splits docs into (url, chunk) rows (text is cut
on the UTF-8 BYTE axis — chunks are emitted as binary so multibyte
characters split across a boundary still hash byte-identically), an optional
round-robin repartition spreads a giant doc's chunks across executors, the
standard signature UDF sketches each chunk, and a groupBy(url) applyInPandas
runs the associative O11/O12 merge (same combiner as the group rollup).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
)

from ..config import SketchConfig

def _chunk_schema(docs: DataFrame, url_col: str) -> StructType:
    """(url, payload) — url keeps the caller's id type (string url, bigint
    doc_id, ...)."""
    return StructType(
        [
            StructField("url", docs.schema[url_col].dataType),
            StructField("payload", BinaryType()),
        ]
    )


def chunk_spans(nsize: int, lseq: int, w: int) -> list[tuple[int, int]]:
    """Chunk [start, end) byte spans — reference chunkpos_iter semantics:
    stride w-nsize+1, overlap nsize-1, trailing leftover kept only when it
    still holds at least one full window."""
    if nsize > w:
        raise ValueError("chunk width must be >= nsize")
    ew = w - nsize + 1
    nchunks = lseq // ew
    if lseq - nchunks * ew >= nsize:
        nchunks += 1
    return [(i * ew, min(i * ew + w, lseq)) for i in range(nchunks)]


def shard_documents(
    docs: DataFrame,
    cfg: SketchConfig,
    chunk_bytes: int,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """(url, text) -> (url, payload binary) chunk rows.

    Documents whose UTF-8 encoding fits in chunk_bytes pass through as one
    row; longer ones emit overlapping byte chunks. Short docs (< nsize
    bytes) emit one row too — the sketch UDF maps them to an empty sketch,
    preserving sketch_table's per-url row contract.
    """
    if chunk_bytes < cfg.nsize:
        raise ValueError("chunk_bytes must be >= nsize")
    nsize = cfg.nsize

    def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls: list = []
            payloads: list = []
            for url, text in zip(pdf[url_col], pdf[text_col]):
                data = (
                    text.encode("utf-8")
                    if isinstance(text, str)
                    else (text or b"")
                )
                if len(data) <= chunk_bytes:
                    urls.append(url)
                    payloads.append(data)
                    continue
                for beg, end in chunk_spans(nsize, len(data), chunk_bytes):
                    urls.append(url)
                    payloads.append(data[beg:end])
            yield pd.DataFrame({"url": urls, "payload": payloads})

    return docs.select(
        F.col(url_col).alias(url_col), F.col(text_col)
    ).mapInPandas(split, _chunk_schema(docs, url_col))


def sketch_table_sharded(
    pages: DataFrame,
    cfg: SketchConfig,
    chunk_bytes: int,
    url_col: str = "url",
    text_col: str = "text",
    spread: bool = True,
) -> DataFrame:
    """signatures(url, sig, nvisited), bit-identical to sketch_table but
    with per-task input bounded by chunk_bytes.

    ``spread=True`` round-robin-repartitions the chunk rows before the
    sketch UDF so one outlier document's chunks run on many cores — the
    extra shuffle moves only the chunk bytes once and is the entire point
    of sharding; disable it when documents are known near-uniform.

    Physical form (round-3 rework): chunks go through the SAME zero-copy
    mapInArrow kernel as sketch_table (round 2 routed them through the
    pandas list path + a per-group Python merge — measured 80x slower at
    identical k, on the operator built for the largest documents), and the
    per-url merge is ONE JVM aggregation: flatten(collect_list(sig)) →
    distinct → unsigned-order truncate (truncate_sketch_array), nvisited
    summed alongside. The shuffle moves only (url, k-array) partials;
    no Python runs after the sketch kernel.
    """
    from ..functions.estimators import truncate_sketch_array
    from .signature import sketch_table

    chunks = shard_documents(pages, cfg, chunk_bytes, url_col, text_col)
    if spread:
        chunks = chunks.repartition(
            pages.sparkSession.sparkContext.defaultParallelism * 2
        )
    sigs = sketch_table(chunks, cfg, url_col="url", text_col="payload")
    merged = sigs.groupBy("url").agg(
        F.flatten(F.collect_list("sig")).alias("_cat"),
        F.sum("nvisited").alias("nvisited"),
    )
    return merged.select(
        F.col("url").alias(url_col),
        truncate_sketch_array(F.col("_cat"), cfg.maxsize, cfg.minmax).alias("sig"),
        F.col("nvisited").cast("long").alias("nvisited"),
    )
