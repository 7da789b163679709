"""Structured Streaming: curation-on-ingest admission gate.

A production corpus is not curated once — pages arrive continuously, and
the cheap gates should run AT INGEST so the committed corpus only ever
holds admissible documents. This module applies two batch-identical
round-4 gates to a stream of (url, text):

  - the Gopher/C4 structural rule battery (operators.corpus.gopher_rules
    via gopher_rule_columns — pure Column algebra, so it runs unchanged
    and stateless on a streaming DataFrame), and
  - Bloom-filter benchmark decontamination (the decontaminate_bloom
    bitarray, built ONCE from the static benchmark at plan time and
    broadcast; probed by the shared bloom_contamination_flags helper
    inside one mapInPandas pass — identical flags to the batch operator
    by construction).

Output: an append stream of (url, quality_ok, contaminated, admitted)
with admitted = quality_ok AND NOT contaminated; filter on it or fan the
rejects to a quarantine sink. Everything is stateless per micro-batch —
no watermark, no stream-stream join, no aggregation state — so the gate
adds zero state-store footprint in front of the (stateful) streaming
near-dup stage (near_dup_stream.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.corpus import (
    bench_gram_bloom,
    bloom_contamination_flags,
    gopher_rule_columns,
)


def streaming_admission(
    stream: DataFrame,
    benchmark: DataFrame,
    n: int = 4,
    m_bits: int = 1 << 22,
    k_hashes: int = 4,
    url_col: str = "url",
    text_col: str = "text",
    html_input: bool = False,
    html_col: str = "html",
) -> DataFrame:
    """stream(url, text) -> append stream of (url, quality_ok,
    contaminated, admitted). `benchmark` must be a STATIC DataFrame (the
    held-out eval set); its gram bloom is built on the driver at plan
    time, exactly as decontaminate_bloom does.

    ``html_input=True`` accepts a raw-crawl stream of (url, html) and
    derives text with the native HTML extractor first (Arrow-batched,
    stateless — streaming-safe); undecodable payloads yield null text,
    which the Gopher battery then rejects, so broken pages are
    quarantined rather than admitted."""
    if html_input:
        from ..operators.extraction import extracted_text_col

        stream = stream.select(
            F.col(url_col), extracted_text_col(F.col(html_col)).alias(text_col)
        )
    bc = stream.sparkSession.sparkContext.broadcast(
        bench_gram_bloom(benchmark, n, m_bits, k_hashes, text_col)
    )

    quality = F.lit(True)
    for _name, col in gopher_rule_columns(F.col(text_col)):
        quality = quality & col
    # null text (e.g. an undecodable html payload upstream) is never
    # admissible — without the coalesce the null would propagate through
    # the rule conjunction and the admitted flag
    quality = F.coalesce(quality, F.lit(False))
    base = stream.select(
        F.col(url_col).alias("url"),
        F.col(text_col).alias("text"),
        quality.alias("quality_ok"),
    )

    def _gate(batches):
        import pandas as pd

        arr = bc.value
        for pdf in batches:
            flags = bloom_contamination_flags(
                pdf["text"].fillna(""), arr, n, m_bits, k_hashes
            )
            out = pd.DataFrame(
                {
                    "url": pdf["url"],
                    "quality_ok": pdf["quality_ok"].astype(bool),
                    "contaminated": flags.astype(bool),
                }
            )
            out["admitted"] = out["quality_ok"] & ~out["contaminated"]
            yield out

    return base.mapInPandas(
        _gate,
        "url string, quality_ok boolean, contaminated boolean, admitted boolean",
    )
