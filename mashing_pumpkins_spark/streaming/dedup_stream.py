"""Streaming exact dedup: admit only the FIRST occurrence of each exact
content across the stream's lifetime.

The batch pipeline collapses exact duplicates up front
(operators/exact.py); a continuously-ingesting crawl needs the same cut
on the stream, where "have I seen this content" is long-lived state. The
stream is keyed by the engine-wide content key — the same (len, xxhash64,
murmur3_32) struct the batch collapse and curation funnel use, rendered
to one string so "same content" means one thing everywhere — and a
per-key `applyInPandasWithState` keeps a single seen/representative
record:

- first arrival of a key in a micro-batch: emitted with
  `is_first = true` and the representative url (the arrival-order first;
  NOTE intra-micro-batch arrival order among same-key rows follows
  shuffle partition order, which is not a total source order — WHICH
  exact duplicate becomes the rep can vary across runs, while the
  admitted-once guarantee and the dup count never do; the batch stage
  elects min(url) instead when rep identity must be stable);
- every later arrival (same micro-batch or any later one): emitted with
  `is_first = false` plus the representative url it duplicates —
  downstream either drops it or logs the edge, mirroring the batch
  stage's (rep, exact_edges) split.

State per key is one url string + a count — bytes per distinct document,
the minimum any exact-dedup stream can hold. The state store shards by
the content-key hash, so hot content (the same page fetched from a
million mirrors) lands on ONE key with a counter, not a million rows.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..operators.exact import content_key

OUTPUT_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("is_first", LongType()),
        StructField("rep_url", StringType()),
        StructField("dup_seq", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("rep_url", StringType()),
        StructField("n_seen", LongType()),
    ]
)


def _update(
    key: Tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        rep, n_seen = state.get
    else:
        rep, n_seen = None, 0
    out_url, out_first, out_rep, out_seq = [], [], [], []
    for pdf in pdfs:
        for url in pdf["url"]:
            n_seen += 1
            if rep is None:
                rep = url
                out_first.append(1)
            else:
                out_first.append(0)
            out_url.append(url)
            out_rep.append(rep)
            out_seq.append(n_seen)
    state.update((rep, n_seen))
    yield pd.DataFrame(
        {
            "url": out_url,
            "is_first": out_first,
            "rep_url": out_rep,
            "dup_seq": out_seq,
        }
    )


def streaming_exact_dedup(
    stream: DataFrame, url_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """stream(url, text) -> (url, is_first, rep_url, dup_seq): admission
    flags against all content seen so far. Filter `is_first = 1` for the
    deduplicated stream; the rest are the streaming analog of the batch
    stage's exact_edges."""
    keyed = stream.select(
        F.col(url_col).alias("url"),
        content_key(text_col).alias("_ck"),
    ).select(
        "url",
        F.concat_ws(":", F.col("_ck.len"), F.col("_ck.xx"), F.col("_ck.mm")).alias(
            "ck"
        ),
    )
    return keyed.groupBy("ck").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
