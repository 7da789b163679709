"""Structured Streaming: incremental per-key sketch maintenance.

The reference's merge operator is associative + commutative
(/root/reference/src/minhashsketch.py:178-203 and parallel.py reduce :42-53)
— exactly the mergeable-state contract Structured Streaming stateful
aggregation needs. This module keeps a bottom-k sketch per key updated as
text chunks stream in, via applyInPandasWithState:

    state = (sig uint64[<=k] as bigint list, nvisited)
    on batch: state = merge(state, sketch(chunks))     # O11/O12 semantics

nvisited accumulates across chunks (reference :384/:533). Watermark/late
data: sketch union is idempotent per distinct shingle hash and insensitive
to arrival order, so late chunks simply merge in — no window close needed.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..config import SketchConfig
from ..functions.sketch_np import batch_signatures, merge_signatures
from ..hashkernels import i64_to_u64, u64_to_i64

OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("sig", ArrayType(LongType(), containsNull=False)),
        StructField("nvisited", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("sig", ArrayType(LongType(), containsNull=False)),
        StructField("nvisited", LongType()),
    ]
)


def make_state_func(cfg: SketchConfig):
    def update(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            sig_i64, nvisited = state.get
            cur = i64_to_u64(np.array(sig_i64, dtype=np.int64))
        else:
            cur = np.empty(0, dtype=np.uint64)
            nvisited = 0
        for pdf in pdfs:
            texts = [
                t.encode("utf-8") if isinstance(t, str) else (t or b"")
                for t in pdf["text"].fillna("")
            ]
            sigs, nvis = batch_signatures(texts, cfg)
            for s, nv in zip(sigs, nvis):
                chunk = i64_to_u64(np.array(s, dtype=np.int64))
                cur = merge_signatures(cur, chunk, cfg.maxsize, cfg.minmax)
                nvisited += nv
        state.update((u64_to_i64(cur).tolist(), nvisited))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "sig": [u64_to_i64(cur).tolist()],
                "nvisited": [nvisited],
            }
        )

    return update


def streaming_sketch_aggregate(
    stream: DataFrame, cfg: SketchConfig, key_col: str = "key"
) -> DataFrame:
    """stream(key, text) -> continuously-updated (key, sig, nvisited)."""
    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            make_state_func(cfg),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
