"""Signature operator: pages/docs DataFrame -> per-document MinHash sketch.

The reference's hot path (`SetSketch.add`,
/root/reference/src/minhashsketch.py:214-247: chunk -> batch C hash -> heap)
becomes ONE vectorized pandas UDF: each Arrow batch's texts are concatenated
and hashed in a single numpy pass, then per-document bottom-k is taken by
unique+truncate (same set, no heap needed — the heap is an artifact of
single-pass streaming execution).

Plan shape: narrow projection into the UDF (url, text only) so Parquet
column pruning survives; no shuffle — the sketch is per-row.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
)

from ..config import SketchConfig
from ..functions.sketch_np import batch_signatures

SIGNATURE_FIELDS = [
    StructField("sig", ArrayType(LongType(), containsNull=False), nullable=False),
    StructField("nvisited", LongType(), nullable=False),
]


def make_signature_udf(cfg: SketchConfig):
    """Scalar pandas UDF: text (string) -> struct<sig: array<bigint>, nvisited: bigint>.

    Signed bigints hold the uint64 bit pattern; arrays are ascending in
    *unsigned* order (the order the reference's sorted bottom-k defines).
    """

    schema = StructType(SIGNATURE_FIELDS)

    @F.pandas_udf(schema)
    def signature_udf(text_iter: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for texts in text_iter:
            payload = [
                t.encode("utf-8") if isinstance(t, str) else (t or b"")
                for t in texts.fillna("")
            ]
            sigs, nvis = batch_signatures(payload, cfg)
            yield pd.DataFrame({"sig": sigs, "nvisited": nvis})

    return signature_udf


def make_counted_signature_udf(cfg: SketchConfig):
    """Counted-sketch UDF: text -> struct<hashes, counts, nvisited>.

    Counts are TRUE per-retained-hash multiplicities — the reference
    CountTrait's documented/tested intent, not its insert-only counting
    code path (see counted_signature in functions/sketch_np.py)."""
    from ..functions.sketch_np import counted_signature
    from ..hashkernels import u64_to_i64

    schema = StructType(
        [
            StructField("hashes", ArrayType(LongType(), containsNull=False)),
            StructField("counts", ArrayType(LongType(), containsNull=False)),
            StructField("nvisited", LongType()),
        ]
    )

    @F.pandas_udf(schema)
    def counted_udf(text_iter: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for texts in text_iter:
            hs, cs, nv = [], [], []
            for t in texts.fillna(""):
                payload = t.encode("utf-8") if isinstance(t, str) else (t or b"")
                h, c, n = counted_signature(payload, cfg)
                hs.append(u64_to_i64(h).tolist())
                cs.append(c.tolist())
                nv.append(n)
            yield pd.DataFrame({"hashes": hs, "counts": cs, "nvisited": nv})

    return counted_udf


def with_signature(
    df: DataFrame,
    cfg: SketchConfig,
    text_col: str = "text",
    out_prefix: str = "",
) -> DataFrame:
    """Append `sig` (array<bigint>) and `nvisited` (bigint) columns."""
    udf = make_signature_udf(cfg)
    tmp = f"_sk_{out_prefix or 'sig'}"
    struct_col = udf(F.col(text_col))
    return (
        df.withColumn(tmp, struct_col)
        .withColumn(f"{out_prefix}sig", F.col(f"{tmp}.sig"))
        .withColumn(f"{out_prefix}nvisited", F.col(f"{tmp}.nvisited"))
        .drop(tmp)
    )


def sketch_table(
    pages: DataFrame,
    cfg: SketchConfig,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """signatures(url, sig, nvisited) — the persisted sketch stage.

    Narrow select BEFORE the UDF so the Parquet scan reads only two columns
    (check `.explain`: ReadSchema must not include html/lang/warc_ts).
    """
    return with_signature(pages.select(url_col, text_col), cfg, text_col).drop(
        text_col
    )
