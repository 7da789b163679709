"""One-pass multi-sketch: N sketches per document from ONE scan of the text.

The reference's SketchList (/root/reference/src/parallel.py:56-122) builds a
tuple of heterogeneous sketches and feeds every added sequence to each of
them, so the (expensive) input pass happens once however many sketches are
maintained. The Spark analog: ONE pandas UDF whose Arrow batch is decoded
once and fanned out to each sketch kernel, emitting a single struct column —
the physical plan has one Python stage feeding all downstream consumers,
instead of one full text scan per sketch (at 100 TB the second scan is the
dominant cost, not the kernels).

Kernels fanned out per batch: MinHash signature (batch_signatures — one
vectorized hash pass), SimHash (simhash_batch — factorize + batch token
hash), and optionally the counted sketch. All three reuse the UTF-8 payload
decoded once per batch.

(The reference's SketchList.map_sequences generator-exhaustion defect —
SURVEY.md §7.3 — is naturally absent: each batch rebuilds nothing.)
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
from ..functions.simhash import simhash_batch
from ..functions.sketch_np import batch_signatures, counted_signature
from ..hashkernels import u64_to_i64


def multi_sketch_schema(include_counted: bool) -> StructType:
    fields = [
        StructField("sig", ArrayType(LongType(), containsNull=False)),
        StructField("nvisited", LongType()),
        StructField("simhash", LongType()),
    ]
    if include_counted:
        fields += [
            StructField("counted_hashes", ArrayType(LongType(), containsNull=False)),
            StructField("counts", ArrayType(LongType(), containsNull=False)),
        ]
    return StructType(fields)


def make_multi_sketch_udf(
    cfg: SketchConfig, simhash_seed: int = 0, include_counted: bool = False
):
    """pandas UDF: text -> struct<sig, nvisited, simhash[, counted...]> in
    one pass over each Arrow batch."""
    schema = multi_sketch_schema(include_counted)

    @F.pandas_udf(schema)
    def multi_udf(text_iter: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for texts in text_iter:
            filled = texts.fillna("")
            payload = [
                t.encode("utf-8") if isinstance(t, str) else (t or b"")
                for t in filled
            ]
            sigs, nvis = batch_signatures(payload, cfg)
            sims = simhash_batch(filled, simhash_seed)
            out = {"sig": sigs, "nvisited": nvis, "simhash": sims}
            if include_counted:
                hs, cs = [], []
                for p in payload:
                    h, c, _ = counted_signature(p, cfg)
                    hs.append(u64_to_i64(h).tolist())
                    cs.append(c.tolist())
                out["counted_hashes"] = hs
                out["counts"] = cs
            yield pd.DataFrame(out)

    return multi_udf


def multi_sketch_table(
    docs: DataFrame,
    cfg: SketchConfig,
    url_col: str = "url",
    text_col: str = "text",
    simhash_seed: int = 0,
    include_counted: bool = False,
) -> DataFrame:
    """(url, sig, nvisited, simhash[, counted_hashes, counts]) — every
    sketch family from one text scan."""
    udf = make_multi_sketch_udf(cfg, simhash_seed, include_counted)
    tmp = "_multi_sketch"
    out = docs.select(url_col, text_col).withColumn(tmp, udf(F.col(text_col)))
    cols = [url_col, f"{tmp}.sig", f"{tmp}.nvisited", f"{tmp}.simhash"]
    if include_counted:
        cols += [f"{tmp}.counted_hashes", f"{tmp}.counts"]
    return out.select(*cols)
