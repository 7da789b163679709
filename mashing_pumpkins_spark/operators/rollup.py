"""Group-level sketch rollup: merge per-document sketches into one sketch
per group (domain, source, language...).

This is the reference's mergeable-aggregation story (O11/O12 union +
nvisited sum, O28 associative reduce — /root/reference/src/minhashsketch.py
:178-203, :330-384; parallel.py:42-53) as a Spark grouped aggregation:
partial merges happen per partition inside applyInPandas, the shuffle moves
one (group, partial) per partition — exactly the partial+final split the
reference's multiprocessing reduce performs, but planned by Spark.

Because the merge is the truncated union of distinct hash sets, an
UN-truncated rollup's sketch size equals the group's distinct-shingle count
— giving the SQL oracle for the whole merge path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..config import SketchConfig
from ..functions.sketch_np import merge_signatures
from ..hashkernels import i64_to_u64, u64_to_i64
from .signature import with_signature

ROLLUP_SCHEMA = StructType(
    [
        StructField("group", StringType()),
        StructField("sig", ArrayType(LongType(), containsNull=False)),
        StructField("nvisited", LongType()),
    ]
)


def _make_merge_group(cfg: SketchConfig):
    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = np.empty(0, dtype=np.uint64)
        nvisited = 0
        for sig, nv in zip(pdf["sig"], pdf["nvisited"]):
            chunk = i64_to_u64(np.asarray(sig, dtype=np.int64))
            acc = merge_signatures(acc, chunk, cfg.maxsize, cfg.minmax)
            nvisited += int(nv)
        return pd.DataFrame(
            {
                "group": [pdf["group"].iloc[0]],
                "sig": [u64_to_i64(acc).tolist()],
                "nvisited": [nvisited],
            }
        )

    return merge_group


def group_sketch_rollup(
    docs: DataFrame,
    cfg: SketchConfig,
    group_col: str,
    text_col: str = "text",
    partial_shards: int = 0,
) -> DataFrame:
    """docs -> one merged sketch per group (sig, summed nvisited).

    ``partial_shards`` > 0 enables the map-side-combine analog for skewed
    groups: documents first merge within (group, shard) — shard = a hash of
    the row spread over partial_shards buckets — then the per-shard partials
    (k values each, tiny) merge per group. A group with millions of docs
    becomes partial_shards parallel tasks + one k*partial_shards-row final
    merge, instead of one giant task; associativity of the merge (O11/O12)
    makes the result identical. 0 keeps the single-level plan (fine when
    groups are balanced)."""
    sigs = with_signature(
        docs.select(F.col(group_col).cast("string").alias("group"), text_col),
        cfg,
        text_col,
    ).select("group", "sig", "nvisited")
    merge_group = _make_merge_group(cfg)
    if partial_shards <= 0:
        return sigs.groupBy("group").applyInPandas(merge_group, ROLLUP_SCHEMA)

    # deterministic shard from row content (a non-deterministic id would
    # break exactly-once semantics under task retry + partial recompute)
    sharded = sigs.withColumn(
        "_shard",
        F.pmod(F.xxhash64("group", "sig", "nvisited"), F.lit(partial_shards)),
    )

    def merge_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        out = merge_group(pdf)
        out["_shard"] = pdf["_shard"].iloc[0]
        return out

    shard_schema = StructType(
        ROLLUP_SCHEMA.fields + [StructField("_shard", LongType())]
    )
    partials = sharded.groupBy("group", "_shard").applyInPandas(
        merge_shard, shard_schema
    )
    return (
        partials.drop("_shard")
        .groupBy("group")
        .applyInPandas(merge_group, ROLLUP_SCHEMA)
    )
