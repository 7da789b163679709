"""Group-level sketch rollup: merge per-document sketches into one sketch
per group (domain, source, language...).

This is the reference's mergeable-aggregation story (O11/O12 union +
nvisited sum, O28 associative reduce — /root/reference/src/minhashsketch.py
:178-203, :330-384; parallel.py:42-53) as a Spark grouped aggregation.

Physical form (round-3 rework, mirroring the sharding fix): per-doc
sketches come from the zero-copy mapInArrow kernel (sketch_table — round 2
used the pandas list path here), and the per-group merge is ONE JVM
aggregation — flatten(collect_list(sig)) -> distinct -> unsigned-order
truncate (truncate_sketch_array), nvisited summed alongside. No Python
runs after the sketch kernel; the shuffle moves (group, k-array) rows.

Because the merge is the truncated union of distinct hash sets, an
UN-truncated rollup's sketch size equals the group's distinct-shingle count
— giving the SQL oracle for the whole merge path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import SketchConfig
from ..functions.estimators import truncate_sketch_array
from .signature import sketch_table


def _merge_by(sigs: DataFrame, keys: list[str], cfg: SketchConfig) -> DataFrame:
    merged = sigs.groupBy(*keys).agg(
        F.flatten(F.collect_list("sig")).alias("_cat"),
        F.sum("nvisited").alias("nvisited"),
    )
    return merged.select(
        *keys,
        truncate_sketch_array(F.col("_cat"), cfg.maxsize, cfg.minmax).alias("sig"),
        F.col("nvisited").cast("long").alias("nvisited"),
    )


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
    src = docs.select(F.col(group_col).cast("string").alias("group"), text_col)
    sigs = sketch_table(src, cfg, url_col="group", text_col=text_col)
    if partial_shards <= 0:
        return _merge_by(sigs, ["group"], cfg)

    # deterministic shard from row content (a non-deterministic id would
    # break exactly-once semantics under task retry + partial recompute)
    sharded = sigs.withColumn(
        "_shard",
        F.pmod(F.xxhash64("group", "sig", "nvisited"), F.lit(partial_shards)),
    )
    partials = _merge_by(sharded, ["group", "_shard"], cfg).drop("_shard")
    return _merge_by(partials, ["group"], cfg)
