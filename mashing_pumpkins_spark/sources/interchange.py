"""Sketch interchange: serialize signature tables to sourmash-style JSON.

The reference's README demo (reference README.md:53-56) positions its
sketches as sourmash-workflow-compatible (same MurmurHash3-x64-128 low64,
seed 42, canonical DNA k-mers). This module gives those sketches a wire
format so they can leave the cluster: one JSON object per record, following
the PUBLISHED sourmash signature schema (class / hash_function /
signatures[{ksize, seed, num, mins}]) — the fields consumers actually
match on. Byte-level md5sum compatibility with sourmash's own writer is NOT
claimed (its digest recipe is an implementation detail); the structural
fields round-trip exactly.

Values: `mins` are the UNSIGNED uint64 hash values in ascending order —
the stored signatures hold the same bit patterns in signed bigints, so the
export shifts negatives by 2^64 (JVM-side, decimal(20,0) arithmetic; no
Python in the sink path) and the import shifts back.

Scale shape: the export is `to_json` over a struct column written with the
native text sink — a pure JVM map stage, one output file per partition, no
driver collection. Import is the mirrored `from_json` scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import SketchConfig

_U64_SHIFT = "18446744073709551616"  # 2^64 as decimal literal

_IMPORT_SCHEMA = (
    "class string, hash_function string, version double, license string,"
    " name string,"
    " signatures array<struct<ksize:int, seed:int, num:int, molecule:string,"
    " mins:array<decimal(20,0)>>>"
)


def _hash_function_label(cfg: SketchConfig) -> str:
    # sourmash labels its murmur64 as "0.murmur64"; keep other kernels
    # honest with an explicit name instead of mislabeling them
    if cfg.hash_name.startswith("mmh3"):
        return "0.murmur64"
    return f"0.{cfg.hash_name}"


def export_signatures_json(
    sigs: DataFrame,
    path: str,
    cfg: SketchConfig,
    url_col: str = "url",
    sig_col: str = "sig",
) -> None:
    """Write (url, sig) as sourmash-style JSON lines under ``path``.

    Each line is one signature object; `mins` carry unsigned decimal
    values in ascending unsigned order (the stored order)."""
    mins_unsigned = F.transform(
        F.col(sig_col),
        lambda x: F.when(
            x < 0, x.cast("decimal(20,0)") + F.expr(_U64_SHIFT)
        ).otherwise(x.cast("decimal(20,0)")),
    )
    record = F.struct(
        F.lit("sourmash_signature").alias("class"),
        F.lit(_hash_function_label(cfg)).alias("hash_function"),
        F.lit(0.4).alias("version"),
        F.lit("CC0").alias("license"),
        F.col(url_col).cast("string").alias("name"),
        F.array(
            F.struct(
                F.lit(cfg.nsize).alias("ksize"),
                F.lit(cfg.seed).alias("seed"),
                F.lit(cfg.maxsize).alias("num"),
                F.lit(
                    "DNA" if cfg.canonical == "dna_rc" else "bytes"
                ).alias("molecule"),
                mins_unsigned.alias("mins"),
            )
        ).alias("signatures"),
    )
    sigs.select(F.to_json(record).alias("value")).write.mode("overwrite").text(path)


def import_signatures_json(spark: SparkSession, path: str) -> DataFrame:
    """Read signatures written by export_signatures_json (or any
    sourmash-style JSONL with the same structural fields) back into
    (name, ksize, seed, num, sig) — sig as the engine's signed-bigint
    bit patterns, ascending unsigned order preserved."""
    raw = spark.read.text(path)
    parsed = raw.select(
        F.from_json(F.col("value"), _IMPORT_SCHEMA).alias("r")
    ).select(
        F.col("r.name").alias("name"),
        F.element_at("r.signatures", 1).alias("s"),
    )
    sig_signed = F.transform(
        F.col("s.mins"),
        lambda x: F.when(
            x >= F.expr("9223372036854775808"),
            (x - F.expr(_U64_SHIFT)).cast("bigint"),
        ).otherwise(x.cast("bigint")),
    )
    return parsed.select(
        "name",
        F.col("s.ksize").alias("ksize"),
        F.col("s.seed").alias("seed"),
        F.col("s.num").alias("num"),
        sig_signed.alias("sig"),
    )
