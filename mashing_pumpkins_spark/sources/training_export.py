"""Training-shard export — the terminal stage of the curation pipeline.

After ingest -> curation funnel -> dedup -> selection, a training run
consumes the kept corpus as fixed-count JSONL shards in a deterministic
global order (the "seeded shuffle" every data-loading stack expects).
This module provides that stage Spark-first:

- ``shard_assignment``: pure Column algebra — shard_id and a global
  order key both derived from md5 over (seed, url), so the same
  (corpus, seed, n_shards) produces byte-identical shards on any
  cluster size (the reproducibility analog of the pipeline's
  deterministic hash sampling, operators/corpus.py).
- ``shard_manifest``: per-shard lineage/metrics (docs, tokens, chars,
  order-key range) as ONE map-side-combinable groupBy — the record a
  resumable training job checks before trusting a shard.
- ``write_training_shards``: the distributed writer. ONE shuffle
  (hash-repartition on shard_id) + a partition-local sort, then a
  streaming mapInPandas that writes gzip JSONL files with the same
  task-commit protocol as the WARC/WET writers (sources/warc.py:
  attempt-unique ._tmp name, atomic rename) — speculative or retried
  attempts never interleave and a killed job never leaves a partial
  file that looks complete.
- ``read_training_shards``: schema-pinned ``spark.read.json`` over the
  shard files (Spark decompresses .gz natively, one file per task).

No reference analog (the reference is a sketching library; this is
part of the LLM training-data-pipeline surface alongside
operators/corpus.py / operators/dsir.py).

Scale notes (100 TB):
- the only shuffle moves each row once to its shard partition; shard
  population is md5-uniform so there is no skew to salt. n_shards is
  the write parallelism — at 100 TB pick shards of ~1-4 GB compressed
  (tens of thousands of shards), one task each.
- the writer streams Arrow batches straight into the gzip stream; a
  partition is never materialized, so executor memory stays
  batch-bounded regardless of shard size.
- gzip members are written with mtime=0 and sorted-key JSON, so shard
  bytes are deterministic — reruns and speculative twins produce
  identical files, making the atomic-rename race benign.
"""

from __future__ import annotations

import gzip
import json
import os
import pathlib
from typing import Iterable, Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.textstats import whitespace_token_count

__all__ = [
    "choose_n_shards",
    "shard_assignment",
    "shard_manifest",
    "write_training_shards",
    "export_training_shards",
    "read_training_shards",
]


def _md5_mod(prefix: str, col, n: int):
    """md5-prefix bucket: ('0x' || substr(md5(prefix || col), 1, 8)) % n —
    the exact idiom the DuckDB oracles replay (32-bit value, always
    non-negative, identical in Spark, DuckDB and hashlib)."""
    key = F.md5(F.concat(F.lit(prefix), col.cast("string")))
    return (F.conv(F.substring(key, 1, 8), 16, 10).cast("long") % n).cast("int")


def choose_n_shards(
    total_bytes: int,
    target_shard_bytes: int = 1 << 30,
    min_shards: int = 1,
) -> int:
    """Shard count for a corpus of ``total_bytes`` uncompressed JSON at a
    target shard size (default 1 GB — the 1-4 GB sweet spot where one
    shard is one write task and one training-loader unit). Pure
    arithmetic, same spirit as the adaptive banding default (config.py):
    compute the knob from the workload instead of hard-coding it."""
    if total_bytes < 0:
        raise ValueError(f"total_bytes must be >= 0, got {total_bytes}")
    if target_shard_bytes <= 0:
        raise ValueError(
            f"target_shard_bytes must be positive, got {target_shard_bytes}"
        )
    return max(min_shards, -(-total_bytes // target_shard_bytes))


def shard_assignment(
    df: DataFrame,
    n_shards: int,
    seed: int = 0,
    url_col: str = "url",
) -> DataFrame:
    """Add deterministic ``shard_id`` (md5 bucket) and ``sort_key`` (md5
    hex — the seeded global shuffle order) columns. Pure Column algebra:
    no shuffle, no UDF; the assignment depends only on (seed, n_shards,
    url), never on partitioning or cluster size."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    url = F.col(url_col)
    return df.withColumn(
        "shard_id", _md5_mod(f"shard:{seed}:", url, n_shards)
    ).withColumn(
        "sort_key", F.md5(F.concat(F.lit(f"order:{seed}:"), url.cast("string")))
    )


def shard_manifest(
    assigned: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Per-shard lineage: docs, whitespace tokens, chars, and the order-key
    range. One groupBy over the already-assigned frame (map-side
    combinable; n_shards rows out)."""
    text = F.col(text_col)
    return (
        assigned.groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(whitespace_token_count(text).cast("long")).alias("n_tokens"),
            F.sum(F.length(text).cast("long")).alias("n_chars"),
            F.min("sort_key").alias("first_key"),
            F.max("sort_key").alias("last_key"),
        )
        .orderBy("shard_id")
    )


_REPORT_SCHEMA = StructType(
    [
        StructField("shard_id", LongType()),
        StructField("path", StringType()),
        StructField("n_docs", LongType()),
        StructField("n_bytes", LongType()),
        StructField("first_key", StringType()),
        StructField("last_key", StringType()),
    ]
)


def _json_scalar(v):
    """numpy/pandas scalar -> plain-JSON value (None stays None)."""
    if v is None or v is pd.NA or (isinstance(v, float) and v != v):
        return None
    if hasattr(v, "item"):
        return v.item()
    return v


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int,
    seed: int = 0,
    url_col: str = "url",
    text_col: str = "text",
    meta_cols: Sequence[str] = (),
) -> DataFrame:
    """Distributed JSONL.gz shard writer. Routes every row to its
    deterministic shard (ONE hash shuffle on shard_id), sorts each
    partition by (shard_id, sort_key) so rows stream out in the seeded
    global order, and writes one ``shard-NNNNN.jsonl.gz`` per shard with
    the task-commit protocol (attempt-unique ._tmp + atomic rename; see
    sources/warc.py _distributed_container_export). Returns the per-shard
    report (shard_id, path, n_docs, n_bytes, first_key, last_key) — the
    manifest a resumable consumer verifies.

    Each line is canonical JSON (sorted keys, no spaces, raw UTF-8):
    {"text": ..., "url": ..., <meta_cols>}. A null text raises — a
    silently-written "null" document would poison the training mix
    (filter first, as the funnel's kept table already guarantees).
    """
    assigned = shard_assignment(df, n_shards, seed=seed, url_col=url_col)
    cols = [
        F.col("shard_id"),
        F.col("sort_key"),
        F.col(url_col).cast("string").alias("_url"),
        F.col(text_col).cast("string").alias("_text"),
    ] + [F.col(c) for c in meta_cols]
    routed = assigned.select(*cols).repartition(
        n_shards, "shard_id"
    ).sortWithinPartitions("shard_id", "sort_key")

    pathlib.Path(out_dir).mkdir(parents=True, exist_ok=True)
    meta_list = list(meta_cols)
    # an integral Spark column with nulls arrives in pandas as float64;
    # serialize it back as JSON ints so the schema-pinned reader round-trips
    int_metas = {
        c for c in meta_list
        if routed.schema[c].dataType.simpleString()
        in ("tinyint", "smallint", "int", "bigint")
    }

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        tc = TaskContext.get()
        attempt = f"attempt-{tc.attemptNumber()}-{tc.taskAttemptId()}"
        reports: list[tuple] = []
        state = {"fh": None, "raw": None}
        cur = {"id": None, "tmp": None, "path": None,
               "n": 0, "bytes": 0, "first": None, "last": None}

        def _close_commit() -> None:
            if state["fh"] is None:
                return
            state["fh"].close()
            state["raw"].close()
            os.replace(cur["tmp"], cur["path"])
            reports.append(
                (cur["id"], cur["path"], cur["n"], cur["bytes"],
                 cur["first"], cur["last"])
            )
            state["fh"] = None

        def _abort() -> None:
            if state["fh"] is not None:
                try:
                    state["fh"].close()
                    state["raw"].close()
                except OSError:
                    pass
                try:
                    os.unlink(cur["tmp"])
                except OSError:
                    pass
                state["fh"] = None

        try:
            for pdf in batches:
                sids = pdf["shard_id"].tolist()
                keys = pdf["sort_key"].tolist()
                urls = pdf["_url"].tolist()
                texts = pdf["_text"].tolist()
                metas = {c: pdf[c].tolist() for c in meta_list}
                for i in range(len(pdf)):
                    sid = int(sids[i])
                    if sid != cur["id"] or state["fh"] is None:
                        _close_commit()
                        cur.update(
                            id=sid, n=0, bytes=0, first=keys[i], last=None,
                            path=os.path.join(
                                out_dir, f"shard-{sid:05d}.jsonl.gz"
                            ),
                        )
                        cur["tmp"] = f"{cur['path']}._tmp-{attempt}"
                        state["raw"] = open(cur["tmp"], "wb")
                        state["fh"] = gzip.GzipFile(
                            filename="", mode="wb", fileobj=state["raw"],
                            compresslevel=6, mtime=0,
                        )
                    text = texts[i]
                    if text is None or text != text:
                        _abort()
                        raise ValueError(
                            f"training shard needs non-null text (url={urls[i]!r})"
                        )
                    rec = {"url": urls[i], "text": text}
                    for c in meta_list:
                        v = _json_scalar(metas[c][i])
                        if v is not None and c in int_metas:
                            v = int(v)
                        rec[c] = v
                    line = (
                        json.dumps(
                            rec, sort_keys=True, ensure_ascii=False,
                            separators=(",", ":"),
                        ).encode("utf-8")
                        + b"\n"
                    )
                    state["fh"].write(line)
                    cur["n"] += 1
                    cur["bytes"] += len(line)
                    cur["last"] = keys[i]
            _close_commit()
        except BaseException:
            _abort()
            raise
        yield pd.DataFrame(
            reports,
            columns=["shard_id", "path", "n_docs", "n_bytes",
                     "first_key", "last_key"],
        ).astype({"shard_id": "int64", "n_docs": "int64", "n_bytes": "int64"})

    return routed.mapInPandas(_write, _REPORT_SCHEMA)


def export_training_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int,
    seed: int = 0,
    url_col: str = "url",
    text_col: str = "text",
    meta_cols: Sequence[str] = (),
) -> list[dict]:
    """Write shards AND the manifest.json beside them. Collects only the
    per-shard report (n_shards rows — bounded and tiny by construction)
    and writes the manifest through the Hadoop FileSystem API so it lands
    next to the shards under any URI scheme (the run_curation.py
    manifest convention)."""
    report = write_training_shards(
        df, out_dir, n_shards, seed=seed, url_col=url_col,
        text_col=text_col, meta_cols=meta_cols,
    )
    rows = sorted(
        (r.asDict() for r in report.collect()), key=lambda r: r["shard_id"]
    )
    manifest = {
        "n_shards": n_shards,
        "seed": seed,
        "format": "jsonl.gz",
        "n_docs": sum(r["n_docs"] for r in rows),
        "n_bytes": sum(r["n_bytes"] for r in rows),
        "shards": rows,
    }
    _write_text_via_hadoop(
        df.sparkSession,
        os.path.join(out_dir, "manifest.json"),
        json.dumps(manifest, indent=1),
    )
    return rows


def _write_text_via_hadoop(spark: SparkSession, uri: str, text: str) -> None:
    """Single small file through the Hadoop FS of the target URI (works
    for file:, hdfs:, s3a: alike — a driver-local pathlib write would
    mangle non-local URIs)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(uri)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.create(hpath, True)
    try:
        stream.write(bytearray(text.encode("utf-8")))
    finally:
        stream.close()


def read_training_shards(
    spark: SparkSession,
    out_dir: str,
    meta_fields: Iterable[StructField] = (),
) -> DataFrame:
    """Schema-pinned read of the shard files (one .gz file per task;
    Spark's json source decompresses natively). The explicit schema keeps
    the scan single-pass — no sampling inference job over 100 TB."""
    schema = StructType(
        [StructField("url", StringType()), StructField("text", StringType())]
        + list(meta_fields)
    )
    return spark.read.schema(schema).json(
        os.path.join(out_dir, "shard-*.jsonl.gz")
    )
