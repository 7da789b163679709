"""FASTA / FASTQ sources — the reference library's own input formats.

The reference's demo workflow reads (possibly gzipped) FASTA/FASTQ and
sketches each record (/root/reference/src tests use short byte sequences;
the README benchmarks FASTQ at ~9.4 MB/s). These readers make the same
inputs first-class Spark tables so that workflow ports wholesale:

    read_fasta(spark, path) -> (seq_id, description, sequence)
    read_fastq(spark, path) -> (seq_id, sequence, quality)

FASTA is parsed FULLY DISTRIBUTED: `spark.read.text` with lineSep='>'
splits the file into one row per record ('>' is illegal inside FASTA
sequence data, so the split is exact), and header/sequence extraction is
pure JVM Column work (split + concat) — no Python in the parse. Plain-text
FASTA therefore scales with input splits like any text scan; .gz files are
decompressed by Hadoop but are single-split per file (standard Spark
behavior — document at ingestion, or convert to parquet once).

FASTQ cannot be delimiter-split safely ('@' legally appears inside quality
strings), so records are parsed per FILE via the binaryFile source +
mapInPandas (gzip handled in-process). One task per file: fine for the
many-medium-files layout FASTQ ships in; for huge single files convert to
parquet once with this same reader.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

FASTQ_SCHEMA = StructType(
    [
        StructField("seq_id", StringType()),
        StructField("sequence", StringType()),
        StructField("quality", StringType()),
    ]
)


def read_fasta(spark: SparkSession, path: str) -> DataFrame:
    """(seq_id, description, sequence) per FASTA record, JVM-parsed.

    Records split on '\\n>' — '>' only starts a record at line start; a
    literal '>' may legally appear INSIDE a description line (NCBI-style
    multi-header '>gi|..|ref>..'), and splitting on bare '>' would cut that
    record mid-description. The file-leading '>' (not preceded by a
    newline) yields one empty-prefix row that the non-empty filter drops.

    DOCUMENTED EDGE: a header that itself begins with '>' (file contains
    '\\n>>hdr' — nonstandard FASTA) loses that extra '>' from its seq_id:
    the normalizing strip below cannot distinguish "file-first record"
    (which retains its delimiter '>') from a genuine '>>' header without a
    per-file row-order shuffle. '>>' headers are outside the FASTA spec;
    accepting the strip keeps the parse one JVM projection with no window.
    """
    raw = spark.read.option("lineSep", "\n>").text(path)
    rec = raw.select(
        F.regexp_replace(
            # the first record keeps its leading '>'; later records lost
            # theirs to the delimiter — normalize by stripping one if present
            F.regexp_replace("value", "^>", ""),
            "\r",
            "",
        ).alias("v")
    ).where(F.length(F.trim(F.col("v"))) > 0)
    header = F.substring_index("v", "\n", 1)
    body = F.expr("substring(v, length(substring_index(v, '\\n', 1)) + 2)")
    return rec.select(
        F.substring_index(F.trim(header), " ", 1).alias("seq_id"),
        F.trim(header).alias("description"),
        F.upper(F.regexp_replace(body, "\n", "")).alias("sequence"),
    ).where(F.length("sequence") > 0)


def read_fastq(spark: SparkSession, path: str) -> DataFrame:
    """(seq_id, sequence, quality) per FASTQ record, one parse task per
    file (gzip-aware)."""
    files = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, seqs, quals = [], [], []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if fpath.endswith(".gz"):
                    data = gzip.decompress(data)
                lines = io.TextIOWrapper(
                    io.BytesIO(data), encoding="utf-8", errors="strict"
                ).read().splitlines()
                # 4-line records: @id / seq / + / qual
                for i in range(0, len(lines) - 3, 4):
                    head = lines[i]
                    if not head.startswith("@"):
                        raise ValueError(
                            f"malformed FASTQ at line {i} of {fpath}: {head[:50]!r}"
                        )
                    ids.append(head[1:].split(" ", 1)[0])
                    seqs.append(lines[i + 1].upper())
                    quals.append(lines[i + 3])
            yield pd.DataFrame(
                {"seq_id": ids, "sequence": seqs, "quality": quals}
            )

    return files.select("path", "content").mapInPandas(parse, FASTQ_SCHEMA)


def sketch_fasta(
    spark: SparkSession, path: str, cfg=None
) -> DataFrame:
    """The reference's end-to-end workflow in one call: FASTA -> per-record
    MASH-style sketch (MurmurHash3-x64-128 low64, seed 42, canonical
    reverse-complement k-mers — the reference demo's configuration)."""
    from ..config import SketchConfig
    from ..operators.signature import sketch_table

    if cfg is None:
        cfg = SketchConfig(
            nsize=21,
            maxsize=1000,
            hash_name="mmh3_x64_128_low64",
            seed=42,
            canonical="dna_rc",
        )
    recs = read_fasta(spark, path)
    return sketch_table(recs, cfg, url_col="seq_id", text_col="sequence")
