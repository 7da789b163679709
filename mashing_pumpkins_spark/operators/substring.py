"""Suffix-array-style exact substring dedup, Spark-first.

Finds document pairs sharing an exact byte substring of length >= min_len —
the third near-dup family the north rule names (MinHash / SimHash /
suffix-array substring; cf. "Deduplicating Training Data Makes Language
Models Better", Lee et al. 2022). A literal distributed suffix array is the
wrong physical plan for Spark; the equivalent join-shaped formulation is
content-defined anchor selection (winnowing / minimizers, Schleimer et al.
2003):

  1. hash every k-byte window of each doc (the existing vectorized
     xxh64_sliding kernel),
  2. in every run of w consecutive window hashes, select the position of
     the minimum hash (sliding-window argmin; ties -> leftmost). Selection
     depends only on document CONTENT, never position, so two documents
     sharing a substring of length >= k + w - 1 (= min_len) contain at
     least one full hash run in common and select the SAME anchor in both
     — an exact guarantee, not a probabilistic one,
  3. shuffle anchors by hash and equi-join — anchors carry ONLY (id, pos,
     hash), 24 bytes/row; window-byte equality (the hash-collision guard)
     is checked later inside the extension UDF, which re-reads both texts
     anyway,
  4. df-cap boilerplate anchors (exactly like stop-grams in the word-ngram
     operator) with the drop REPORTED, never silent.

Scale shape: ~2/w anchors per input byte (tiny vs the text), one narrow
shuffle keyed by anchor hash, no all-pairs anywhere. Seeds are grouped per
(id_a, id_b) BEFORE texts attach, so each text ships once per pair — not
once per seed (near-identical docs share ~2L/w seeds; attaching texts per
seed would re-create the quadratic blowup this module exists to avoid).
Within a pair, seeds on one diagonal (pos_a - pos_b) that fall inside an
already-extended maximal span provably extend to that same span and are
skipped, so each maximal occurrence is verified and emitted exactly once.
The DuckDB oracle explodes every min_len-byte window (hex form) and joins —
exact equality with the Spark result at test scale.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

from ..hashkernels import xxh64_sliding


def minimizer_anchors(data: bytes, k: int, w: int) -> tuple[np.ndarray, np.ndarray]:
    """(positions, hashes) of the winnowing minimizers of ``data``.

    Position i is selected iff h[i] is the leftmost minimum of at least one
    window of w consecutive window-hashes. len(data) >= k required.
    """
    from numpy.lib.stride_tricks import sliding_window_view

    h = xxh64_sliding(data, k)
    m = h.shape[0]
    if m <= w:
        pos = np.array([int(np.argmin(h))], dtype=np.int64)
        return pos, h[pos]
    from ..hashkernels import _hash_cext

    # O(m) monotonic-deque selection in C (round 8) — identical positions
    # to the numpy sliding-view argmin below, which reads m*w lanes
    sel = _hash_cext.minimizer_positions_c(h, w)
    if sel is None:
        wins = sliding_window_view(h, w)  # (m-w+1, w) strided view, no copy
        sel = np.unique(wins.argmin(axis=1) + np.arange(m - w + 1, dtype=np.int64))
    return sel, h[sel]


def _anchor_schema(docs: DataFrame, id_col: str) -> StructType:
    """(id, pos, anchor_hash) — id keeps the caller's dtype (string url,
    bigint doc_id, ...); no window payload, the byte check happens in the
    extension UDF."""
    return StructType(
        [
            StructField("id", docs.schema[id_col].dataType),
            StructField("pos", LongType()),
            StructField("anchor_hash", LongType()),
        ]
    )


def anchor_table(
    docs: DataFrame,
    min_len: int = 64,
    k: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, pos, anchor_hash) minimizer anchors per doc.

    w is derived as min_len - k + 1 so the detection guarantee is exactly
    "any shared substring of >= min_len bytes is found"."""
    if min_len < k + 1:
        raise ValueError("min_len must exceed the anchor window k")
    w = min_len - k + 1

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list = []
            poss: list[int] = []
            hs: list[int] = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                data = (
                    text.encode("utf-8") if isinstance(text, str) else (text or b"")
                )
                if len(data) < min_len:
                    continue  # cannot contain a min_len substring
                pos, h = minimizer_anchors(data, k, w)
                # every occurrence is kept: a repeated window's SHORT-context
                # occurrence must not shadow the long-match one, or the
                # extension verify below would under-measure
                h_i64 = h.view(np.int64)
                npos = pos.shape[0]
                ids.extend([doc_id] * npos)
                poss.extend(pos.tolist())
                hs.extend(h_i64.tolist())
            yield pd.DataFrame({"id": ids, "pos": poss, "anchor_hash": hs})

    return docs.select(id_col, text_col).mapInPandas(
        compute, _anchor_schema(docs, id_col)
    )


def _extend_match(a: bytes, b: bytes, pa: int, pb: int, k: int) -> tuple[int, int]:
    """(left_extension, total_length) of the maximal common substring around
    the seed match a[pa:pa+k] == b[pb:pb+k] (greedy byte extension both
    directions). The span in a is [pa-left, pa-left+total)."""
    left = 0
    while pa - left > 0 and pb - left > 0 and a[pa - left - 1] == b[pb - left - 1]:
        left += 1
    right = 0
    la, lb = len(a), len(b)
    while (
        pa + k + right < la
        and pb + k + right < lb
        and a[pa + k + right] == b[pb + k + right]
    ):
        right += 1
    return left, left + k + right


def _verified_seeds(
    docs: DataFrame,
    min_len: int,
    k: int,
    id_col: str,
    text_col: str,
    anchor_df_cap: int | None,
) -> DataFrame:
    """(id_a, start_a, id_b, start_b, match_len >= min_len): every maximal
    common substring occurrence discovered from a shared minimizer anchor
    and byte-verified by extension — each maximal occurrence exactly once.

    Seeds are aggregated to ONE row per (id_a, id_b) (collect_list of
    position pairs) before texts attach, so each text crosses the shuffle
    once per pair; the extension UDF then verifies all of a pair's seeds in
    one call. Within a pair, seeds on the same diagonal (pos_a - pos_b)
    whose k-byte window lies inside an already-extended maximal span must
    extend to that same span (the span's boundary is a byte divergence, and
    a genuine seed window cannot cross a divergence) — they are skipped,
    which also dedupes the output. Seed windows are byte-compared before
    extension: the hash-collision guard that previously rode the shuffle as
    a k-byte window column."""
    anchors = anchor_table(docs, min_len, k, id_col, text_col)
    if anchor_df_cap is not None:
        df_counts = anchors.groupBy("anchor_hash").agg(
            F.countDistinct("id").alias("_df")
        )
        anchors = anchors.join(
            df_counts.where(F.col("_df") <= anchor_df_cap), "anchor_hash"
        ).drop("_df")
    a = anchors.select(
        "anchor_hash", F.col("id").alias("id_a"), F.col("pos").alias("pos_a")
    )
    b = anchors.select(
        "anchor_hash", F.col("id").alias("id_b"), F.col("pos").alias("pos_b")
    )
    pair_seeds = (
        a.join(b, "anchor_hash")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.collect_list(F.struct("pos_a", "pos_b")).alias("seeds"))
    )
    texts = docs.select(F.col(id_col).alias("_tid"), F.col(text_col).alias("_t"))
    withtext = (
        pair_seeds.join(
            texts.withColumnRenamed("_tid", "id_a").withColumnRenamed("_t", "text_a"),
            "id_a",
        ).join(
            texts.withColumnRenamed("_tid", "id_b").withColumnRenamed("_t", "text_b"),
            "id_b",
        )
    )
    id_type = docs.schema[id_col].dataType
    out_schema = StructType(
        [
            StructField("id_a", id_type),
            StructField("start_a", LongType()),
            StructField("id_b", id_type),
            StructField("start_b", LongType()),
            StructField("match_len", LongType()),
        ]
    )

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def enc(text) -> bytes:
            return text.encode("utf-8") if isinstance(text, str) else (text or b"")

        for pdf in batches:
            ia_o, ib_o, sa, sb, ml = [], [], [], [], []
            for ia, ib, seeds, ta, tb in zip(
                pdf["id_a"], pdf["id_b"], pdf["seeds"], pdf["text_a"], pdf["text_b"]
            ):
                da, db = enc(ta), enc(tb)
                pa_arr = np.fromiter(
                    (s["pos_a"] for s in seeds), dtype=np.int64, count=len(seeds)
                )
                pb_arr = np.fromiter(
                    (s["pos_b"] for s in seeds), dtype=np.int64, count=len(seeds)
                )
                # sort by (diagonal, pos_a) so same-span seeds are adjacent
                diag = pa_arr - pb_arr
                order = np.lexsort((pa_arr, diag))
                cur_diag, covered_end = None, -1
                for j in order:
                    pa, pb, d = int(pa_arr[j]), int(pb_arr[j]), int(diag[j])
                    if d == cur_diag and pa < covered_end:
                        continue  # inside the previous maximal span
                    if da[pa : pa + k] != db[pb : pb + k]:
                        continue  # xxh64 collision — not a real seed
                    left, total = _extend_match(da, db, pa, pb, k)
                    cur_diag, covered_end = d, pa - left + total
                    if total >= min_len:
                        ia_o.append(ia)
                        ib_o.append(ib)
                        sa.append(pa - left)
                        sb.append(pb - left)
                        ml.append(total)
            yield pd.DataFrame(
                {
                    "id_a": ia_o,
                    "start_a": np.asarray(sa, dtype=np.int64),
                    "id_b": ib_o,
                    "start_b": np.asarray(sb, dtype=np.int64),
                    "match_len": np.asarray(ml, dtype=np.int64),
                }
            )

    return withtext.mapInPandas(verify, out_schema)


def substring_duplicate_pairs(
    docs: DataFrame,
    min_len: int = 64,
    k: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    anchor_df_cap: int | None = 10000,
) -> DataFrame:
    """(id_a, id_b, max_match_len) for every doc pair sharing >= 1 exact
    byte substring of length >= min_len — EXACTLY that set (the minimizer
    guarantee finds every such pair; byte extension around each seed
    discards anchor-level coincidences shorter than min_len).

    max_match_len is the longest verified shared span seeded by any common
    anchor (>= the true maximum is not guaranteed for spans that contain no
    common anchor — impossible for spans >= min_len, so the >= min_len
    filter is exact even though the reported length is seed-limited).

    anchor_df_cap drops anchors shared by more than that many docs
    (site-wide boilerplate — the pairs they would form are dominated by the
    quadratic boilerplate clique, exactly the stop-gram situation); pass
    None for the oracle-exact form.
    """
    seeds = _verified_seeds(docs, min_len, k, id_col, text_col, anchor_df_cap)
    return seeds.groupBy("id_a", "id_b").agg(
        F.max("match_len").alias("max_match_len")
    )


def _merge_intervals(spans: DataFrame) -> DataFrame:
    """(doc_id, start, end) -> merged non-overlapping (doc_id, span_start,
    span_end): gaps-and-islands with two JVM window passes."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy("start", "end")
    prev_max = F.max("end").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = spans.withColumn(
        "_new_island",
        F.when(F.col("start") > F.coalesce(prev_max, F.lit(-1)), 1).otherwise(0),
    ).withColumn("_island", F.sum("_new_island").over(w))
    return (
        flagged.groupBy("doc_id", "_island")
        .agg(F.min("start").alias("span_start"), F.max("end").alias("span_end"))
        .select("doc_id", "span_start", "span_end")
    )


def duplicate_spans(
    docs: DataFrame,
    min_len: int = 64,
    k: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    anchor_df_cap: int | None = 10000,
) -> DataFrame:
    """(doc_id, span_start, span_end): the merged byte ranges of each
    document that are part of an exact >= min_len substring shared with ANY
    other document — the ranges a training-data substring-dedup pass cuts
    (cf. Lee et al. 2022). Offsets are 0-based byte offsets into the UTF-8
    encoding, end exclusive.

    Set equality with the window oracle: a byte is covered by some shared
    >= min_len substring occurrence iff it is covered by a shared min_len
    window; every such occurrence contains a shared selected anchor (the
    winnowing guarantee), whose extension recovers the maximal occurrence —
    so the merged ranges equal the merged ranges of all shared min_len
    windows.
    """
    seeds = _verified_seeds(docs, min_len, k, id_col, text_col, anchor_df_cap)
    spans_a = seeds.select(
        F.col("id_a").alias("doc_id"),
        F.col("start_a").alias("start"),
        (F.col("start_a") + F.col("match_len")).alias("end"),
    )
    spans_b = seeds.select(
        F.col("id_b").alias("doc_id"),
        F.col("start_b").alias("start"),
        (F.col("start_b") + F.col("match_len")).alias("end"),
    )
    return _merge_intervals(spans_a.union(spans_b))


def remove_duplicate_spans(
    docs: DataFrame,
    min_len: int = 64,
    k: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    anchor_df_cap: int | None = 10000,
) -> DataFrame:
    """The cleaning pass itself: (doc_id, text, removed_bytes) with every
    duplicated >= min_len byte range cut out of the text (Lee et al. 2022's
    ExactSubstr dedup applied, not just reported). Documents without
    duplicated ranges pass through byte-identical, removed_bytes = 0.

    Cuts happen on the UTF-8 byte axis; a span boundary can in principle
    split a multibyte character (the byte-level divergence point sits
    inside one), in which case the dangling partial character is dropped
    (decode errors='ignore') — the alternative, keeping partial bytes,
    would corrupt the string.
    """
    spans = duplicate_spans(docs, min_len, k, id_col, text_col, anchor_df_cap)
    grouped = spans.groupBy("doc_id").agg(
        F.sort_array(
            F.collect_list(F.struct("span_start", "span_end"))
        ).alias("_spans")
    ).withColumnRenamed("doc_id", "_sid")
    joined = docs.select(id_col, text_col).join(
        grouped, F.col(id_col) == F.col("_sid"), "left"
    ).drop("_sid")
    out_schema = StructType(
        [
            StructField("doc_id", docs.schema[id_col].dataType),
            StructField("text", docs.schema[text_col].dataType),
            StructField("removed_bytes", LongType()),
        ]
    )

    def clean(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs, removed = [], []
            for text, spans_v in zip(pdf[text_col], pdf["_spans"]):
                if spans_v is None or len(spans_v) == 0:
                    outs.append(text)
                    removed.append(0)
                    continue
                data = (
                    text.encode("utf-8") if isinstance(text, str) else (text or b"")
                )
                kept = []
                pos = 0
                cut = 0
                for sp in spans_v:
                    s, e = int(sp["span_start"]), int(sp["span_end"])
                    kept.append(data[pos:s])
                    cut += e - s
                    pos = e
                kept.append(data[pos:])
                outs.append(b"".join(kept).decode("utf-8", errors="ignore"))
                removed.append(cut)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "text": outs,
                    "removed_bytes": removed,
                }
            )

    return joined.mapInPandas(clean, out_schema)
