"""Batch incremental near-dup: admit a NEW batch of documents against a
committed corpus index without re-scanning (or re-sketching) the corpus.

The committed index is the (signatures, bands) pair the batch pipeline
already checkpoints (plans/pipeline.py stages / IcebergCheckpointStore);
admission is:

    new batch
      -> optional intra-batch dedup (full flow pipeline on the batch only)
      -> sketch + band the survivors (same kernels, same config ->
         bit-identical keys to the committed run)
      -> band-key equi-join against the committed bands
      -> exact Jaccard verify vs committed signatures (>= tau)
      -> split: matches (near-dup of corpus) / fresh (admit + index delta)

Scale shape (100 TB corpus, small-to-medium batch): the corpus side is
touched only through the band equi-join (shuffled hash join keyed by
band_key; with the committed bands bucketed by band_key the batch side
alone shuffles) and the verify join (one signature row per candidate).
Batch cost scales with the batch, not the corpus — the property that
makes rolling corpus refreshes affordable. The streaming twin of this
operator is streaming/near_dup_stream.py (same join shape, same kernels).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..operators.banding import band_table
from ..operators.signature import sketch_table
from ..streaming.near_dup_stream import streaming_near_dup_matches


def index_tables(
    docs: DataFrame,
    cfg: PipelineConfig,
    url_col: str = "url",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """(signatures, bands) for a document set — the committed-index shape,
    and the delta to append after admitting a fresh batch."""
    sigs = sketch_table(
        docs.select(F.col(url_col).alias("url"), F.col(text_col).alias("text")),
        cfg.sketch,
    )
    return sigs, band_table(sigs, cfg)


def incremental_near_dup(
    new_docs: DataFrame,
    committed_signatures: DataFrame,
    committed_bands: DataFrame,
    cfg: PipelineConfig,
    intra_batch: bool = True,
    url_col: str = "url",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Returns (matches, fresh):

    - matches(new_url, match_url, jaccard): batch docs that are near-dups
      (exact sketch Jaccard >= cfg.jaccard_threshold) of a committed doc.
    - fresh(url, text): batch docs to admit — after intra-batch near-dup
      collapse (keep one representative per within-batch cluster) when
      ``intra_batch`` is set, minus everything in ``matches``.

    The caller appends ``index_tables(fresh, cfg)`` to the committed index
    to complete the refresh. Config MUST equal the committed run's (band
    keys are config-derived; the checkpoint manifest's config_hash
    enforces this at the storage layer)."""
    batch = new_docs.select(
        F.col(url_col).alias("url"), F.col(text_col).alias("text")
    )
    if intra_batch:
        from ..plans.pipeline import run_pipeline_flow

        clusters, _ = run_pipeline_flow(new_docs.sparkSession, batch, cfg)
        losers = clusters.where(F.col("url") != F.col("cluster_id")).select("url")
        batch = batch.join(losers, "url", "left_anti")

    matches = streaming_near_dup_matches(
        batch, committed_signatures, committed_bands, cfg
    )
    fresh = batch.join(
        matches.select(F.col("new_url").alias("url")).distinct(), "url", "left_anti"
    )
    return matches, fresh
