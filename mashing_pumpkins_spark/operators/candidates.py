"""Candidate-pair generation from LSH bands, with explicit skew handling.

Shape of the problem at 10^12 docs: a band bucket of g members contributes
g(g-1)/2 pairs — boilerplate-heavy buckets (the planted 150-word footer, or
real-world chrome/templates) make g explode. AQE skew-join splitting fixes
shuffle-partition skew but cannot fix the O(g^2) pair fan-out *inside* a
bucket, so the cap is semantic, not physical:

- buckets with size <= band_group_cap: full within-bucket pairing
  (self-join on (band_id, band_key), url_a < url_b);
- larger buckets: STAR linking — each member paired with the bucket's
  minimum url only (g-1 pairs). For clique-like buckets (mass-duplicated
  pages) connectivity through the hub survives exact verification, so the
  final clusters are identical at O(g) cost; for boilerplate-only buckets
  the star pairs fail verification just like the full pairing would have.
  Never a silent drop: star-bucket count and member count are reported in
  the stage metrics.

  Recall caveat: if ONE over-cap bucket contains MULTIPLE distinct near-dup
  cliques, intra-bucket edges between non-hub members of different cliques
  are not emitted from this bucket, and those pairs rely on the other
  n_bands-1 bands (each clique's pairs collide again in its own buckets
  with the usual band probability). Raise band_group_cap or n_bands if a
  workload plants several big cliques behind one shared boilerplate band.

The pair table is deduped across bands (a near-dup pair typically shares
many bands) BEFORE the expensive signature join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import PipelineConfig


def candidate_pairs(
    bands: DataFrame, cfg: PipelineConfig, url_col: str = "url"
) -> tuple[DataFrame, DataFrame]:
    """bands(url, band_id, band_key) -> (pairs(url_a, url_b), skew_metrics).

    skew_metrics: one row per over-cap bucket (band_id, band_key, size) —
    the per-partition lineage record of what was star-linked.
    """
    from pyspark.sql.window import Window

    # ONE shuffle of the band table (round 8), memory-bounded under any
    # skew: the bucket size + hub annotation stays a window (WindowExec
    # buffers a partition with disk spill — never an in-memory array), and
    # the within-bucket pairing is a collect_list + double explode that
    # runs ONLY on under-cap rows, reusing the window's (band_id,
    # band_key) hash partitioning and sort — no exchange between them, and
    # every collected list is bounded by band_group_cap. The old shape's
    # within-bucket SELF-JOIN (two more exchanges of the band table) is
    # gone; over-cap buckets still star-link to the window hub row-by-row
    # (no list ever materializes for them). Per-bucket pair semantics
    # unchanged: full pairing under the cap, star linking to the min url
    # above it, one skew-metrics row per over-cap bucket.
    w = Window.partitionBy("band_id", "band_key")
    annotated = bands.withColumn("bucket_size", F.count("*").over(w)).withColumn(
        "hub", F.min(url_col).over(w)
    )

    # singleton buckets (the vast majority on duplicate-light corpora)
    # produce no pairs — drop them BEFORE the collect_list instead of
    # collecting 1-element lists and discarding them after
    small = annotated.where(
        (F.col("bucket_size") <= cfg.band_group_cap) & (F.col("bucket_size") >= 2)
    )
    full_pairs = (
        small.groupBy("band_id", "band_key")
        .agg(F.collect_list(url_col).alias("_members"))
        .where(F.size("_members") >= 2)
        .select(F.explode("_members").alias("url_a"), F.col("_members"))
        .select("url_a", F.explode("_members").alias("url_b"))
        .where(F.col("url_a") < F.col("url_b"))
    )

    big = annotated.where(F.col("bucket_size") > cfg.band_group_cap)
    star_pairs = big.where(F.col(url_col) != F.col("hub")).select(
        F.least(url_col, "hub").alias("url_a"),
        F.greatest(url_col, "hub").alias("url_b"),
    )

    pairs = (
        full_pairs.select("url_a", "url_b").union(star_pairs).distinct()
    )
    # skew metrics via a map-side-combined groupBy count, NOT the window:
    # consumers run this as a SEPARATE job (the pipeline's report agg), and
    # the window form made that job re-shuffle + re-sort + re-buffer the
    # whole band table a second time — a hash aggregate produces the same
    # one row per over-cap bucket for a partial-agg pass with no sort
    skew_metrics = (
        bands.groupBy("band_id", "band_key")
        .agg(F.count("*").alias("bucket_size"))
        .where(F.col("bucket_size") > cfg.band_group_cap)
    )
    return pairs, skew_metrics
