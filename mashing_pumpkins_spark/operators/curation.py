"""End-to-end curation funnel: the standard training-data cleaning
sequence composed from this repo's operators, with a per-stage funnel
report (docs and words surviving each stage).

Stages (each optional knobs, all pure JVM Column expressions):
  0 input
  1 quality_filter     — textstats.quality_score >= quality_min
  2 exact_dedup        — keep min-id doc per md5(text) group
  3 passage_dedup      — drop docs whose duplicated-passage fraction
                         (corpus.passage_dedup_stats over the stage-2
                         survivors) exceeds max_dup_frac
  4 decontamination    — drop docs sharing any word n-gram with the
                         benchmark set (corpus.decontaminate)

Scale notes (100 TB): the funnel DataFrame is declarative — each stage's
count/word aggregate is a separate plan branch, so Catalyst prunes to
(id, text) and pushes the quality predicate to the scan in every branch.
The branches recompute upstream filters; a production run materializes
each stage through the checkpoint store (plans/checkpoint.py) exactly as
the near-dup pipeline does, then the funnel aggregates read the committed
snapshots. Near-dup (MinHash) removal runs as its own checkpointed
pipeline (plans/pipeline.py) — it is hash-valued and therefore not part
of this SQL-replayable funnel.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.textstats import quality_score, whitespace_token_count
from .corpus import decontaminate, passage_dedup_stats

if TYPE_CHECKING:  # pragma: no cover
    from ..config import PipelineConfig


def curation_funnel(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    quality_min: float = 0.4,
    passage_words: int = 16,
    max_dup_frac: float = 0.5,
    ngram: int = 4,
    near_dup: "PipelineConfig | None" = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Returns (funnel, survivors): funnel is one row per stage with
    (stage_idx, stage, n_docs, n_words); survivors is the post-funnel
    document set (id, text columns preserved).

    When `near_dup` (a PipelineConfig) is given, a final stage runs the
    full MinHash near-dup pipeline (sketch -> bands -> candidates ->
    verify -> connected components, plans/pipeline.run_pipeline_flow) on
    the survivors and keeps one representative per cluster (the member
    whose string id equals the cluster id, i.e. the lexicographic min).
    This stage is hash-valued, so the SQL-replayable driver query leaves
    it off; its own correctness gate is the `pipeline_clusters` oracle."""
    base = docs.select(F.col(id_col), F.col(text_col))
    stages: list[tuple[str, DataFrame]] = [("input", base)]

    s1 = base.where(quality_score(F.col(text_col)) >= F.lit(quality_min))
    stages.append(("quality_filter", s1))

    w = Window.partitionBy(F.md5(F.encode(F.col(text_col), "utf-8"))).orderBy(
        F.col(id_col)
    )
    s2 = (
        s1.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    stages.append(("exact_dedup", s2))

    pstats = passage_dedup_stats(
        s2, passage_words=passage_words, id_col=id_col, text_col=text_col
    ).select(id_col, "n_passages", "n_dup_passages")
    s3 = (
        s2.join(pstats, id_col, "left")
        .where(
            F.coalesce("n_dup_passages", F.lit(0)).cast("double")
            / F.greatest(F.coalesce("n_passages", F.lit(1)), F.lit(1))
            <= F.lit(max_dup_frac)
        )
        .select(id_col, text_col)
    )
    stages.append(("passage_dedup", s3))

    if benchmark is not None:
        dirty = (
            decontaminate(s3, benchmark, n=ngram, id_col=id_col, text_col=text_col)
            .where(F.col("contaminated") == 1)
            .select(id_col)
        )
        s4 = s3.join(dirty, id_col, "left_anti")
        stages.append(("decontamination", s4))

    if near_dup is not None:
        from ..plans.pipeline import run_pipeline_flow

        prev = stages[-1][1]
        pages = prev.select(
            F.col(id_col).cast("string").alias("url"), F.col(text_col).alias("text")
        )
        clusters, _report = run_pipeline_flow(docs.sparkSession, pages, near_dup)
        losers = clusters.where(F.col("url") != F.col("cluster_id")).select(
            F.col("url").alias("_loser")
        )
        s5 = prev.join(
            losers, F.col(id_col).cast("string") == F.col("_loser"), "left_anti"
        )
        stages.append(("near_dup", s5))

    funnel_rows = [
        df.agg(
            F.lit(idx).alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.count("*").alias("n_docs"),
            F.coalesce(
                F.sum(whitespace_token_count(F.col(text_col))).cast("long"), F.lit(0)
            ).alias("n_words"),
        )
        for idx, (name, df) in enumerate(stages)
    ]
    funnel = funnel_rows[0]
    for part in funnel_rows[1:]:
        funnel = funnel.unionAll(part)
    return funnel.orderBy("stage_idx"), stages[-1][1]
