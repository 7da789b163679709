"""End-to-end curation funnel: the standard training-data cleaning
sequence composed from this repo's operators, with a per-stage funnel
report (docs and words surviving each stage).

Stages in order (every one optional except input/quality/exact/passage;
all pure JVM Column expressions unless noted):
  input
  url_filter          — UT1-style blocklist cut on the url column
                        (urltools.url_filter_flags; needs url_col +
                        blocked_hosts/blocked_path_terms)
  robots              — RFC 9309 admission for `agent` against a parsed
                        robots-rules table (sources.robots.robots_allowed;
                        needs url_col + robots_rules; one broadcast join)
  quality_filter      — textstats.quality_score >= quality_min
  quality_classifier  — hashed-n-gram linear model score >= classifier_min
                        (functions.classifier.hashed_ngram_score; needs
                        classifier_weights)
  lm_filter           — CCNet-style bigram-LM perplexity band in lm_keep
                        (operators.lm; needs lm_reference)
  exact_dedup         — keep min-id doc per content-key group
  passage_dedup       — drop docs whose duplicated-passage fraction
                        (corpus.passage_dedup_stats over the exact-dedup
                        survivors) exceeds max_dup_frac
  decontamination     — drop docs sharing any word n-gram with the
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
from .exact import content_key

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
    url_col: str | None = None,
    blocked_hosts: list[str] | None = None,
    blocked_path_terms: list[str] | None = None,
    robots_rules: DataFrame | None = None,
    agent: str = "*",
    classifier_weights: list[int] | None = None,
    classifier_min: int = 0,
    lm_reference: DataFrame | None = None,
    lm_head_cut_e6: int | None = None,
    lm_tail_cut_e6: int | None = None,
    lm_keep: tuple[str, ...] = ("head", "middle"),
    near_dup_checkpoint_dir: str | None = None,
    semantic: dict | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Returns (funnel, survivors): funnel is one row per stage with
    (stage_idx, stage, n_docs, n_words); survivors is the post-funnel
    document set (id, text columns preserved).

    Optional gate stages (round-6): `blocked_hosts`/`blocked_path_terms`
    enable the url_filter stage, `robots_rules` (a parse_robots table)
    enables the robots admission stage for `agent` — both need `url_col`
    — and `classifier_weights` enables the hashed-n-gram linear-model
    stage keeping docs with score >= classifier_min. Stage indices shift
    when gates are enabled; with all gates off the funnel is byte-
    identical to the pre-round-6 five-stage output.

    `lm_reference` (round-7) enables the CCNet-style LM filter
    (operators/lm.py): a bigram model is fit on the reference corpus
    and docs whose perplexity band is not in `lm_keep` are cut —
    CCNet's keep-head-and-middle policy by default. The stage sits
    after the cheap structural/classifier gates (it joins two model
    tables, so only current survivors are scored) and before dedup.

    When `near_dup` (a PipelineConfig) is given, a final stage runs the
    full MinHash near-dup pipeline (sketch -> bands -> candidates ->
    verify -> connected components) on the survivors and keeps one
    representative per cluster (the member whose string id equals the
    cluster id, i.e. the lexicographic min). With
    `near_dup_checkpoint_dir` set the stage runs CHECKPOINTED
    (plans/pipeline.run_pipeline — every pipeline stage materializes to
    the store with the config-hash manifest, so the composed curation
    job resumes mid-near-dup exactly like a standalone dedup run);
    without it the stage runs as one chained flow plan
    (run_pipeline_flow). This stage is hash-valued, so the
    SQL-replayable driver query leaves it off; its own correctness gate
    is the `pipeline_clusters` oracle.

    `semantic` (round-7) appends a SemDedup stage AFTER near-dup — the
    paper's placement: text dedup first, then embedding-space pruning
    of what text similarity cannot see. The dict is forwarded to
    operators/semdedup.semantic_text_dedup (keys: n_clusters — default
    16 — tau_ppm, n_iters, dim, max_cluster_size, assign_backend); the
    embedding is the model-free signed hashed-TF projection, so this
    stage too is exact integer math (its own gate is the
    `semdedup_text_prune` oracle; the funnel wiring is suite-tested)."""
    url_gates = bool(blocked_hosts or blocked_path_terms)
    if (url_gates or robots_rules is not None) and url_col is None:
        raise ValueError("url_filter/robots stages require url_col")

    # Single-scan design: one base DataFrame carries a cumulative survival
    # flag per stage, and the whole funnel report is ONE aggregate over it
    # (stage N's count = sum of flag N). The naive alternative — one agg
    # branch per stage, each re-deriving the full upstream chain — ran 5x
    # the work; only the passage-count, robots-admission and
    # benchmark-gram side inputs are aggregation/join branches here, and
    # they read the filtered base once.
    base_cols = [F.col(id_col), F.col(text_col)]
    extra_url = url_col is not None and url_col not in (id_col, text_col)
    if extra_url:
        base_cols.append(F.col(url_col))
    flags = docs.select(*base_cols)
    specs: list[tuple[str, "F.Column"]] = [("input", F.lit(True))]
    gate = F.lit(True)

    if url_gates:
        from ..functions.urltools import url_filter_flags

        flags = flags.withColumn(
            "_uf",
            gate
            & ~url_filter_flags(
                F.col(url_col), blocked_hosts or [], blocked_path_terms or []
            )["blocked"],
        )
        specs.append(("url_filter", F.col("_uf")))
        gate = F.col("_uf")

    if robots_rules is not None:
        from ..functions.urltools import _path_query, host_of
        from ..sources.robots import robots_allowed

        pq = _path_query(F.col(url_col))
        # only current survivors enter the robots lookup — its per-rule
        # regex match and (host,path) winner aggregation are the funnel's
        # costliest side branch, and a doc already cut upstream ends up
        # with _rb = gate & ... = false regardless of the lookup result
        frontier = flags.where(gate).select(
            F.col(id_col),
            host_of(F.col(url_col)).alias("_rb_host"),
            # RFC 9309: an empty path is matched as '/'
            F.when(pq == "", F.lit("/")).otherwise(pq).alias("_rb_path"),
        )
        admitted = robots_allowed(
            frontier, robots_rules, agent, host_col="_rb_host", path_col="_rb_path"
        ).select(F.col(id_col), F.col("allowed").alias("_rb_ok"))
        flags = flags.join(admitted, id_col, "left").withColumn(
            "_rb", gate & F.coalesce("_rb_ok", F.lit(True))
        ).drop("_rb_ok")
        specs.append(("robots", F.col("_rb")))
        gate = F.col("_rb")

    flags = flags.withColumn(
        "_q", gate & (quality_score(F.col(text_col)) >= F.lit(quality_min))
    )
    specs.append(("quality_filter", F.col("_q")))
    gate = F.col("_q")

    if classifier_weights:
        from ..functions.classifier import hashed_ngram_score

        flags = flags.withColumn(
            "_k",
            gate
            & (
                hashed_ngram_score(F.col(text_col), classifier_weights)
                >= F.lit(int(classifier_min))
            ),
        )
        specs.append(("quality_classifier", F.col("_k")))
        gate = F.col("_k")

    if lm_reference is not None:
        from .lm import HEAD_CUT_E6, TAIL_CUT_E6, fit_bigram_lm, lm_perplexity

        lm = fit_bigram_lm(lm_reference, text_col=text_col)
        # side branch over current survivors only (the model joins +
        # doc-keyed agg are the costly part); cut docs re-join on id
        bands = lm_perplexity(
            flags.where(gate).select(id_col, text_col),
            lm,
            id_col=id_col,
            text_col=text_col,
            head_cut_e6=(
                HEAD_CUT_E6 if lm_head_cut_e6 is None else lm_head_cut_e6
            ),
            tail_cut_e6=(
                TAIL_CUT_E6 if lm_tail_cut_e6 is None else lm_tail_cut_e6
            ),
        ).select(
            F.col(id_col), F.col("band").isin(*lm_keep).alias("_lm_ok")
        )
        flags = flags.join(bands, id_col, "left").withColumn(
            "_lm", gate & F.coalesce("_lm_ok", F.lit(False))
        ).drop("_lm_ok")
        specs.append(("lm_filter", F.col("_lm")))
        gate = F.col("_lm")

    # Round-8 measurement note: persisting the cumulative-flag base here
    # (so the window/passage/decontamination branches read it instead of
    # re-deriving the gate chain) was tried and REVERTED — caching the
    # full text payload cost more than the branch recompute saves
    # (gated funnel 4.8 s -> 6.4 s adjacent A/B). The declarative
    # recompute + per-stage checkpointing at production scale stands.

    # exact-dedup representative among upstream survivors: min id per
    # content fingerprint, restricted to gate rows (ids are unique, so
    # this equals row_number()==1 over (fp, id) among survivors). The key
    # is the engine-wide 12-byte (len, xx64, mm32) content struct shared
    # with operators/exact.py — smaller sort key than an md5 hex string,
    # one content-key definition across the engine; the DuckDB replay
    # groups by md5(text), equivalent for any content-determined key
    # (collisions ~1e-5 at 10^12 docs, and a collision only merges two
    # groups).
    w = Window.partitionBy(content_key(text_col))
    flags = flags.withColumn(
        "_d",
        gate & (F.col(id_col) == F.min(F.when(gate, F.col(id_col))).over(w)),
    )

    pstats = passage_dedup_stats(
        flags.where("_d").select(id_col, text_col),
        passage_words=passage_words,
        id_col=id_col,
        text_col=text_col,
    ).select(id_col, "n_passages", "n_dup_passages")
    flags = flags.join(pstats, id_col, "left").withColumn(
        "_p",
        F.col("_d")
        & (
            F.coalesce("n_dup_passages", F.lit(0)).cast("double")
            / F.greatest(F.coalesce("n_passages", F.lit(1)), F.lit(1))
            <= F.lit(max_dup_frac)
        ),
    ).drop("n_passages", "n_dup_passages")

    specs.append(("exact_dedup", F.col("_d")))
    specs.append(("passage_dedup", F.col("_p")))
    last = "_p"

    if benchmark is not None:
        dirty = (
            decontaminate(
                flags.where("_p").select(id_col, text_col),
                benchmark,
                n=ngram,
                id_col=id_col,
                text_col=text_col,
            )
            .where(F.col("contaminated") == 1)
            .select(id_col, F.lit(True).alias("_dirty"))
        )
        flags = flags.join(dirty, id_col, "left").withColumn(
            "_c", F.col("_p") & ~F.coalesce("_dirty", F.lit(False))
        ).drop("_dirty")
        specs.append(("decontamination", F.col("_c")))
        last = "_c"

    out_cols = [id_col, text_col] + ([url_col] if extra_url else [])
    survivors = flags.where(last).select(*out_cols)

    wc = whitespace_token_count(F.col(text_col))
    aggs = []
    for i, (_name, flag) in enumerate(specs):
        aggs.append(
            F.coalesce(F.sum(flag.cast("long")), F.lit(0)).cast("long").alias(f"c{i}")
        )
        aggs.append(
            F.coalesce(F.sum(F.when(flag, wc)), F.lit(0)).cast("long").alias(f"w{i}")
        )
    structs = [
        F.struct(
            F.lit(i).alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.col(f"c{i}").alias("n_docs"),
            F.col(f"w{i}").alias("n_words"),
        )
        for i, (name, _flag) in enumerate(specs)
    ]
    funnel = (
        flags.agg(*aggs)
        .select(F.explode(F.array(*structs)).alias("_r"))
        .select("_r.*")
    )

    if near_dup is not None:
        pages = survivors.select(
            F.col(id_col).cast("string").alias("url"), F.col(text_col).alias("text")
        )
        if near_dup_checkpoint_dir is not None:
            from ..plans.pipeline import run_pipeline

            clusters, _report = run_pipeline(
                docs.sparkSession, pages, near_dup, near_dup_checkpoint_dir
            )
        else:
            from ..plans.pipeline import run_pipeline_flow

            clusters, _report = run_pipeline_flow(docs.sparkSession, pages, near_dup)
        losers = clusters.where(F.col("url") != F.col("cluster_id")).select(
            F.col("url").alias("_loser")
        )
        survivors = survivors.join(
            losers, F.col(id_col).cast("string") == F.col("_loser"), "left_anti"
        )
        extra = survivors.agg(
            F.count("*").alias("n_docs"),
            F.coalesce(F.sum(wc), F.lit(0)).cast("long").alias("n_words"),
        ).select(
            F.lit(len(specs)).alias("stage_idx"),
            F.lit("near_dup").alias("stage"),
            "n_docs",
            "n_words",
        )
        funnel = funnel.unionAll(extra)

    if semantic is not None:
        from .semdedup import choose_n_clusters, semantic_text_dedup

        sem_kw = dict(semantic)
        if not sem_kw.get("n_clusters"):
            # workload-derived k (ceil(n/500)): holds avg cluster size —
            # and so per-doc prune cost — flat as the corpus grows
            sem_kw["n_clusters"] = choose_n_clusters(survivors.count())
        marks = semantic_text_dedup(
            survivors, id_col=id_col, text_col=text_col, **sem_kw
        )
        sem_losers = marks.where(~F.col("kept")).select(
            F.col(id_col).alias("_sem_loser")
        )
        survivors = survivors.join(
            sem_losers, F.col(id_col) == F.col("_sem_loser"), "left_anti"
        )
        sem_idx = len(specs) + (1 if near_dup is not None else 0)
        extra = survivors.agg(
            F.count("*").alias("n_docs"),
            F.coalesce(F.sum(wc), F.lit(0)).cast("long").alias("n_words"),
        ).select(
            F.lit(sem_idx).alias("stage_idx"),
            F.lit("semantic").alias("stage"),
            "n_docs",
            "n_words",
        )
        funnel = funnel.unionAll(extra)

    return funnel.orderBy("stage_idx"), survivors
