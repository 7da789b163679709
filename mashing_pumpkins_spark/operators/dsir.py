"""DSIR-style data selection via hashed n-gram importance resampling.

DSIR (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling") selects pretraining documents whose hashed
bag-of-n-grams distribution looks like a TARGET corpus: fit two
bag-of-features models — target and raw — over hashed unigram+bigram
buckets, weight each raw document by

  log p_target(doc) - log p_raw(doc)
    = sum over features f of [ log p_t(bucket(f)) - log p_r(bucket(f)) ]

and keep the top-weighted documents (the paper resamples with Gumbel
noise; the deterministic top-k variant here is its zero-temperature
limit and is exactly replayable).

Numbers are engine-exact end to end, reusing the operators/lm.py
recipe: bucket = the md5-derived 32-bit hash shared with
functions/classifier.token_bucket (SQL: ('0x'||substr(md5(f),1,8)) %
B), per-bucket Laplace log-probs floored at 1e-6 resolution
(floor(1e6*ln((c+1)/(total+B))) as BIGINT), and per-doc weights as
BIGINT sums — order-independent, so the oracle hash crosses engines.

Scale shape: both models are B-row count tables (B = n_buckets,
thousands) built once — two aggregations each over their corpus, then
broadcast. Scoring is explode features -> two broadcast joins -> ONE
doc-keyed groupBy with map-side partial agg; selection is
orderBy+limit, which Spark plans as TakeOrderedAndProject (only k rows
leave each partition). The raw model is normally fit on a bounded
SAMPLE of the crawl (p_raw only normalizes the weight); pass that
sample as `raw_reference`.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.classifier import token_bucket
from .corpus import word_gram_array, words_array


def _features(text_col: str):
    """Unigram + bigram feature strings (DSIR's feature set); empty
    array for blank text."""
    w = words_array(F.col(text_col))
    return F.concat(w, word_gram_array(w, 2))


@dataclass(frozen=True)
class HashedNgramModel:
    """Bag-of-hashed-n-grams model: B-row bucket counts + the total."""

    counts: DataFrame  # (b int, c long)
    total: int
    n_buckets: int


def fit_hashed_ngram_model(
    docs: DataFrame, n_buckets: int = 4096, text_col: str = "text"
) -> HashedNgramModel:
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    # persisted: the counts feed BOTH the total (collected here) and the
    # later broadcast scoring join — without the persist each consumer
    # re-runs the full corpus explode+aggregate just to rebuild <= B rows
    counts = (
        docs.select(F.explode(_features(text_col)).alias("f"))
        .select(token_bucket(F.col("f"), n_buckets).alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("c"))
    ).persist()
    total = counts.agg(F.coalesce(F.sum("c"), F.lit(0)).alias("t")).collect()[0][
        "t"
    ]
    return HashedNgramModel(counts=counts, total=int(total), n_buckets=n_buckets)


def _logp_e6(c, total: int, n_buckets: int):
    p = (F.coalesce(c, F.lit(0)) + F.lit(1)).cast("double") / F.lit(
        float(total + n_buckets)
    )
    return F.floor(F.log(p) * F.lit(1_000_000.0)).cast("long")


def dsir_scores(
    docs: DataFrame,
    target: HashedNgramModel,
    raw: HashedNgramModel,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document importance weight: (id, n_feats, weight_e6) with
    weight_e6 = sum over features of the integer log-prob ratio. Zero-
    feature (blank) docs score weight 0 with n_feats 0 — selection must
    exclude them (dsir_top_k does), since 0 outranks any negative sum."""
    if target.n_buckets != raw.n_buckets:
        raise ValueError(
            f"model bucket spaces differ: {target.n_buckets} vs {raw.n_buckets}"
        )
    feats = docs.select(
        F.col(id_col), F.explode_outer(_features(text_col)).alias("f")
    ).withColumn("b", token_bucket(F.col("f"), target.n_buckets))
    tgt = target.counts.withColumnRenamed("c", "_ct")
    rw = raw.counts.withColumnRenamed("c", "_cr")
    scored = feats.join(F.broadcast(tgt), "b", "left").join(
        F.broadcast(rw), "b", "left"
    )
    wgt = _logp_e6(F.col("_ct"), target.total, target.n_buckets) - _logp_e6(
        F.col("_cr"), raw.total, raw.n_buckets
    )
    return scored.groupBy(id_col).agg(
        F.count(F.col("f")).alias("n_feats"),
        F.coalesce(F.sum(F.when(F.col("f").isNotNull(), wgt)), F.lit(0)).alias(
            "weight_e6"
        ),
    )


def dsir_top_k(
    docs: DataFrame,
    target_docs: DataFrame,
    k: int,
    raw_reference: DataFrame | None = None,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Select the k most target-like documents: fit the target model on
    `target_docs` and the raw model on `raw_reference` (default: the
    docs themselves — at crawl scale pass a bounded sample), score, and
    take the top k by (weight_e6 desc, id asc). Plans as
    TakeOrderedAndProject — only k rows leave each partition."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    # Round 8: BOTH models fit in ONE tagged union aggregate (one shuffle,
    # one job) instead of two sequential persist+collect fits — the two
    # B-row count tables and both totals come out of the same pass, with
    # identical per-model counts (the tag key separates them exactly as
    # two groupBys would).
    raw_docs = docs if raw_reference is None else raw_reference
    tagged = (
        target_docs.select(F.lit(0).alias("m"), F.explode(_features(text_col)).alias("f"))
        .unionAll(
            raw_docs.select(F.lit(1).alias("m"), F.explode(_features(text_col)).alias("f"))
        )
        .select("m", token_bucket(F.col("f"), n_buckets).alias("b"))
        .groupBy("m", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )
    try:
        totals = {
            int(r["m"]): int(r["t"])
            for r in tagged.groupBy("m")
            .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("t"))
            .collect()
        }
        target = HashedNgramModel(
            counts=tagged.where(F.col("m") == 0).select("b", "c"),
            total=totals.get(0, 0),
            n_buckets=n_buckets,
        )
        raw = HashedNgramModel(
            counts=tagged.where(F.col("m") == 1).select("b", "c"),
            total=totals.get(1, 0),
            n_buckets=n_buckets,
        )
        scores = dsir_scores(docs, target, raw, id_col, text_col)
        out = (
            scores.where(F.col("n_feats") > 0)
            .orderBy(F.col("weight_e6").desc(), F.col(id_col).asc())
            .limit(k)
        )
        # materialize before releasing the fused count cache (the same
        # eager-result discipline as semdedup / bpe_token_count — without
        # it the persisted model tables leak per invocation)
        out = out.localCheckpoint(eager=True)
    finally:
        tagged.unpersist()
    return out
