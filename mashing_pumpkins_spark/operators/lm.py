"""CCNet-style n-gram language-model quality filter.

CCNet (Wenzek et al. 2020) ranks crawled documents by the perplexity of
a KenLM n-gram model trained on a trusted reference corpus, then keeps
the head/middle of the distribution. This module is that filter re-done
Spark-first with a Laplace-smoothed BIGRAM model:

  p(w2 | w1) = (c(w1 w2) + 1) / (c_ctx(w1) + V)

where c(w1 w2) is the bigram count in the reference corpus, c_ctx(w1)
the count of w1 as a bigram context, and V the reference vocabulary
size. Per-document score = sum over the doc's bigrams of

  floor(1e6 * ln p(w2 | w1))   (a BIGINT)

— integer-scaled log-probabilities, so the per-doc sum is exact and
ORDER-INDEPENDENT (a float sum would hash differently across engines),
and the head/middle/tail banding compares sum against
threshold * n_grams in pure integer arithmetic. The only float step is
one ln per (c2, c_ctx) pair, floored at 1e-6 resolution; both engines
evaluate IEEE-double ln of identical rationals, so a cross-engine floor
flip needs a ln result within ~4e-9 of an integer boundary — checked
MATCH by the SQL oracle at gate scale.

Scale shape (the CCNet deployment): the LM is built ONCE from a FIXED
reference corpus (CCNet uses Wikipedia), so its size is bounded by the
reference vocabulary, not the crawl — it broadcasts (KenLM ships ~GB
models to every worker the same way). Scoring is then explode ->
broadcast-join -> one doc-keyed groupBy with map-side partial
aggregation: a single shuffle of (id, counters) however large the
crawl.

Reference semantics source: the public CCNet paper's head/middle/tail
perplexity buckets; tokenization byte-mirrors operators.corpus
words_array (lowercase, ASCII-whitespace split) so the oracle replays
it with string_split_regex.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .corpus import word_gram_array, words_array

# default band cuts on avg ln p(gram): head above ln(1e-3)-ish, tail
# below ln(4.5e-5)-ish — chosen so the synthetic gate corpus splits
# across all three bands; production recalibrates per reference corpus
# exactly as CCNet fits per-language percentile cutoffs.
HEAD_CUT_E6 = -7_000_000
TAIL_CUT_E6 = -10_000_000


@dataclass(frozen=True)
class BigramLM:
    """Broadcast-ready bigram model: counts plus the vocab-size scalar."""

    bigrams: DataFrame  # (g string, c2 long)
    contexts: DataFrame  # (w1 string, c_ctx long)
    vocab_size: int


def fit_bigram_lm(lm_docs: DataFrame, text_col: str = "text") -> BigramLM:
    """Count model from the reference corpus. Two aggregations over the
    reference (bounded, one-off) plus one scalar vocab count; the
    context table derives from the bigram table (c_ctx(w1) = sum of c2
    over grams starting with w1), so a token's final occurrence in a
    doc — which heads no bigram — correctly doesn't count as context."""
    w = words_array(F.col(text_col))
    # persisted: the bigram table feeds the context derivation AND the
    # scoring join; unpersisted, every consumer re-runs the reference
    # corpus explode+aggregate (the dsir.py fit documents the same)
    big = (
        lm_docs.select(F.explode(word_gram_array(w, 2)).alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("c2"))
    ).persist()
    ctx = (
        big.groupBy(F.split(F.col("g"), " ", 2).getItem(0).alias("w1"))
        .agg(F.sum("c2").alias("c_ctx"))
    )
    vocab = (
        lm_docs.select(F.explode(w).alias("w")).agg(
            F.countDistinct("w").alias("v")
        )
    ).collect()[0]["v"]
    return BigramLM(bigrams=big, contexts=ctx, vocab_size=int(vocab))


def _band(
    n_grams: Column, sum_logp_e6: Column, head_cut_e6: int, tail_cut_e6: int
) -> Column:
    return (
        F.when(n_grams == 0, F.lit("empty"))
        .when(sum_logp_e6 > F.lit(head_cut_e6) * n_grams, F.lit("head"))
        .when(sum_logp_e6 > F.lit(tail_cut_e6) * n_grams, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )


def lm_perplexity(
    docs: DataFrame,
    lm: BigramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
    head_cut_e6: int = HEAD_CUT_E6,
    tail_cut_e6: int = TAIL_CUT_E6,
) -> DataFrame:
    """Per-document LM quality score: (id, n_grams, n_oov, sum_logp_e6,
    band). n_oov counts bigrams absent from the model (they still score
    via the smoothed 1/(c_ctx+V) mass). band is CCNet's head/middle/tail
    on avg log-prob, decided by integer comparison. Documents with
    fewer than two tokens band 'empty' (perplexity undefined).

    Band cuts are avg-log-prob thresholds in 1e-6 units (ln-space);
    the defaults suit natural-language references, and callers fit
    corpus-specific cuts the way CCNet fits per-language percentile
    cutoffs (the synthetic gate corpus has a 31-word vocabulary, so
    its whole avg-ln-p range sits in [-4.1, -3.2] and uses fitted
    cuts).

    Plan: explode bigrams (no shuffle) -> two broadcast left joins
    against the fixed-size model -> ONE groupBy(id) with map-side
    partial agg. The crawl side never shuffles its text."""
    if not tail_cut_e6 < head_cut_e6 < 0:
        raise ValueError(
            f"band cuts must satisfy tail < head < 0, got "
            f"head={head_cut_e6} tail={tail_cut_e6}"
        )
    w = words_array(F.col(text_col))
    grams = docs.select(
        F.col(id_col), F.explode_outer(word_gram_array(w, 2)).alias("g")
    ).withColumn("w1", F.split(F.col("g"), " ", 2).getItem(0))
    scored = grams.join(F.broadcast(lm.bigrams), "g", "left").join(
        F.broadcast(lm.contexts), "w1", "left"
    )
    p = (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(1)).cast("double") / (
        F.coalesce(F.col("c_ctx"), F.lit(0)) + F.lit(lm.vocab_size)
    ).cast("double")
    weight = F.floor(F.log(p) * F.lit(1_000_000.0)).cast("long")
    agg = scored.groupBy(id_col).agg(
        F.count(F.col("g")).alias("n_grams"),
        F.sum(
            (F.col("g").isNotNull() & F.col("c2").isNull()).cast("long")
        ).alias("n_oov"),
        F.coalesce(
            F.sum(F.when(F.col("g").isNotNull(), weight)), F.lit(0)
        ).alias("sum_logp_e6"),
    )
    return agg.withColumn(
        "band",
        _band(F.col("n_grams"), F.col("sum_logp_e6"), head_cut_e6, tail_cut_e6),
    )
