"""CCNet-style bigram-LM perplexity filter (operators/lm.py).

Reference semantics: CCNet's head/middle/tail perplexity buckets over a
reference-corpus n-gram LM (Wenzek et al. 2020), here a Laplace-smoothed
bigram model with integer-scaled log-probs so sums are exact."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from mashing_pumpkins_spark.operators.lm import (
    BigramLM,
    fit_bigram_lm,
    lm_perplexity,
)


@pytest.fixture(scope="module")
def tiny_lm(spark):
    lm_docs = spark.createDataFrame(
        [(0, "a b a c"), (10, "b a b")], "doc_id long, text string"
    )
    return fit_bigram_lm(lm_docs)


def test_fit_counts_and_vocab(spark, tiny_lm):
    assert tiny_lm.vocab_size == 3  # {a, b, c}
    big = {r["g"]: r["c2"] for r in tiny_lm.bigrams.collect()}
    assert big == {"a b": 2, "b a": 2, "a c": 1}
    ctx = {r["w1"]: r["c_ctx"] for r in tiny_lm.contexts.collect()}
    # doc-final tokens head no bigram: 'c' is never a context
    assert ctx == {"a": 3, "b": 2}


def test_hand_computed_scores_and_bands(spark, tiny_lm):
    docs = spark.createDataFrame(
        [(1, "a b x"), (2, "z"), (3, ""), (4, "x a")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in lm_perplexity(
            docs, tiny_lm, head_cut_e6=-1_000_000, tail_cut_e6=-2_000_000
        ).collect()
    }
    # doc 1: 'a b' -> p=(2+1)/(3+3)=0.5 ; 'b x' OOV -> p=(0+1)/(2+3)=0.2
    w_ab = math.floor(math.log(0.5) * 1e6)  # -693148
    w_bx = math.floor(math.log(0.2) * 1e6)  # -1609438
    assert out[1]["n_grams"] == 2 and out[1]["n_oov"] == 1
    assert out[1]["sum_logp_e6"] == w_ab + w_bx == -2302586
    # avg -1151293: below head cut, above tail cut
    assert out[1]["band"] == "middle"
    # doc 4: 'x a' OOV with OOV context -> p = 1/(0+3)
    assert out[4]["n_oov"] == 1
    assert out[4]["sum_logp_e6"] == math.floor(math.log(1 / 3) * 1e6) == -1098613
    assert out[4]["band"] == "middle"
    # <2 tokens / blank text: no bigrams, perplexity undefined
    for d in (2, 3):
        assert out[d]["n_grams"] == 0 and out[d]["n_oov"] == 0
        assert out[d]["sum_logp_e6"] == 0 and out[d]["band"] == "empty"


def test_band_cut_boundaries(spark, tiny_lm):
    docs = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string")
    # 3 grams: 'a b' x2 (w=-693148), 'b a' (p=(2+1)/(2+3)=0.6, w=-510826)
    row = lm_perplexity(docs, tiny_lm).collect()[0]
    s, n = row["sum_logp_e6"], row["n_grams"]
    assert (s, n) == (-693148 * 2 - 510826, 3)
    # a cut exactly AT the avg must not band head (strict >)
    avg_floor = s // n  # not exact divisor; use cuts bracketing s/n
    strict = lm_perplexity(docs, tiny_lm, head_cut_e6=avg_floor, tail_cut_e6=avg_floor - 1)
    assert strict.collect()[0]["band"] in ("head", "middle")
    assert lm_perplexity(docs, tiny_lm, head_cut_e6=-1, tail_cut_e6=-(10**9)).collect()[
        0
    ]["band"] == "middle"


def test_invalid_cuts_raise(spark, tiny_lm):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        lm_perplexity(docs, tiny_lm, head_cut_e6=-2, tail_cut_e6=-1)
    with pytest.raises(ValueError):
        lm_perplexity(docs, tiny_lm, head_cut_e6=1, tail_cut_e6=-1)


def test_matches_python_recompute_on_random_corpus(spark):
    """End-to-end parity with an independent driver-side recompute
    (Counter + math.log) over a randomized corpus — guards the join
    keys, smoothing denominators, and the integer flooring at once."""
    import random

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(40)]
    mk = lambda n: " ".join(rng.choice(vocab) for _ in range(n))
    lm_rows = [(i, mk(rng.randint(5, 60))) for i in range(20)]
    train_rows = [(100 + i, mk(rng.randint(0, 30))) for i in range(30)]
    lm_docs = spark.createDataFrame(lm_rows, "doc_id long, text string")
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    lm = fit_bigram_lm(lm_docs)

    toks = {i: t.split() for i, t in lm_rows}
    big = Counter(
        " ".join(w[j : j + 2]) for w in toks.values() for j in range(len(w) - 1)
    )
    ctx = Counter()
    for g, c in big.items():
        ctx[g.split()[0]] += c
    v = len({t for w in toks.values() for t in w})
    assert lm.vocab_size == v

    got = {r["doc_id"]: r for r in lm_perplexity(train, lm).collect()}
    for i, t in train_rows:
        w = t.split()
        grams = [" ".join(w[j : j + 2]) for j in range(len(w) - 1)]
        want = sum(
            math.floor(
                math.log((big.get(g, 0) + 1) / (ctx.get(g.split()[0], 0) + v)) * 1e6
            )
            for g in grams
        )
        assert got[i]["n_grams"] == len(grams), i
        assert got[i]["n_oov"] == sum(g not in big for g in grams), i
        assert got[i]["sum_logp_e6"] == want, i


def test_plan_shape_broadcast_no_extra_shuffle(spark, tiny_lm):
    """Model joins must broadcast (the LM is the bounded side at crawl
    scale) and the only Exchange is the final doc-keyed aggregation."""
    docs = spark.createDataFrame(
        [(i, "a b c a") for i in range(10)], "doc_id long, text string"
    )
    plan = (
        lm_perplexity(docs, tiny_lm)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
