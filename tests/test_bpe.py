"""Distributed BPE trainer vs an independent driver-side reference.

The reference implementation below is a from-scratch transcription of the
Sennrich et al. 2016 pseudocode (get_stats / merge_vocab over a word-count
dict) — it shares NO code with operators/bpe.py, so agreement pins the
distributed trainer's semantics end to end (pair statistics, tie-break,
greedy apply, early stop)."""

from __future__ import annotations

import re

import pytest

from mashing_pumpkins_spark.operators.bpe import (
    apply_merge,
    fit_bpe,
    merges_df,
    token_counts,
)


# ------------------------------------------------------------------ reference
def _ref_get_stats(vocab):
    stats = {}
    for syms, cnt in vocab.items():
        for i in range(len(syms) - 1):
            pair = (syms[i], syms[i + 1])
            stats[pair] = stats.get(pair, 0) + cnt
    return stats


def _ref_merge_word(syms, pair):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _ref_fit(texts, n_merges, min_count=1):
    vocab = {}
    for t in texts:
        for w in re.findall("[a-z]+", t.lower()):
            key = tuple(w)
            vocab[key] = vocab.get(key, 0) + 1
    merges = []
    for step in range(1, n_merges + 1):
        stats = _ref_get_stats(vocab)
        if not stats:
            break
        # max by (count, left, right) — the documented tie-break
        cnt, left, right = max((c, p[0], p[1]) for p, c in stats.items())
        if cnt < min_count:
            break
        merges.append((step, left, right, cnt))
        vocab = {_ref_merge_word(s, (left, right)): c for s, c in vocab.items()}
    return merges, vocab


CORPUS = [
    "the cat sat on the mat",
    "the catalog of cats and caterpillars",
    "low lower lowest newer newest wider",
    "low low low low low lower lower newer newer newer newer newer newer",
    "a b c ab abc THE LOWER case only 123",
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], "doc_id int, text string")


def test_merges_match_reference(spark, corpus_df):
    model = fit_bpe(corpus_df, n_merges=10)
    got = [
        (m["step"], m["left_sym"], m["right_sym"], m["pair_count"])
        for m in model.merges
    ]
    want, _ = _ref_fit(CORPUS, 10)
    assert got == want
    model.words.unpersist()


def test_final_word_table_matches_reference(spark, corpus_df):
    model = fit_bpe(corpus_df, n_merges=10)
    got = {
        r["word"]: (tuple(r["syms"]), r["cnt"])
        for r in model.words.collect()
    }
    _, ref_vocab = _ref_fit(CORPUS, 10)
    want = {"".join(s): (s, c) for s, c in ref_vocab.items()}
    assert got == want
    model.words.unpersist()


def test_early_stop_when_pairs_exhausted(spark):
    df = spark.createDataFrame([(0, "ab ab ab cd")], "doc_id int, text string")
    # only 2 productive merges exist: (a,b) then (c,d)
    model = fit_bpe(df, n_merges=50)
    got = [(m["left_sym"], m["right_sym"], m["pair_count"]) for m in model.merges]
    assert got == [("a", "b", 3), ("c", "d", 1)]
    model.words.unpersist()


def test_min_count_stops_low_frequency_merges(spark, corpus_df):
    full = fit_bpe(corpus_df, n_merges=10)
    gated = fit_bpe(corpus_df, n_merges=10, min_count=5)
    full_counts = [m["pair_count"] for m in full.merges]
    gated_counts = [m["pair_count"] for m in gated.merges]
    assert all(c >= 5 for c in gated_counts)
    assert gated_counts == full_counts[: len(gated_counts)]
    # the reference agrees on where the cut lands
    want, _ = _ref_fit(CORPUS, 10, min_count=5)
    assert len(gated.merges) == len(want)
    full.words.unpersist()
    gated.words.unpersist()


def test_token_counts_match_reference(spark, corpus_df):
    model = fit_bpe(corpus_df, n_merges=6)
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in token_counts(corpus_df, model).collect()
    }
    _, ref_vocab = _ref_fit(CORPUS, 6)
    ref_len = {"".join(s): len(s) for s in ref_vocab}
    want = {}
    for i, t in enumerate(CORPUS):
        ws = re.findall("[a-z]+", t.lower())
        want[i] = (len(ws), sum(ref_len[w] for w in ws))
    assert got == want
    model.words.unpersist()


def test_token_counts_unseen_words_fall_back_to_chars(spark, corpus_df):
    model = fit_bpe(corpus_df, n_merges=4)
    other = spark.createDataFrame(
        [(99, "zzyzx qqq")], "doc_id int, text string"
    )
    row = token_counts(other, model).collect()[0]
    assert (row["n_words"], row["n_tokens"]) == (2, 8)
    model.words.unpersist()


def test_merges_df_schema_and_order(spark, corpus_df):
    model = fit_bpe(corpus_df, n_merges=5)
    df = merges_df(spark, model)
    assert [f.name for f in df.schema.fields] == [
        "step",
        "left_sym",
        "right_sym",
        "pair_count",
    ]
    steps = [r["step"] for r in df.orderBy("step").collect()]
    assert steps == list(range(1, len(model.merges) + 1))
    model.words.unpersist()


def test_zero_merges_and_empty_corpus(spark):
    df = spark.createDataFrame([(0, "some text")], "doc_id int, text string")
    model = fit_bpe(df, n_merges=0)
    assert model.merges == []
    model.words.unpersist()
    empty = spark.createDataFrame([(0, "123 456 !!")], "doc_id int, text string")
    model = fit_bpe(empty, n_merges=3)
    assert model.merges == []  # no [a-z]+ pretokens at all
    model.words.unpersist()


def test_validation_errors(spark, corpus_df):
    with pytest.raises(ValueError):
        fit_bpe(corpus_df, n_merges=-1)
    with pytest.raises(ValueError):
        fit_bpe(corpus_df, checkpoint_every=0)


def test_checkpoint_every_does_not_change_results(spark, corpus_df):
    a = fit_bpe(corpus_df, n_merges=7, checkpoint_every=2)
    b = fit_bpe(corpus_df, n_merges=7, checkpoint_every=100)
    assert a.merges == b.merges
    a.words.unpersist()
    b.words.unpersist()


# ------------------------------------------------------- greedy-apply property
def test_apply_merge_matches_reference_greedy(spark):
    """Seeded sweep over adversarial symbol sequences (overlap runs,
    multi-char symbols that embed the pair, empties) — ONE Spark job,
    per-row compare against the independent greedy reference."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(0x5EED)
    alphabet = ["a", "b", "c", "ab", "ba", "aa", "abc"]
    cases = [[], ["a"], ["a", "b"], ["a", "a", "a", "a"], ["ab", "a", "b"]]
    for _ in range(300):
        cases.append([rng.choice(alphabet) for _ in range(rng.randrange(0, 13))])
    pairs = [("a", "b"), ("a", "a"), ("ab", "a"), ("b", "c"), ("ab", "abc")]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(cases)], "i int, syms array<string>"
    )
    for left, right in pairs:
        got = {
            r["i"]: tuple(r["m"])
            for r in df.select(
                "i", apply_merge(F.col("syms"), left, right).alias("m")
            ).collect()
        }
        for i, syms in enumerate(cases):
            assert got[i] == _ref_merge_word(tuple(syms), (left, right)), (
                syms,
                left,
                right,
            )


# ------------------------------------------------------------------ plan shape
def test_trainer_plan_is_pure_column_algebra(spark, corpus_df):
    """No Python evaluation node anywhere in the trainer's per-row paths."""
    from mashing_pumpkins_spark.operators.bpe import _pair_counts, pretoken_words
    from pyspark.sql import functions as F

    words = pretoken_words(corpus_df).withColumn("syms", F.split("word", ""))
    merged = words.withColumn("syms", apply_merge(F.col("syms"), "t", "h"))
    for df in (words, _pair_counts(words), merged):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan
        assert "BatchEvalPython" not in plan
        assert "FlatMapGroupsInPandas" not in plan


def test_fit_bpe_driver_path_equals_distributed(spark, corpus_df):
    """Round-8 cost dispatch: the driver-side merge loop (vocab under
    FIT_DRIVER_MAX_WORDS) must produce the identical merge list AND final
    word table as the distributed one-job-per-merge loop."""
    fast = fit_bpe(corpus_df, n_merges=10)  # driver path (tiny vocab)
    slow = fit_bpe(corpus_df, n_merges=10, driver_max_words=0)  # distributed
    fm = [(m["step"], m["left_sym"], m["right_sym"], m["pair_count"]) for m in fast.merges]
    sm = [(m["step"], m["left_sym"], m["right_sym"], m["pair_count"]) for m in slow.merges]
    assert fm == sm
    fw = {r["word"]: (tuple(r["syms"]), r["cnt"]) for r in fast.words.collect()}
    sw = {r["word"]: (tuple(r["syms"]), r["cnt"]) for r in slow.words.collect()}
    assert fw == sw
    fast.words.unpersist()
    slow.words.unpersist()


def test_fit_bpe_driver_path_rejects_non_bmp(spark):
    """A non-BMP pretoken (astral-plane char) must keep the distributed
    path — Java split('') yields surrogate halves there, so the Python
    loop could diverge and must decline."""
    from mashing_pumpkins_spark.operators.bpe import _fit_bpe_driver

    assert _fit_bpe_driver([("a\U0001D54Ab", 2)], 4, 1) is None
