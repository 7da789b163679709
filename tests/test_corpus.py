"""Corpus-curation operators: passage dedup, decontamination, repetition
stats, deterministic hash sampling — value semantics + plan guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mashing_pumpkins_spark.operators.corpus import (
    decontaminate,
    hash_sample_flag,
    hash_sample_stats,
    passage_dedup_stats,
    repetition_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_passage_dedup_counts_and_fractions(spark):
    # 40 words -> 3 passages of 16/16/8; doc 2 repeats doc 1's text exactly;
    # doc 3 is unique
    words = " ".join(f"w{i}" for i in range(40))
    unique = " ".join(f"u{i}" for i in range(20))
    out = passage_dedup_stats(
        _docs(spark, [(1, words, "s"), (2, words, "s"), (3, unique, "s")]),
        passage_words=16,
    ).collect()
    by_id = {r.doc_id: r for r in out}
    assert by_id[1].n_passages == 3 and by_id[1].n_dup_passages == 3
    assert by_id[1].dup_frac == 1.0 and by_id[2].dup_frac == 1.0
    assert by_id[3].n_passages == 2 and by_id[3].n_dup_passages == 0


def test_passage_dedup_counts_repeats_within_one_doc(spark):
    # a 16-word passage repeated twice inside ONE doc is corpus-duplicated
    p = " ".join(f"x{i}" for i in range(16))
    out = passage_dedup_stats(
        _docs(spark, [(1, p + " " + p, "s")]), passage_words=16
    ).collect()
    assert out[0].n_passages == 2 and out[0].n_dup_passages == 2


def test_decontaminate_flags_shared_ngrams_only(spark):
    bench = _docs(spark, [(100, "alpha beta gamma delta epsilon", "b")])
    train = _docs(
        spark,
        [
            (1, "zzz alpha beta gamma delta yyy", "t"),  # shares 4-gram
            (2, "alpha beta qqq gamma delta", "t"),  # shares words, no 4-gram
            (3, "totally different words here now", "t"),
        ],
    )
    out = {r.doc_id: r for r in decontaminate(train, bench, n=4).collect()}
    assert out[1].contaminated == 1 and out[1].n_overlap == 1
    assert out[2].contaminated == 0 and out[3].contaminated == 0


def test_decontaminate_counts_distinct_overlaps(spark):
    # the shared 4-gram appears twice in the train doc but counts once
    bench = _docs(spark, [(100, "a b c d", "b")])
    train = _docs(spark, [(1, "a b c d x a b c d", "t")])
    out = decontaminate(train, bench, n=4).collect()
    assert out[0].n_overlap == 1


def test_repetition_stats_hand_computed(spark):
    # words: a a a b -> n=4, distinct=2, top word a=3
    # 2-grams: "a a","a a","a b" -> top "a a"=2 of 3
    out = repetition_stats(_docs(spark, [(1, "a a a b", "s")])).collect()[0]
    assert out.n_words == 4
    assert out.distinct_word_ratio == 0.5
    assert out.top_word_frac == 0.75
    assert out.top_2gram_frac == round(2 / 3, 6)


def test_repetition_stats_single_word_has_no_2grams(spark):
    out = repetition_stats(_docs(spark, [(1, "solo", "s")])).collect()[0]
    assert out.n_words == 1 and out.top_2gram_frac == 0.0


def test_hash_sample_is_deterministic_and_near_rate(spark):
    docs = _docs(spark, [(i, f"document number {i}", f"src{i % 4}") for i in range(500)])
    a = hash_sample_stats(docs, threshold_hex="1999").collect()
    b = hash_sample_stats(docs, threshold_hex="1999").collect()
    assert a == b
    total = sum(r.n_sampled for r in a)
    # 0x1999/0x10000 ~ 10%; binomial(500, .1) within [20, 90] w.p. ~1-1e-6
    assert 20 <= total <= 90


def test_hash_sample_flag_validates_threshold(spark):
    with pytest.raises(ValueError):
        hash_sample_flag(F.col("text"), threshold_hex="xyz")
    with pytest.raises(ValueError):
        hash_sample_flag(F.col("text"), threshold_hex="")


def test_window_size_parameters_are_validated(spark):
    """passage_words=0 / n=0 would silently yield empty stats via a null
    sequence — they must raise instead."""
    from mashing_pumpkins_spark.operators.corpus import passage_array, word_gram_array

    with pytest.raises(ValueError):
        passage_array(F.col("w"), 0)
    with pytest.raises(ValueError):
        word_gram_array(F.col("w"), 0)
    with pytest.raises(ValueError):
        passage_dedup_stats(_docs(spark, [(1, "a b", "s")]), passage_words=-1)


def test_decontaminate_against_itself_flags_every_gram_bearing_doc(spark):
    docs = _docs(
        spark,
        [(i, " ".join(f"w{(i * 3 + j) % 40}" for j in range(10)), "s") for i in range(30)],
    )
    out = decontaminate(docs, docs, n=4).collect()
    assert all(r.contaminated == 1 for r in out)


def test_passage_dedup_on_doubled_corpus_is_all_dup(spark):
    rows = [(i, " ".join(f"w{(i * 5 + j) % 60}" for j in range(40)), "s") for i in range(20)]
    doubled = rows + [(i + 100, t, s) for i, t, s in rows]
    out = passage_dedup_stats(_docs(spark, doubled)).collect()
    assert all(r.dup_frac == 1.0 for r in out)


def test_curation_funnel_drops_each_planted_defect(spark):
    """One doc per failure mode; each stage removes exactly its target."""
    from mashing_pumpkins_spark.operators.curation import curation_funnel

    passage = " ".join(f"p{i}" for i in range(16))
    good = lambda i: " ".join(f"g{i}x{j}" for j in range(30))  # noqa: E731
    rows = [
        (1, good(1), "s"),
        (2, good(2), "s"),
        (3, "too short", "s"),  # fails quality (len < 100 chars)
        (4, good(1), "s"),  # exact dup of doc 1 (same text)
        (5, passage + " " + passage, "s"),  # all passages duplicated
        (6, "zz alpha beta gamma delta qq " + good(6), "s"),  # contaminated
    ]
    bench = _docs(spark, [(100, "alpha beta gamma delta", "b")])
    funnel, survivors = curation_funnel(_docs(spark, rows), bench)
    counts = {r.stage: r.n_docs for r in funnel.collect()}
    assert counts == {
        "input": 6,
        "quality_filter": 5,
        "exact_dedup": 4,
        "passage_dedup": 3,
        "decontamination": 2,
    }
    assert sorted(r.doc_id for r in survivors.collect()) == [1, 2]


def test_curation_funnel_lm_stage_cuts_out_of_distribution_doc(spark):
    """The CCNet-style LM stage: a doc whose bigrams are all OOV against
    the reference model lands in the tail band and is cut; an in-vocab
    doc scores head and flows through to the survivor set."""
    from mashing_pumpkins_spark.operators.curation import curation_funnel

    ref_seq = " ".join(f"w{i}" for i in range(60))
    lm_ref = _docs(spark, [(100 + k, ref_seq, "r") for k in range(5)])
    good = " ".join(f"w{i}" for i in range(32))  # seen bigrams, p ~ 6/65
    bad = " ".join(f"q{i}" for i in range(32))  # all OOV, p = 1/60
    funnel, survivors = curation_funnel(
        _docs(spark, [(1, good, "s"), (2, bad, "s")]),
        benchmark=None,
        lm_reference=lm_ref,
        lm_head_cut_e6=-3_000_000,
        lm_tail_cut_e6=-3_500_000,
    )
    rows = funnel.orderBy("stage_idx").collect()
    assert [r.stage for r in rows] == [
        "input",
        "quality_filter",
        "lm_filter",
        "exact_dedup",
        "passage_dedup",
    ]
    assert {r.stage: r.n_docs for r in rows} == {
        "input": 2,
        "quality_filter": 2,
        "lm_filter": 1,
        "exact_dedup": 1,
        "passage_dedup": 1,
    }
    assert [r.doc_id for r in survivors.collect()] == [1]


def test_curation_funnel_near_dup_stage_keeps_one_representative(spark):
    from mashing_pumpkins_spark.config import PipelineConfig, SketchConfig
    from mashing_pumpkins_spark.operators.curation import curation_funnel

    base = " ".join(f"tok{j}" for j in range(60))
    near = base.replace("tok59", "changed")  # ~0.97 shingle Jaccard
    rows = [(10, base, "s"), (11, near, "s")] + [
        (20 + i, " ".join(f"d{i}w{j}" for j in range(40)), "s") for i in range(4)
    ]
    cfg = PipelineConfig(
        sketch=SketchConfig(nsize=21, maxsize=1 << 30, hash_name="xxh64", seed=0),
        n_bands=32,
        rows_per_band=8,
        jaccard_threshold=0.8,
    )
    # max_dup_frac=1.0 disables the passage cut (the near pair shares 3 of
    # 4 word windows and would otherwise be removed one stage earlier) so
    # this test isolates the MinHash stage
    funnel, survivors = curation_funnel(
        _docs(spark, rows), None, max_dup_frac=1.0, near_dup=cfg
    )
    counts = {r.stage: r.n_docs for r in funnel.collect()}
    assert counts["passage_dedup"] == 6 and counts["near_dup"] == 5
    ids = sorted(r.doc_id for r in survivors.collect())
    assert ids == [10, 20, 21, 22, 23]  # rep '10' < '11' lexicographically


def test_curation_funnel_semantic_stage_prunes_exact_copy(spark):
    """The semantic (SemDedup) stage sits after near_dup and prunes one
    side of an exact-copy pair that survives everything upstream; its
    counts equal a standalone semantic_text_dedup run on the same
    survivors."""
    from mashing_pumpkins_spark.operators.curation import curation_funnel
    from mashing_pumpkins_spark.operators.semdedup import semantic_text_dedup

    # a token PERMUTATION: different text (so exact dedup keeps both) but
    # the same bag of words — exactly what embedding-space dedup catches
    # and text-identity dedup cannot
    base = " ".join(f"tok{j}" for j in range(60))
    perm = " ".join(f"tok{j}" for j in reversed(range(60)))
    rows = [(10, base, "s"), (11, perm, "s")] + [
        (20 + i, " ".join(f"d{i}w{j}" for j in range(40)), "s") for i in range(4)
    ]
    sem = {"n_clusters": 2, "tau_ppm": 980_000, "n_iters": 1, "dim": 32}
    # max_dup_frac=1.0 disables the passage cut so the pair reaches the
    # semantic stage (near_dup off: this isolates the new stage)
    funnel, survivors = curation_funnel(
        _docs(spark, rows), None, max_dup_frac=1.0, semantic=sem
    )
    counts = {r.stage: r.n_docs for r in funnel.collect()}
    assert counts["passage_dedup"] == 6 and counts["semantic"] == 5
    ids = sorted(r.doc_id for r in survivors.collect())
    assert len(ids) == 5 and ids[1:] == [20, 21, 22, 23] and ids[0] in (10, 11)
    # standalone run on the pre-semantic survivor set agrees
    pre = _docs(spark, rows)
    marks = semantic_text_dedup(pre, id_col="doc_id", text_col="text", **sem)
    assert marks.where(F.col("kept")).count() == 5


def test_curation_funnel_semantic_after_near_dup_indexes(spark):
    from mashing_pumpkins_spark.config import PipelineConfig, SketchConfig
    from mashing_pumpkins_spark.operators.curation import curation_funnel

    rows = [(i, " ".join(f"d{i}w{j}" for j in range(40)), "s") for i in range(4)]
    cfg = PipelineConfig(
        sketch=SketchConfig(nsize=21, maxsize=1 << 30, hash_name="xxh64", seed=0),
        n_bands=32,
        rows_per_band=8,
        jaccard_threshold=0.8,
    )
    funnel, survivors = curation_funnel(
        _docs(spark, rows),
        None,
        max_dup_frac=1.0,
        near_dup=cfg,
        semantic={"n_clusters": 1, "n_iters": 1, "dim": 16},
    )
    got = [(r.stage_idx, r.stage) for r in funnel.orderBy("stage_idx").collect()]
    assert got[-2:] == [(len(got) - 2, "near_dup"), (len(got) - 1, "semantic")]
    assert survivors.count() == 4  # nothing similar: both stages no-ops


def test_corpus_ops_tolerate_null_text(spark):
    """Real corpora contain null text; no op may crash, and null docs fall
    out of gram/passage stages the same way empty docs do."""
    rows = [(1, None, "s"), (2, "some regular words here", "s")]
    docs = _docs(spark, rows)
    assert passage_dedup_stats(docs).count() == 2
    assert repetition_stats(docs).count() == 2
    assert decontaminate(docs, docs.where(F.col("doc_id") == 2)).count() == 2
    stats = hash_sample_stats(docs).collect()
    assert sum(r.n_docs for r in stats) == 2


def test_curation_funnel_gate_stages(spark):
    """Round-6 gates: url_filter, robots and quality_classifier slot into
    the cumulative-flag chain, each removing exactly its planted target,
    and survivors keep the url column."""
    from mashing_pumpkins_spark.config import CurationConfig
    from mashing_pumpkins_spark.operators.curation import curation_funnel
    from mashing_pumpkins_spark.sources.robots import parse_robots

    good = lambda i: " ".join(f"g{i}x{j}" for j in range(30))  # noqa: E731
    rows = [
        (1, good(1), "http://ok.com/a"),
        (2, good(2), "http://ads.bad.com/a"),     # url_filter: host blocked
        (3, good(3), "http://ok.com/casino/x"),   # url_filter: path term
        (4, good(4), "http://strict.com/private/x"),  # robots disallows
        (5, good(5), "http://strict.com/pub/x"),  # robots allows
        (6, "spam " * 40, "http://ok.com/b"),     # classifier scores low
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, url string")
    robots = parse_robots(
        spark.createDataFrame(
            [("strict.com", "User-agent: *\nDisallow: /private\n")],
            "host string, body string",
        )
    )
    # weight table: compute every test token's bucket first so collisions
    # with the 'spam' bucket can't randomize the outcome — good-token
    # buckets get +1, spam's bucket -1000, untouched buckets 0
    from mashing_pumpkins_spark.functions.classifier import token_bucket

    n_buckets = 256
    all_tokens = sorted({t for _, text, _ in rows for t in text.split()})
    bdf = spark.createDataFrame([(t,) for t in all_tokens], "tok string")
    buckets = {
        r.tok: r.b
        for r in bdf.select("tok", token_bucket(F.col("tok"), n_buckets).alias("b")).collect()
    }
    assert all(
        buckets[t] != buckets["spam"] for t in all_tokens if t != "spam"
    ), "bucket collision with 'spam' — raise n_buckets"
    weights = [0] * n_buckets
    for t in all_tokens:
        weights[buckets[t]] = 1
    weights[buckets["spam"]] = -1000
    funnel, survivors = curation_funnel(
        docs,
        None,
        id_col="doc_id",
        text_col="text",
        url_col="url",
        blocked_hosts=["bad.com"],
        blocked_path_terms=["casino"],
        robots_rules=robots,
        agent="trainbot",
        classifier_weights=weights,
        classifier_min=0,
    )
    counts = {r.stage: r.n_docs for r in funnel.collect()}
    assert [r.stage for r in funnel.orderBy("stage_idx").collect()] == [
        "input", "url_filter", "robots", "quality_filter",
        "quality_classifier", "exact_dedup", "passage_dedup",
    ]
    assert counts["input"] == 6
    assert counts["url_filter"] == 4      # drops 2 (host) and 3 (path)
    assert counts["robots"] == 3          # drops 4
    assert counts["quality_filter"] == 3
    assert counts["quality_classifier"] == 2  # drops 6
    got = {r.doc_id: r.url for r in survivors.collect()}
    assert got == {1: "http://ok.com/a", 5: "http://strict.com/pub/x"}
    # CurationConfig hashes the knobs; gates-off config reproduces the
    # legacy hashable surface
    c1 = CurationConfig(blocked_hosts=("bad.com",), url_col="url")
    c2 = CurationConfig(blocked_hosts=("bad.com", "worse.com"), url_col="url")
    assert c1.config_hash() != c2.config_hash()
    assert CurationConfig().config_hash() == CurationConfig().config_hash()


def test_curation_funnel_gates_require_url_col(spark):
    from mashing_pumpkins_spark.operators.curation import curation_funnel

    docs = spark.createDataFrame([(1, "t")], "doc_id long, text string")
    with pytest.raises(ValueError):
        curation_funnel(docs, None, blocked_hosts=["x.com"])


def test_curation_funnel_without_benchmark_skips_decontamination(spark):
    from mashing_pumpkins_spark.operators.curation import curation_funnel

    docs = _docs(spark, [(i, " ".join(f"d{i}w{j}" for j in range(30)), "s") for i in range(5)])
    funnel, _ = curation_funnel(docs, None)
    stages = [r.stage for r in funnel.collect()]
    assert stages == ["input", "quality_filter", "exact_dedup", "passage_dedup"]


@pytest.fixture(scope="module")
def corpus_frames(spark):
    docs = _docs(
        spark,
        [(i, " ".join(f"w{(i * 7 + j) % 50}" for j in range(40)), f"s{i % 3}") for i in range(60)],
    )
    bench = docs.where(F.col("doc_id") % 10 == 0)
    train = docs.where(F.col("doc_id") % 10 != 0)
    return {
        "passage": passage_dedup_stats(docs),
        "decon": decontaminate(train, bench),
        "repetition": repetition_stats(docs),
        "sample": hash_sample_stats(docs),
    }


@pytest.mark.parametrize("name", ["passage", "decon", "repetition", "sample"])
def test_corpus_plans_stay_jvm_side(corpus_frames, name):
    """No Python evaluation anywhere — these are pure Column-expression
    operators — and no cartesian/BNL joins (the 100TB failure modes)."""
    plan = corpus_frames[name]._jdf.queryExecution().executedPlan().toString()
    for bad in ("ArrowEvalPython", "BatchEvalPython", "FlatMapGroupsInPandas",
                "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert bad not in plan, (name, bad)


def test_decontamination_broadcasts_benchmark_grams(corpus_frames):
    plan = corpus_frames["decon"]._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_gopher_rules_each_rule_kills_its_planted_defect(spark):
    """One crafted doc per rule: fails exactly that rule (plus any rule its
    construction necessarily also breaks), and a clean doc passes all."""
    from mashing_pumpkins_spark.operators.corpus import gopher_rules

    stops = "the and of to is in that for with"
    clean = (" ".join(f"word{i}" for i in range(60)) + " " + stops).strip()
    rows = [
        (0, clean, "s"),
        (1, "too short " + stops, "s"),  # r_nwords
        (2, " ".join("supercalifragilistic" for _ in range(60)) + " " + stops, "s"),  # r_meanlen (mean>10)
        (3, " ".join("12345" for _ in range(60)) + " " + stops, "s"),  # r_alpha
        (4, "\n".join(f"- bullet {i} {stops}" for i in range(60)), "s"),  # r_bullet
        (5, "\n".join(f"line {i} {stops} trails off..." for i in range(60)), "s"),  # r_ellipsis
        (6, " ".join("#" for _ in range(30)) + " " + " ".join(f"w{i}" for i in range(30)) + " " + stops, "s"),  # r_symbol
        (7, " ".join(f"nostop{i}" for i in range(60)), "s"),  # r_stop
    ]
    out = {r["doc_id"]: r for r in gopher_rules(_docs(spark, rows)).collect()}
    assert out[0]["keep"] is True
    assert out[1]["r_nwords"] is False
    assert out[2]["r_meanlen"] is False
    assert out[3]["r_alpha"] is False
    assert out[4]["r_bullet"] is False
    assert out[5]["r_ellipsis"] is False
    assert out[6]["r_symbol"] is False
    assert out[7]["r_stop"] is False
    for d in range(1, 8):
        assert out[d]["keep"] is False


def test_gopher_rules_plan_stays_jvm_side(spark):
    from mashing_pumpkins_spark.operators.corpus import gopher_rules

    df = gopher_rules(_docs(spark, [(1, "a b c", "s")]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    for bad in ("ArrowEvalPython", "BatchEvalPython", "Exchange"):
        assert bad not in plan, bad


def test_decontaminate_bloom_no_false_negatives_and_equality_when_sized(spark):
    """A well-sized bloom must flag EXACTLY the docs the exact operator
    flags (FPR negligible at this scale); any bloom must never miss one."""
    from mashing_pumpkins_spark.operators.corpus import (
        decontaminate,
        decontaminate_bloom,
    )

    shared = "alpha beta gamma delta epsilon"
    rows = [
        (1, f"clean text one with words {' '.join(f'a{i}' for i in range(10))}", "s"),
        (2, f"this doc contains {shared} inside it", "s"),
        (3, "totally different content entirely here now", "s"),
        (4, shared + " again word word", "s"),
    ]
    bench = [(100, f"benchmark includes {shared} somewhere", "s")]
    docs, benchmark = _docs(spark, rows), _docs(spark, bench)
    exact = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(docs, benchmark, n=4).collect()
    }
    sized = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate_bloom(docs, benchmark, n=4, m_bits=1 << 20).collect()
    }
    assert sized == exact and exact[2] == 1 and exact[4] == 1 and exact[1] == 0
    # adversarially tiny bloom: false positives allowed, misses NEVER
    tiny = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate_bloom(docs, benchmark, n=4, m_bits=64).collect()
    }
    assert all(tiny[d] >= exact[d] for d in exact)


def test_decontaminate_bloom_fpr_bounded(spark):
    """At m=2^20 bits / k=4 over a handful of grams, the theoretical FPR
    is ~1e-20 — 200 random clean docs must produce zero false flags."""
    from mashing_pumpkins_spark.operators.corpus import decontaminate_bloom

    import random

    rng = random.Random(7)
    rows = [
        (i, " ".join(f"w{rng.randrange(10**9)}" for _ in range(30)), "s")
        for i in range(200)
    ]
    bench = [(1000, "completely separate benchmark gram stream here", "s")]
    out = decontaminate_bloom(
        _docs(spark, rows), _docs(spark, bench), n=4, m_bits=1 << 20
    ).collect()
    assert sum(r["contaminated"] for r in out) == 0


def test_build_gram_bloom_validation():
    from mashing_pumpkins_spark.operators.corpus import build_gram_bloom

    import numpy as np

    with pytest.raises(ValueError):
        build_gram_bloom(["x"], m_bits=100)  # not a power of two
    arr = build_gram_bloom([], m_bits=1 << 10)
    assert arr.sum() == 0 and arr.dtype == np.uint64


def test_decontaminate_bloom_trailing_newline_docs_no_false_negative(spark):
    """Round-4 review regression: Spark's split(limit=-1) KEEPS trailing
    empty tokens, so '\n'-terminated docs produce grams whose last word is
    '' — the bloom tokenizer must produce the identical gram or it
    false-negatives (web docs routinely end with a newline)."""
    from mashing_pumpkins_spark.operators.corpus import (
        decontaminate,
        decontaminate_bloom,
    )

    rows = [(1, "xx beta gamma delta\n", "s"), (2, "clean words only here", "s")]
    bench = [(100, "qq beta gamma delta\n", "s")]
    docs, benchmark = _docs(spark, rows), _docs(spark, bench)
    exact = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(docs, benchmark, n=4).collect()
    }
    bloom = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate_bloom(docs, benchmark, n=4, m_bits=1 << 20).collect()
    }
    assert exact[1] == 1, "JVM sides must share the trailing-empty gram"
    assert bloom == exact


def test_gopher_rule_columns_language_neutral_overrides(spark):
    """The battery is English-only by default (documented); passing a
    Unicode alpha class + a target-language stoplist admits non-Latin
    documents without changing the zero-shuffle shape."""
    from pyspark.sql import functions as F

    from mashing_pumpkins_spark.operators.corpus import gopher_rule_columns

    ru_words = ["и", "в", "не", "на", "что", "быть", "он", "она", "это"]
    text = " ".join((ru_words * 12)[:100])
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")

    default_rules = dict(gopher_rule_columns(F.col("text")))
    ru_rules = dict(
        gopher_rule_columns(
            F.col("text"), alpha_class=r"\p{L}", stopwords=ru_words[:5]
        )
    )
    row = df.select(
        default_rules["r_alpha"].alias("en_alpha"),
        default_rules["r_stop"].alias("en_stop"),
        ru_rules["r_alpha"].alias("ru_alpha"),
        ru_rules["r_stop"].alias("ru_stop"),
    ).first()
    assert not row["en_alpha"] and not row["en_stop"]  # English battery rejects
    assert row["ru_alpha"] and row["ru_stop"]  # language-aware battery admits


def test_gopher_battery_with_per_language_stoplists(spark):
    """STOPWORDS_BY_LANG routes the battery per language: a German doc
    fails r_stop under the English list but passes with the German one."""
    from pyspark.sql import functions as F

    from mashing_pumpkins_spark.functions.textstats import STOPWORDS_BY_LANG
    from mashing_pumpkins_spark.operators.corpus import gopher_rule_columns

    de_text = " ".join(
        ["der", "hund", "und", "die", "katze", "ist", "nicht", "im", "haus"] * 12
    )[:-1]
    df = spark.createDataFrame([(1, de_text)], "doc_id long, text string")
    en_stop = dict(gopher_rule_columns(F.col("text")))["r_stop"]
    de_stop = dict(
        gopher_rule_columns(F.col("text"), stopwords=STOPWORDS_BY_LANG["de"])
    )["r_stop"]
    row = df.select(en_stop.alias("en"), de_stop.alias("de")).first()
    assert not row["en"] and row["de"]


def test_mixture_sample_budget_math_and_determinism(spark):
    """A source under budget passes whole (rate 1.0, every doc kept); an
    over-budget source is downsampled; the draw is deterministic."""
    from mashing_pumpkins_spark.operators.corpus import mixture_sample

    small = [(i, "alpha beta gamma", "s_small") for i in range(5)]  # 15 tokens
    big = [(100 + i, " ".join(f"w{j}" for j in range(50)), "s_big")
           for i in range(40)]  # 2000 tokens
    docs = _docs(spark, small + big)
    out = mixture_sample(docs, token_budget_per_source=100).collect()
    by = {r["source"]: r for r in out}
    s, b = by["s_small"], by["s_big"]
    assert s["n_tokens"] == 15 and s["rate"] == 1.0
    assert s["kept_docs"] == 5 and s["kept_tokens"] == 15
    assert b["n_tokens"] == 2000 and b["rate"] == 0.05
    assert 0 <= b["kept_docs"] < 40          # downsampled, never whole
    assert b["kept_tokens"] == b["kept_docs"] * 50
    again = mixture_sample(docs, token_budget_per_source=100).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    with pytest.raises(ValueError):
        mixture_sample(docs, token_budget_per_source=0)


def test_mixture_sample_rate_tracks_budget(spark):
    """Doubling the budget doubles the capped rate; at budget >= total the
    source passes whole."""
    from mashing_pumpkins_spark.operators.corpus import mixture_sample

    docs = _docs(
        spark, [(i, " ".join(f"w{j}" for j in range(20)), "s") for i in range(50)]
    )  # 1000 tokens
    r100 = mixture_sample(docs, token_budget_per_source=100).collect()[0]
    r200 = mixture_sample(docs, token_budget_per_source=200).collect()[0]
    full = mixture_sample(docs, token_budget_per_source=5000).collect()[0]
    assert r100["rate"] == 0.1 and r200["rate"] == 0.2
    assert r100["kept_docs"] <= r200["kept_docs"]
    assert full["rate"] == 1.0 and full["kept_docs"] == 50


# ------------------------------------------------------------- line dedup


def _ld(spark, rows, **kw):
    from mashing_pumpkins_spark.operators.corpus import line_dedup

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["clean_text"])
        for r in line_dedup(docs, **kw).collect()
    }


def test_line_dedup_keeps_first_occurrence_corpus_wide(spark):
    boiler = "please subscribe to the newsletter"
    got = _ld(
        spark,
        [
            (0, f"unique line zero\n{boiler}"),
            (1, f"{boiler}\nunique line one"),
            (2, boiler),
        ],
    )
    # doc 0 has the earliest (doc_id, pos) for the boiler line
    assert got[0] == (2, 2, f"unique line zero\n{boiler}")
    assert got[1] == (2, 1, "unique line one")
    assert got[2] == (1, 0, "")  # all lines gone -> empty doc survives as row


def test_line_dedup_short_lines_exempt_and_order_preserved(spark):
    got = _ld(
        spark,
        [
            (0, "--\na duplicated long line here\n--"),
            (1, "--\na duplicated long line here"),
        ],
        min_len=10,
    )
    # '--' kept everywhere (exempt), duplicate long line kept only in doc 0,
    # and surviving lines stay in original order
    assert got[0] == (3, 3, "--\na duplicated long line here\n--")
    assert got[1] == (2, 1, "--")


def test_line_dedup_within_doc_duplicates_collapse(spark):
    got = _ld(spark, [(5, "same long line content\nsame long line content")])
    assert got[5] == (2, 1, "same long line content")


def test_line_dedup_validates_min_len(spark):
    with pytest.raises(ValueError):
        _ld(spark, [(0, "x")], min_len=-1)


def test_line_dedup_plan_has_no_window(spark):
    """The winner-per-line step must stay a partial-aggregating groupBy:
    a `row_number over (partition by line)` window would funnel every
    occurrence of the hottest boilerplate line into one task."""
    from mashing_pumpkins_spark.operators.corpus import line_dedup

    docs = spark.createDataFrame([(0, "a line long enough")], "doc_id long, text string")
    plan = line_dedup(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


# -------------------------------------------------------- sequence packing


def test_pack_sequences_concat_then_chunk_layout(spark):
    from mashing_pumpkins_spark.operators.corpus import pack_sequences

    # tokens: 4, 3, 5, 2 -> cum starts 0,4,7,12; budget 6 ->
    # packs 0,0,1,2 (doc belongs where its FIRST token lands)
    docs = spark.createDataFrame(
        [
            ("s", 0, "a b c d"),
            ("s", 1, "e f g"),
            ("s", 2, "h i j k l"),
            ("s", 3, "m n"),
        ],
        "source string, doc_id long, text string",
    )
    got = {
        (r["source"], r["pack_id"]): (r["n_docs"], r["n_tokens"], r["first_id"], r["last_id"])
        for r in pack_sequences(docs, budget_tokens=6).collect()
    }
    assert got == {
        ("s", 0): (2, 7, 0, 1),
        ("s", 1): (1, 5, 2, 2),
        ("s", 2): (1, 2, 3, 3),
    }


def test_pack_sequences_groups_independent_and_validated(spark):
    from mashing_pumpkins_spark.operators.corpus import pack_sequences

    docs = spark.createDataFrame(
        [("a", 0, "x y"), ("b", 0, "x y")],
        "source string, doc_id long, text string",
    )
    rows = pack_sequences(docs, budget_tokens=1).collect()
    assert {(r["source"], r["pack_id"]) for r in rows} == {("a", 0), ("b", 0)}
    with pytest.raises(ValueError):
        pack_sequences(docs, budget_tokens=0)


def test_curation_funnel_near_dup_checkpointed_matches_flow(spark, tmp_path):
    """Round-7: near_dup_checkpoint_dir routes the composed funnel's
    near-dup stage through the CHECKPOINTED pipeline (resumable, stage
    manifests) — results must equal the flow route, and the checkpoint
    store must actually hold the staged pipeline."""
    import os

    from mashing_pumpkins_spark.config import PipelineConfig, SketchConfig
    from mashing_pumpkins_spark.operators.curation import curation_funnel

    base = " ".join(f"tok{j}" for j in range(60))
    near = base.replace("tok59", "changed")
    rows = [(10, base, "s"), (11, near, "s")] + [
        (20 + i, " ".join(f"d{i}w{j}" for j in range(40)), "s") for i in range(4)
    ]
    cfg = PipelineConfig(
        sketch=SketchConfig(nsize=21, maxsize=1 << 30, hash_name="xxh64", seed=0),
        n_bands=32,
        rows_per_band=8,
        jaccard_threshold=0.8,
    )
    ckpt = str(tmp_path / "nd_ckpt")
    funnel_ck, surv_ck = curation_funnel(
        _docs(spark, rows), None, max_dup_frac=1.0, near_dup=cfg,
        near_dup_checkpoint_dir=ckpt,
    )
    funnel_fl, surv_fl = curation_funnel(
        _docs(spark, rows), None, max_dup_frac=1.0, near_dup=cfg
    )
    assert (
        {(r.stage, r.n_docs) for r in funnel_ck.collect()}
        == {(r.stage, r.n_docs) for r in funnel_fl.collect()}
    )
    assert (
        sorted(r.doc_id for r in surv_ck.collect())
        == sorted(r.doc_id for r in surv_fl.collect())
        == [10, 20, 21, 22, 23]
    )
    assert os.path.isdir(ckpt) and os.listdir(ckpt), "stages must materialize"
