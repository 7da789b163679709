"""BPE-trainer scale probe: 128 merges over a 1M-doc corpus with a
~50k-word vocabulary.

The sf* documents tables have a ~31-word vocabulary, so the gate queries
exercise the trainer's semantics but not its scale shape.  This probe
builds a corpus whose vocabulary is ~50k distinct synthetic words drawn
log-uniformly (Zipf-ish) — all generation is JVM Column algebra, no
Python per row — then:

1. times fit_bpe(n_merges=128): the ONE corpus pass (explode ~120M word
   occurrences -> groupBy) vs the 128 word-table iterations, reported
   separately, so the "training cost is independent of corpus size after
   the first pass" claim is measured, not asserted;
2. cross-checks ALL 128 learned merges (order, pair, count) against the
   independent driver-side Sennrich reference from tests/test_bpe.py run
   on the collected word-count table;
3. times the encode pass (token_counts broadcast join over the corpus).

Writes BENCH/r7_bpe_probe.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DOCS = int(os.environ.get("BPE_DOCS", "1000000"))
WORDS_PER_DOC = int(os.environ.get("BPE_WORDS", "120"))
VOCAB = int(os.environ.get("BPE_VOCAB", "50000"))
N_MERGES = int(os.environ.get("BPE_MERGES", "128"))
CPUS = int(os.environ.get("BPE_CPUS", "16"))
WORK = os.environ.get("BPE_WORKDIR", "/tmp/bpe_probe")


def _ref_fit_from_counts(word_counts, n_merges):
    """Independent Sennrich reference (same as tests/test_bpe.py) fed a
    word->count dict directly."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for step in range(1, n_merges + 1):
        stats = {}
        for syms, cnt in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                stats[p] = stats.get(p, 0) + cnt
        if not stats:
            break
        cnt, left, right = max((c, p[0], p[1]) for p, c in stats.items())
        merges.append((step, left, right, cnt))
        nv = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + c
        vocab = nv
    return merges


def main() -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from mashing_pumpkins_spark.operators.bpe import fit_bpe, token_counts

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(4 * CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "4m")
        .config("spark.driver.memory", "32g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    corpus = os.path.join(WORK, f"docs_{N_DOCS}.parquet")
    # _SUCCESS, not the directory: a killed run leaves a partial dir
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        # word rank: log-uniform over [0, VOCAB) (Zipf-ish head/tail);
        # spelling: 3-8 letters in [a-p] from md5(rank) — pure Column
        # algebra end to end, so generation is JVM-side and deterministic.
        t0 = time.monotonic()
        u = lambda d, j: (
            F.pmod(F.xxhash64(d, j, F.lit(42)), F.lit(1_000_000)).cast("double")
            / 1_000_000.0
        )
        rank = lambda d, j: F.floor(
            F.exp(u(d, j) * float(__import__("math").log(VOCAB)))
        ).cast("long")
        spell = lambda r: F.concat(
            F.substring(
                F.translate(F.md5(r.cast("string")), "0123456789", "ghijklmnop"),
                1,
                3,
            ),
            F.substring(
                F.translate(
                    F.md5(F.concat(r.cast("string"), F.lit("x"))),
                    "0123456789",
                    "ghijklmnop",
                ),
                1,
                5,
            ),
        )
        d = F.col("id")
        words = F.transform(
            F.sequence(F.lit(0), F.lit(WORDS_PER_DOC - 1)),
            lambda j: F.substring(
                spell(rank(d, j)), 1, (F.pmod(rank(d, j), F.lit(6)) + 3).cast("int")
            ),
        )
        (
            spark.range(N_DOCS)
            .repartition(4 * CPUS)
            .select(
                F.col("id").alias("doc_id"),
                F.concat_ws(" ", words).alias("text"),
            )
            .write.mode("overwrite")
            .parquet(corpus)
        )
        print(f"corpus written in {time.monotonic() - t0:.1f}s: {corpus}", flush=True)

    docs = spark.read.parquet(corpus)

    # --- fit: corpus pass vs iterations, timed separately -------------
    from mashing_pumpkins_spark.operators.bpe import pretoken_words

    t0 = time.monotonic()
    base = pretoken_words(docs).withColumn("syms", F.split("word", "")).persist()
    vocab_rows = base.count()
    corpus_pass_s = time.monotonic() - t0
    print(f"corpus pass: {corpus_pass_s:.1f}s, vocab={vocab_rows}", flush=True)

    t0 = time.monotonic()
    model = fit_bpe(docs, n_merges=N_MERGES, checkpoint_every=8)
    fit_total_s = time.monotonic() - t0
    # fit_bpe re-ran the (cached-parquet) corpus pass itself; the
    # iteration cost is the remainder beyond the measured corpus pass.
    iter_s = max(0.0, fit_total_s - corpus_pass_s)
    print(
        f"fit: {fit_total_s:.1f}s total, {len(model.merges)} merges, "
        f"~{iter_s / max(1, len(model.merges)):.2f}s/merge",
        flush=True,
    )

    # --- reference cross-check on the collected word table ------------
    t0 = time.monotonic()
    counts = {r["word"]: r["cnt"] for r in base.select("word", "cnt").collect()}
    ref = _ref_fit_from_counts(counts, N_MERGES)
    got = [
        (m["step"], m["left_sym"], m["right_sym"], m["pair_count"])
        for m in model.merges
    ]
    merges_match = got == ref
    ref_s = time.monotonic() - t0
    print(f"reference fit+compare: {ref_s:.1f}s match={merges_match}", flush=True)
    if not merges_match:
        for a, b in zip(got, ref):
            if a != b:
                print(f"  first divergence: spark={a} ref={b}", flush=True)
                break
    base.unpersist()

    # --- encode pass ---------------------------------------------------
    t0 = time.monotonic()
    enc = token_counts(docs, model)
    n_docs_enc, total_tokens = enc.agg(
        F.count(F.lit(1)), F.sum("n_tokens")
    ).collect()[0]
    encode_s = time.monotonic() - t0
    print(
        f"encode: {encode_s:.1f}s, {n_docs_enc} docs, {total_tokens} tokens",
        flush=True,
    )

    out = {
        "probe": "bpe_train_1m",
        "n_docs": N_DOCS,
        "words_per_doc": WORDS_PER_DOC,
        "vocab_rows": int(vocab_rows),
        "n_merges": len(model.merges),
        "corpus_pass_s": round(corpus_pass_s, 2),
        "fit_total_s": round(fit_total_s, 2),
        "s_per_merge": round(iter_s / max(1, len(model.merges)), 3),
        "fit_docs_per_s": round(N_DOCS / fit_total_s, 1),
        "encode_s": round(encode_s, 2),
        "encode_docs_per_s": round(N_DOCS / encode_s, 1),
        "total_tokens": int(total_tokens),
        "merges_match_reference": bool(merges_match),
        "cpus": CPUS,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "r7_bpe_probe.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out), flush=True)
    spark.stop()
    return 0 if merges_match else 1


if __name__ == "__main__":
    raise SystemExit(main())
