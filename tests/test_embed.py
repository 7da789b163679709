"""Signed hashed-TF document embeddings (functions/embed.py) and the
text-composed SemDedup pass (operators/semdedup.semantic_text_dedup).

The heavyweight check is an independent Python replay of the documented
hash/bucket/sign/floor-div semantics; the DuckDB SQL replay lives in
the `doc_embedding` / `semdedup_text_prune` gate oracles."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from mashing_pumpkins_spark.functions.embed import (
    EMBED_SCALE,
    hashed_doc_embedding,
    token_bucket_sign,
)
from mashing_pumpkins_spark.operators.semdedup import semantic_text_dedup


def _py_embed(text: str, dim: int, scale: int = EMBED_SCALE) -> list[int]:
    t = text.strip().lower()
    words = t.split() if t else []
    sums = [0] * dim
    for w in words:
        h = hashlib.md5(w.encode("utf-8")).hexdigest()
        b = int(h[:8], 16) % dim
        s = 1 if int(h[8:16], 16) % 2 == 0 else -1
        sums[b] += s
    n = len(words)
    if n == 0:
        return [0] * dim
    out = []
    for s in sums:
        a = s * scale
        out.append((a - (((a % n) + n) % n)) // n)
    return out


TEXTS = [
    "The quick brown fox jumps over the lazy dog",
    "the the the the the",
    "",
    "   ",
    "one",
    "Mixed CASE tokens repeat repeat REPEAT",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z",
    "unicode tøken ünïcode tøken",
]


def test_embedding_matches_python_replay(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], "id long, text string")
    for dim in (4, 16, 64):
        got = {
            r["id"]: [int(v) for v in r["e"]]
            for r in df.select(
                "id", hashed_doc_embedding(F.col("text"), dim=dim).alias("e")
            ).collect()
        }
        for i, t in enumerate(TEXTS):
            assert got[i] == _py_embed(t, dim), (dim, t)


def test_embedding_components_are_integer_valued_and_bounded(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], "id long, text string")
    rows = df.select(hashed_doc_embedding(F.col("text"), dim=8).alias("e")).collect()
    for r in rows:
        assert len(r["e"]) == 8
        for v in r["e"]:
            assert float(v) == int(v)  # exactly integer-valued floats
            assert abs(v) <= EMBED_SCALE


def test_embedding_scale_invariant_under_self_concat(spark):
    """doc+doc has identical token frequencies -> identical embedding
    (the property that makes exact duplicates embed at cosine 1)."""
    base = "alpha beta beta gamma gamma gamma delta"
    df = spark.createDataFrame(
        [(0, base), (1, base + " " + base)], "id long, text string"
    )
    got = [
        [int(v) for v in r["e"]]
        for r in df.orderBy("id")
        .select(hashed_doc_embedding(F.col("text"), dim=16).alias("e"))
        .collect()
    ]
    assert got[0] == got[1]


def test_token_bucket_sign_ranges(spark):
    df = spark.createDataFrame([(w,) for w in "a b c d e f g h".split()], "w string")
    rows = df.select(token_bucket_sign(F.col("w"), 5).alias("bs")).collect()
    for r in rows:
        assert 0 <= r["bs"]["b"] < 5
        assert r["bs"]["s"] in (1, -1)


def test_embedding_validation():
    with pytest.raises(ValueError):
        hashed_doc_embedding(F.lit("x"), dim=0)
    with pytest.raises(ValueError):
        hashed_doc_embedding(F.lit("x"), scale=0)


def test_semantic_text_dedup_prunes_exact_copies(spark):
    """200 distinct random-token docs + exact copies of the first 40
    under id+1000: every copy pair must lose exactly one side; no
    distinct doc may be pruned at tau=0.98."""
    import random

    rng = random.Random(11)
    vocab = [f"tok{j}" for j in range(500)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(60))) for i in range(200)
    ]
    copies = [(i + 1000, t) for i, t in docs[:40]]
    df = spark.createDataFrame(docs + copies, "doc_id long, text string")
    out = semantic_text_dedup(
        df, n_clusters=6, tau_ppm=980_000, n_iters=2, dim=64
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(by_id) == 240
    for i in range(40):
        a, b = by_id[i], by_id[i + 1000]
        # identical token multisets embed identically -> same cluster
        assert a["cluster_id"] == b["cluster_id"], i
        assert a["kept"] != b["kept"], i  # exactly one side pruned
    removed = {i for i, r in by_id.items() if not r["kept"]}
    planted = set(range(40)) | set(range(1000, 1040))
    assert removed <= planted, f"false positives: {sorted(removed - planted)[:5]}"


def test_semantic_text_dedup_string_ids(spark):
    df = spark.createDataFrame(
        [("u1", "apple banana cherry"), ("u2", "apple banana cherry")],
        "doc_id string, text string",
    )
    out = semantic_text_dedup(df, n_clusters=1, n_iters=1, dim=8).collect()
    kept = {r["doc_id"]: r["kept"] for r in out}
    assert sorted(kept) == ["u1", "u2"]
    assert sum(kept.values()) == 1  # one survivor of the identical pair


def test_arrow_backend_equals_column_backend(spark):
    """Both embed_documents backends must produce IDENTICAL integers —
    including Java-\\s whitespace edges (tab-leading text keeps a
    leading empty token, NBSP stays inside a token, trailing
    whitespace KEEPS its empty token — Java split limit -1) and
    unicode case folds."""
    from mashing_pumpkins_spark.functions.embed import embed_documents

    nasty = TEXTS + [
        "\tleading tab",          # leading empty token after space-trim
        "trailing tab\t",         # trailing empty token KEPT (limit -1)
        "nbsp joined token", # NBSP is NOT Java \s: stays in-token
        "a b c",
        "UPPER Lower MiXeD",
        "\t",                     # one empty token
        None,                     # null text -> zero vector
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(nasty)], "doc_id long, text string"
    )
    for dim in (8, 64):
        col = {
            r["doc_id"]: [int(v) for v in r["embedding"]]
            for r in embed_documents(df, dim=dim, backend="column").collect()
        }
        arr = {
            r["doc_id"]: [int(v) for v in r["embedding"]]
            for r in embed_documents(df, dim=dim, backend="arrow").collect()
        }
        assert col == arr, (dim, {k: (col[k], arr[k]) for k in col if col[k] != arr[k]})


def test_embed_documents_backend_validation(spark):
    from mashing_pumpkins_spark.functions.embed import embed_documents

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        embed_documents(df, backend="gpu")
    with _pytest.raises(ValueError):
        embed_documents(df, dim=0, backend="arrow")


def test_semantic_text_dedup_equal_across_embed_backends(spark):
    import random

    rng = random.Random(3)
    vocab = [f"w{j}" for j in range(300)]
    docs = [(i, " ".join(rng.choice(vocab) for _ in range(40))) for i in range(80)]
    docs += [(i + 500, t) for i, t in docs[:10]]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    outs = []
    for be in ("column", "arrow"):
        rows = semantic_text_dedup(
            df, n_clusters=4, n_iters=1, dim=32, embed_backend=be
        ).collect()
        outs.append(sorted((r["doc_id"], r["cluster_id"], r["dist2"], r["kept"]) for r in rows))
    assert outs[0] == outs[1]
