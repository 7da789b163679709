"""Suffix-array-style substring dedup: minimizer guarantee + exact-set
verification (operators/substring.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from mashing_pumpkins_spark.operators.substring import (
    _extend_match,
    anchor_table,
    minimizer_anchors,
    substring_duplicate_pairs,
)


def _rand_bytes(rng, n):
    return bytes(rng.integers(32, 127, size=n, dtype=np.uint8).tolist())


def test_minimizer_anchors_are_content_defined():
    """Two docs embedding the same region at different offsets must select
    at least one identical anchor inside it (the winnowing guarantee)."""
    rng = np.random.default_rng(5)
    shared = _rand_bytes(rng, 64)
    k, w = 32, 33  # min_len = k + w - 1 = 64
    for trial in range(10):
        a = _rand_bytes(rng, rng.integers(100, 400)) + shared + _rand_bytes(rng, rng.integers(100, 400))
        b = _rand_bytes(rng, rng.integers(100, 400)) + shared + _rand_bytes(rng, rng.integers(100, 400))
        pa, ha = minimizer_anchors(a, k, w)
        pb, hb = minimizer_anchors(b, k, w)
        common = set(ha.tolist()) & set(hb.tolist())
        assert common, trial
        # and a common anchor lies inside the shared region in both docs
        ia, ib = a.index(shared), b.index(shared)
        wins_a = {a[p : p + k] for p in pa if ia <= p <= ia + 64 - k}
        wins_b = {b[p : p + k] for p in pb if ib <= p <= ib + 64 - k}
        assert wins_a & wins_b, trial


def test_minimizer_short_doc_single_anchor():
    pos, h = minimizer_anchors(b"x" * 40, 32, 33)
    assert pos.shape == (1,) and h.shape == (1,)


def test_extend_match():
    a = b"aaaaHELLOWORLDzzzz"
    b = b"bbHELLOWORLDyy"
    # seed: 4-byte match at a[4:8] == b[2:6] ("HELL")
    assert _extend_match(a, b, 4, 2, 4) == (0, len(b"HELLOWORLD"))
    assert _extend_match(a, a, 0, 0, 4) == (0, len(a))
    # seed in the middle: left extension reported
    assert _extend_match(a, b, 8, 6, 4) == (4, len(b"HELLOWORLD"))


@pytest.fixture(scope="module")
def planted_docs(spark):
    rng = np.random.default_rng(23)
    shared_long = _rand_bytes(rng, 120).decode("latin-1")  # >= min_len
    shared_short = _rand_bytes(rng, 40).decode("latin-1")  # < min_len
    def noise(n):
        return _rand_bytes(rng, n).decode("latin-1")
    rows = {
        "doc_id": list(range(8)),
        "text": [
            noise(200) + shared_long + noise(150),   # 0 <-> 1: long share
            noise(180) + shared_long + noise(220),
            noise(200) + shared_short + noise(200),  # 2 <-> 3: short only
            noise(150) + shared_short + noise(250),
            noise(400),                              # 4, 5: unrelated
            noise(380),
            shared_long + noise(100),                # 6: long share at offset 0
            noise(50),                               # 7: shorter than min_len
        ],
    }
    return spark.createDataFrame(pd.DataFrame(rows))


def test_substring_pairs_exact_set(spark, planted_docs):
    got = {
        (r["id_a"], r["id_b"]): r["max_match_len"]
        for r in substring_duplicate_pairs(
            planted_docs, min_len=64, k=32, anchor_df_cap=None
        ).collect()
    }
    assert set(got) == {(0, 1), (0, 6), (1, 6)}, got
    assert all(v >= 120 for v in got.values()), got


def test_anchor_table_skips_short_docs(spark, planted_docs):
    anchors = anchor_table(planted_docs, min_len=64, k=32)
    ids = {r["id"] for r in anchors.select("id").distinct().collect()}
    assert 7 not in ids  # 50 bytes < min_len: cannot hold a 64-byte match
    assert {0, 1, 2, 3, 4, 5, 6} <= ids
    # every anchor hash must really be the xxh64 of the doc's bytes at that
    # position (the window payload itself no longer rides the shuffle)
    from mashing_pumpkins_spark.hashkernels import xxh64

    rows = anchors.where(anchors.id == 0).collect()
    text0 = planted_docs.where("doc_id = 0").first()["text"].encode("utf-8")
    for r in rows:
        expect = np.uint64(xxh64(text0[r["pos"] : r["pos"] + 32], 0))
        assert np.int64(r["anchor_hash"]).view(np.uint64) == expect


def test_substring_pairs_string_ids(spark, planted_docs):
    """Caller id dtype flows through end to end: string ids (urls) must
    work, and zero-padded numeric strings must NOT collide ('007' != '7')."""
    from pyspark.sql import functions as F

    urls = planted_docs.select(
        F.concat(F.lit("https://x/"), F.lpad(F.col("doc_id").cast("string"), 3, "0")).alias("url"),
        "text",
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in substring_duplicate_pairs(
            urls, min_len=64, k=32, id_col="url", anchor_df_cap=None
        ).collect()
    }
    assert got == {
        ("https://x/000", "https://x/001"),
        ("https://x/000", "https://x/006"),
        ("https://x/001", "https://x/006"),
    }, got


def test_duplicate_spans_planted(spark, planted_docs):
    """Merged per-doc byte ranges of >= min_len shared substrings, checked
    against a brute-force window-coverage oracle."""
    from mashing_pumpkins_spark.operators.substring import duplicate_spans

    got = {}
    for r in duplicate_spans(planted_docs, min_len=64, k=32, anchor_df_cap=None).collect():
        got.setdefault(r["doc_id"], []).append((r["span_start"], r["span_end"]))
    for v in got.values():
        v.sort()

    # brute-force oracle: byte i of doc d covered iff some 64-byte window
    # containing... equivalently window starting at j<=i<j+64 appears in
    # another doc
    texts = {
        r["doc_id"]: r["text"].encode("utf-8") for r in planted_docs.collect()
    }
    L = 64
    expect = {}
    for d, t in texts.items():
        windows_elsewhere = set()
        for d2, t2 in texts.items():
            if d2 == d or len(t2) < L:
                continue
            for j in range(len(t2) - L + 1):
                windows_elsewhere.add(t2[j : j + L])
        covered = np.zeros(len(t), dtype=bool)
        for j in range(max(0, len(t) - L + 1)):
            if t[j : j + L] in windows_elsewhere:
                covered[j : j + L] = True
        spans = []
        i = 0
        while i < len(t):
            if covered[i]:
                j = i
                while j < len(t) and covered[j]:
                    j += 1
                spans.append((i, j))
                i = j
            else:
                i += 1
        if spans:
            expect[d] = spans
    assert got == expect, (got, expect)


def test_remove_duplicate_spans(spark, planted_docs):
    """Cleaning pass: duplicated ranges are cut, everything else is
    byte-identical; removed_bytes accounts exactly."""
    from mashing_pumpkins_spark.operators.substring import (
        duplicate_spans,
        remove_duplicate_spans,
    )

    spans = {}
    for r in duplicate_spans(planted_docs, min_len=64, k=32, anchor_df_cap=None).collect():
        spans.setdefault(r["doc_id"], []).append((r["span_start"], r["span_end"]))
    cleaned = {
        r["doc_id"]: (r["text"], r["removed_bytes"])
        for r in remove_duplicate_spans(
            planted_docs, min_len=64, k=32, anchor_df_cap=None
        ).collect()
    }
    original = {r["doc_id"]: r["text"] for r in planted_docs.collect()}
    assert set(cleaned) == set(original)
    for d, text in original.items():
        got_text, removed = cleaned[d]
        if d not in spans:
            assert got_text == text and removed == 0, d
            continue
        data = text.encode("utf-8")
        kept, pos = [], 0
        for s, e in sorted(spans[d]):
            kept.append(data[pos:s])
            pos = e
        kept.append(data[pos:])
        assert got_text == b"".join(kept).decode("utf-8"), d
        assert removed == sum(e - s for s, e in spans[d]), d
        # the planted 120-byte shared block is gone
        assert removed >= 120, d
