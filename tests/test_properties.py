"""Hypothesis property tests — the reference's own test style
(/root/reference/src/tests/test_minhashsketch.py uses brute-force oracles
over generated inputs) applied to the numpy engine. No Spark session: these
pin the kernel/sketch algebra the distributed operators are built on."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mashing_pumpkins_spark.config import SketchConfig
from mashing_pumpkins_spark.functions.simhash import simhash_batch
from mashing_pumpkins_spark.functions.sketch_np import (
    batch_signatures,
    doc_hashes,
    merge_signatures,
    signature,
)
from mashing_pumpkins_spark.hashkernels import (
    bottomk,
    topk,
    xxh64,
    xxh64_fixed,
    xxh64_sliding,
)
from mashing_pumpkins_spark.operators.sharding import chunk_spans

CFG = SketchConfig(nsize=4, maxsize=8, hash_name="xxh64", seed=0)

bytes_st = st.binary(min_size=0, max_size=400)


@settings(max_examples=60, deadline=None)
@given(data=st.binary(min_size=4, max_size=300), width=st.integers(1, 32))
def test_sliding_kernel_matches_scalar(data, width):
    if width > len(data):
        width = len(data)
    got = xxh64_sliding(data, width)
    for i in (0, len(data) - width, (len(data) - width) // 2):
        assert int(got[i]) == xxh64(data[i : i + width], 0)


@settings(max_examples=40, deadline=None)
@given(rows=st.lists(st.binary(min_size=0, max_size=40), min_size=1, max_size=8))
def test_fixed_kernel_matches_scalar(rows):
    L = min(len(r) for r in rows)
    mat = np.frombuffer(b"".join(r[:L] for r in rows), dtype=np.uint8).reshape(
        len(rows), L
    )
    got = xxh64_fixed(mat, seed=0)
    for r, g in zip(rows, got):
        assert int(g) == xxh64(r[:L], 0)


@settings(max_examples=60, deadline=None)
@given(data=bytes_st)
def test_sketch_is_bottomk_of_bruteforce(data):
    """The reference's central property (:30-60): the sketch equals the
    k extreme distinct hashes of ALL ngrams, brute-forced."""
    sig, nv = signature(data, CFG)
    if len(data) < CFG.nsize:
        assert sig.shape[0] == 0 and nv == 0
        return
    all_h = sorted(
        {xxh64(data[i : i + CFG.nsize], 0) for i in range(len(data) - CFG.nsize + 1)}
    )
    assert sig.tolist() == all_h[: CFG.maxsize]
    assert nv == len(data) - CFG.nsize + 1
    # MaxSketch mirror
    mx = SketchConfig(nsize=4, maxsize=8, hash_name="xxh64", seed=0, minmax="max")
    sig_mx, _ = signature(data, mx)
    assert sig_mx.tolist() == all_h[-mx.maxsize :]


@settings(max_examples=60, deadline=None)
@given(a=bytes_st, b=bytes_st, c=bytes_st)
def test_merge_associative_commutative_idempotent(a, b, c):
    sa, _ = signature(a, CFG)
    sb, _ = signature(b, CFG)
    sc, _ = signature(c, CFG)
    k = CFG.maxsize

    def m(x, y):
        return merge_signatures(x, y, k)

    assert m(sa, sb).tolist() == m(sb, sa).tolist()
    assert m(m(sa, sb), sc).tolist() == m(sa, m(sb, sc)).tolist()
    assert m(sa, sa).tolist() == sa.tolist()
    # split-merge equivalence (reference :131-203): overlap chunks merge to
    # the whole-document sketch
    data = a + b
    if len(data) >= CFG.nsize:
        whole, _ = signature(data, CFG)
        acc = np.empty(0, dtype=np.uint64)
        for beg, end in chunk_spans(CFG.nsize, len(data), max(CFG.nsize, 16)):
            s, _ = signature(data[beg:end], CFG)
            acc = merge_signatures(acc, s, k)
        assert acc.tolist() == whole.tolist()


@settings(max_examples=40, deadline=None)
@given(
    hashes=st.lists(
        st.integers(0, 2**64 - 1), min_size=0, max_size=50
    ),
    k=st.integers(1, 12),
)
def test_bottomk_topk_unsigned_order(hashes, k):
    arr = np.array(hashes, dtype=np.uint64)
    distinct = sorted(set(hashes))
    assert bottomk(arr, k).tolist() == distinct[:k]
    assert topk(arr, k).tolist() == (distinct[-k:] if distinct else [])


@settings(max_examples=30, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
            max_size=60,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_batch_signatures_match_per_doc_property(texts):
    payload = [t.encode("utf-8") for t in texts]
    sigs, nvis = batch_signatures(payload, CFG)
    from mashing_pumpkins_spark.hashkernels import u64_to_i64

    for p, s, nv in zip(payload, sigs, nvis):
        es, env = signature(p, CFG)
        assert s == u64_to_i64(es).tolist()
        assert nv == env


@settings(max_examples=30, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
            max_size=50,
        ),
        min_size=1,
        max_size=5,
    ),
    seed=st.integers(0, 2**31 - 1),
)
def test_simhash_order_and_multiset_invariance(texts, seed):
    import pandas as pd

    got = simhash_batch(pd.Series(texts), seed)
    # token order must not matter (bag-of-words)
    shuffled = [" ".join(reversed(t.lower().split())) for t in texts]
    got2 = simhash_batch(pd.Series(shuffled), seed)
    assert got.tolist() == got2.tolist()


@settings(max_examples=60, deadline=None)
@given(
    nsize=st.integers(1, 12),
    lseq=st.integers(0, 400),
    extra=st.integers(0, 50),
)
def test_chunk_spans_cover_property(nsize, lseq, extra):
    w = nsize + extra
    spans = chunk_spans(nsize, lseq, w)
    windows = []
    for beg, end in spans:
        assert end - beg <= w
        windows.extend(range(beg, end - nsize + 1))
    assert windows == list(range(max(0, lseq - nsize + 1)))


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    channels=st.sampled_from([1, 2, 3, 4]),
    ftype=st.integers(0, 4),
    seed=st.integers(0, 10**6),
)
def test_png_encode_decode_roundtrip_property(h, w, channels, ftype, seed):
    """encode_png -> decode_png is the identity for every shape, channel
    count and filter type (hypothesis over the whole parameter space)."""
    import numpy as np

    from mashing_pumpkins_spark.operators.multimodal import decode_image, encode_png

    rng = np.random.default_rng(seed)
    shape = (h, w) if channels == 1 else (h, w, channels)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    out = decode_image(encode_png(img, filter_type=ftype))
    assert out.shape == ((h, w) if channels == 1 else (h, w, channels))
    assert np.array_equal(out, img)


@settings(max_examples=40, deadline=None)
@given(
    grams=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=33, max_codepoint=300),
            min_size=1,
            max_size=12,
        ),
        min_size=0,
        max_size=40,
        unique=True,
    ),
    k=st.integers(1, 6),
)
def test_gram_bloom_never_false_negative_property(grams, k):
    """Every gram inserted into the bloom must probe as a member — the
    no-false-negative guarantee holds for arbitrary unicode grams and any
    probe count (membership via the same helper the operators use)."""
    import numpy as np
    import pandas as pd

    from mashing_pumpkins_spark.operators.corpus import (
        bloom_contamination_flags,
        build_gram_bloom,
    )

    # mirror the real build path: bench grams come out of words_array
    # LOWERCASED, so the filter is built from (and probed with) lowercase
    grams = sorted({g.lower() for g in grams})
    m_bits = 1 << 12
    arr = build_gram_bloom(grams, m_bits=m_bits, k_hashes=k)
    if not grams:
        assert arr.sum() == 0
        return
    # a "doc" that IS the gram (n=1 word grams) must always flag
    texts = pd.Series(grams)
    flags = bloom_contamination_flags(texts, arr, 1, m_bits, k)
    # tokenization may split a gram containing whitespace-class chars into
    # several words; restrict the assertion to single-token grams
    import re

    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    for g, f in zip(grams, flags):
        if len(ws.split(g.lower().strip(" "))) == 1 and g.lower().strip(" "):
            assert f == 1, repr(g)
