"""O3 canonical-window hashing (MASH reverse-complement k-mers): bit-parity
with the reference's hasharray_withrc loop semantics
(/root/reference/src/_murmurhash3_mash.cpp:60-74)."""

from __future__ import annotations

import numpy as np
import pytest

from mashing_pumpkins_spark.config import SketchConfig
from mashing_pumpkins_spark.functions.sketch_np import (
    CANONICALIZERS,
    batch_signatures,
    doc_hashes,
    signature,
)
from mashing_pumpkins_spark.hashkernels import mmh3_x64_128_low64

RC = dict(zip(b"ACGTacgt", b"TGCAtgca"))


def _revcomp(s: bytes) -> bytes:
    return bytes(RC.get(c, c) for c in reversed(s))


def _reference_withrc_loop(seq: bytes, w: int, seed: int) -> list[int]:
    """Literal port of the C loop at _murmurhash3_mash.cpp:60-74, including
    its strcmp SUFFIX compare (from the window start to the end of the
    whole buffer), not a window compare."""
    rc = _revcomp(seq)
    out = []
    L = len(seq)
    for i in range(L - w + 1):
        j = L - w - i
        # strcmp(input+i, input_rc+j): NUL-free suffix comparison
        if seq[i:] < rc[j:]:
            out.append(mmh3_x64_128_low64(seq[i : i + w], seed))
        else:
            out.append(mmh3_x64_128_low64(rc[j : j + w], seed))
    return out


@pytest.mark.parametrize("w", [3, 4, 8, 21])
def test_canonical_matches_reference_loop(w):
    rng = np.random.default_rng(101)
    seq = bytes(rng.choice(list(b"ACGT"), size=300).tolist())
    cfg = SketchConfig(
        nsize=w, maxsize=64, hash_name="mmh3_x64_128_low64", seed=42,
        canonical="dna_rc",
    )
    got = doc_hashes(seq, cfg).tolist()
    expect = _reference_withrc_loop(seq, w, 42)
    assert got == expect


def test_canonical_palindromic_windows_agree():
    # windows equal to their own reverse complement: both strands hash the
    # same bytes, so the suffix-vs-window compare divergence is moot
    seq = b"ACGTACGTACGT"
    cfg = SketchConfig(
        nsize=4, maxsize=64, hash_name="mmh3_x64_128_low64", seed=42,
        canonical="dna_rc",
    )
    got = doc_hashes(seq, cfg).tolist()
    assert got == _reference_withrc_loop(seq, 4, 42)


def test_canonical_strand_insensitive_sketch():
    """The whole point of canonical k-mers: a sequence and its reverse
    complement produce the SAME sketch."""
    rng = np.random.default_rng(7)
    seq = bytes(rng.choice(list(b"ACGT"), size=500).tolist())
    cfg = SketchConfig(
        nsize=21, maxsize=128, hash_name="mmh3_x64_128_low64", seed=42,
        canonical="dna_rc",
    )
    s1, nv1 = signature(seq, cfg)
    s2, nv2 = signature(_revcomp(seq), cfg)
    assert s1.tolist() == s2.tolist()
    assert nv1 == nv2
    # and WITHOUT canonicalization the strands differ (sanity of the test)
    plain = SketchConfig(
        nsize=21, maxsize=128, hash_name="mmh3_x64_128_low64", seed=42
    )
    p1, _ = signature(seq, plain)
    p2, _ = signature(_revcomp(seq), plain)
    assert p1.tolist() != p2.tolist()


def test_canonical_batch_matches_per_doc():
    """The concatenated-buffer batch path must honor canonicalization
    window-locally (cross-doc windows discarded)."""
    rng = np.random.default_rng(17)
    docs = [
        bytes(rng.choice(list(b"ACGT"), size=int(n)).tolist())
        for n in rng.integers(5, 200, size=12)
    ]
    cfg = SketchConfig(
        nsize=9, maxsize=32, hash_name="mmh3_x64_128_low64", seed=42,
        canonical="dna_rc",
    )
    sigs, nvis = batch_signatures(docs, cfg)
    for d, s, nv in zip(docs, sigs, nvis):
        es, env = signature(d, cfg)
        from mashing_pumpkins_spark.hashkernels import u64_to_i64

        assert s == u64_to_i64(es).tolist()
        assert nv == env


def test_unknown_canonical_scheme_rejected():
    cfg = SketchConfig(canonical="bogus")
    with pytest.raises(ValueError):
        doc_hashes(b"A" * 30, cfg)
    assert set(CANONICALIZERS) == {"none", "dna_rc"}


def test_canonical_survives_sharding(spark):
    """Window-local canonicalization + overlap sharding must compose: the
    sharded canonical sketch equals the whole-sequence canonical sketch."""
    import pandas as pd

    from mashing_pumpkins_spark.operators.sharding import sketch_table_sharded
    from mashing_pumpkins_spark.operators.signature import sketch_table

    rng = np.random.default_rng(41)
    rows = {
        "url": [f"s{i}" for i in range(6)],
        "text": [
            "".join(rng.choice(list("ACGT"), size=int(n)).tolist())
            for n in rng.integers(30, 3000, size=6)
        ],
    }
    docs = spark.createDataFrame(pd.DataFrame(rows))
    cfg = SketchConfig(
        nsize=15, maxsize=64, hash_name="mmh3_x64_128_low64", seed=42,
        canonical="dna_rc",
    )
    plain = {
        r["url"]: (list(r["sig"]), r["nvisited"])
        for r in sketch_table(docs, cfg).collect()
    }
    sharded = {
        r["url"]: (list(r["sig"]), r["nvisited"])
        for r in sketch_table_sharded(docs, cfg, chunk_bytes=256).collect()
    }
    assert plain == sharded
