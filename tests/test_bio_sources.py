"""FASTA/FASTQ sources + the end-to-end MASH workflow (read -> canonical
sketch), against hand-built files incl. gzip and multi-line records."""

from __future__ import annotations

import gzip

import numpy as np
import pytest

from mashing_pumpkins_spark.config import SketchConfig
from mashing_pumpkins_spark.sources.bio import read_fasta, read_fastq, sketch_fasta

FASTA = """>seq1 first record
ACGTACGTAC
GTACGTACGT
>seq2 second
TTTTGGGGCCCCAAAA
>seq3
ACGT
"""

FASTQ = """@r1 some description
ACGTACGTACGTACGTACGTACGTACG
+
IIIIIIIIIIIIIIIIIIIIIIIIIII
@r2
GGGGCCCCAAAATTTT>@++ignored
+r2
!!!!@>>>+IIIIIIIIIIII!!!!!!
"""


@pytest.fixture(scope="module")
def bio_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("bio")
    (d / "a.fasta").write_text(FASTA)
    (d / "b.fastq").write_text(FASTQ)
    (d / "b2.fastq.gz").write_bytes(gzip.compress(FASTQ.encode()))
    return d


def test_read_fasta_records(spark, bio_dir):
    rows = {r["seq_id"]: r for r in read_fasta(spark, str(bio_dir / "a.fasta")).collect()}
    assert set(rows) == {"seq1", "seq2", "seq3"}
    assert rows["seq1"]["sequence"] == "ACGTACGTACGTACGTACGT"  # lines joined
    assert rows["seq1"]["description"] == "seq1 first record"
    assert rows["seq2"]["sequence"] == "TTTTGGGGCCCCAAAA"
    assert rows["seq3"]["sequence"] == "ACGT"


def test_read_fasta_gt_inside_description(spark, tmp_path_factory):
    """'>' is only a record start at line start — a literal '>' inside an
    NCBI-style multi-header description must NOT split the record."""
    d = tmp_path_factory.mktemp("bio_gt")
    (d / "gt.fasta").write_text(
        ">gi|123|ref>NC_0001.1| tricky >header\nACGTACGTAC\n>plain second\nTTTT\n"
    )
    rows = {r["seq_id"]: r for r in read_fasta(spark, str(d / "gt.fasta")).collect()}
    assert set(rows) == {"gi|123|ref>NC_0001.1|", "plain"}
    assert rows["gi|123|ref>NC_0001.1|"]["sequence"] == "ACGTACGTAC"
    assert rows["gi|123|ref>NC_0001.1|"]["description"].endswith("tricky >header")
    assert rows["plain"]["sequence"] == "TTTT"


def test_read_fastq_records_incl_gzip(spark, bio_dir):
    for name in ("b.fastq", "b2.fastq.gz"):
        rows = {
            r["seq_id"]: r
            for r in read_fastq(spark, str(bio_dir / name)).collect()
        }
        assert set(rows) == {"r1", "r2"}, name
        assert rows["r1"]["sequence"] == "ACGTACGTACGTACGTACGTACGTACG"
        # '@' and '>' inside quality strings must not break record framing
        assert rows["r2"]["quality"] == "!!!!@>>>+IIIIIIIIIIII!!!!!!"
        assert rows["r2"]["sequence"] == "GGGGCCCCAAAATTTT>@++IGNORED"


def test_sketch_fasta_matches_numpy_mash_sketch(spark, bio_dir, tmp_path):
    """End-to-end reference workflow: FASTA -> canonical MASH sketch must
    equal the numpy engine run on the same sequence bytes."""
    from mashing_pumpkins_spark.functions.sketch_np import signature
    from mashing_pumpkins_spark.hashkernels import u64_to_i64

    rng = np.random.default_rng(3)
    seq = "".join(rng.choice(list("ACGT"), size=400).tolist())
    fa = tmp_path / "big.fasta"
    fa.write_text(">big test\n" + "\n".join(seq[i : i + 60] for i in range(0, len(seq), 60)) + "\n")
    cfg = SketchConfig(
        nsize=21, maxsize=64, hash_name="mmh3_x64_128_low64", seed=42,
        canonical="dna_rc",
    )
    got = sketch_fasta(spark, str(fa), cfg).collect()
    assert len(got) == 1
    expect_sig, expect_nv = signature(seq.encode(), cfg)
    assert list(got[0]["sig"]) == u64_to_i64(expect_sig).tolist()
    assert got[0]["nvisited"] == expect_nv


def test_signature_interchange_roundtrip(spark, bio_dir, tmp_path):
    """Sourmash-style JSON export/import round-trips bit-exactly, including
    values with the uint64 high bit set (signed/unsigned shift)."""
    import json

    from mashing_pumpkins_spark.sources.interchange import (
        export_signatures_json,
        import_signatures_json,
    )

    cfg = SketchConfig(
        nsize=21, maxsize=1000, hash_name="mmh3_x64_128_low64", seed=42,
        canonical="dna_rc",
    )
    sigs = sketch_fasta(spark, str(bio_dir / "a.fasta"), cfg)
    out = str(tmp_path / "sigs_json")
    export_signatures_json(sigs, out, cfg, url_col="seq_id")
    back = import_signatures_json(spark, out)
    orig = {r["seq_id"]: list(r["sig"]) for r in sigs.collect()}
    got = {r["name"]: list(r["sig"]) for r in back.collect()}
    assert got == orig
    meta = {(r["ksize"], r["seed"], r["num"]) for r in back.collect()}
    assert meta == {(21, 42, 1000)}
    # structural fields follow the published sourmash schema
    import glob

    line = next(
        l
        for f in glob.glob(out + "/part-*")
        for l in open(f)
        if l.strip()
    )
    obj = json.loads(line)
    assert obj["class"] == "sourmash_signature"
    assert obj["hash_function"] == "0.murmur64"
    sig0 = obj["signatures"][0]
    assert sig0["ksize"] == 21 and sig0["seed"] == 42
    assert all(int(m) >= 0 for m in sig0["mins"])
    # ascending unsigned order on the wire
    mins = [int(m) for m in sig0["mins"]]
    assert mins == sorted(mins)
