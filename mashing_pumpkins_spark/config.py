"""Sketch/pipeline configuration.

The reference enforces (nsize, hashfun, seed) compatibility dynamically at
every merge (/root/reference/src/minhashsketch.py:183-198); here the
quadruple is a frozen job-level config whose hash is recorded in checkpoint
manifests, so a resume with a different config is rejected once instead of
per-merge.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field



def _config_hash(cfg) -> str:
    """One hashing recipe for every frozen config dataclass: JSON of every
    field, sorted keys, sha256[:16]. A single definition keeps the
    manifest-hash format identical across Sketch/Pipeline/Curation configs
    — divergent copies would silently desynchronize checkpoint gating."""
    payload = json.dumps(asdict(cfg), sort_keys=True).encode()
    return hashlib.sha256(payload).hexdigest()[:16]


@dataclass(frozen=True)
class SketchConfig:
    """Canonical config per FIXTURES.md §3 (reference defaults)."""

    nsize: int = 21  # shingle width in bytes (reference tests' standard)
    maxsize: int = 256  # sketch size k
    hash_name: str = "xxh64"  # /root/reference/src/_xxhash.c:4 (seed 0)
    seed: int = 0
    minmax: str = "min"  # bottom-k MinSketch ("max" = top-k MaxSketch)
    # pre-hash window canonicalization: "none" hashes each window as-is;
    # "dna_rc" hashes the lexicographically smaller of (window,
    # reverse-complement(window)) — the MASH canonical k-mer scheme of the
    # reference's hasharray_withrc (/root/reference/src/_murmurhash3_mash.cpp
    # :13-81). Named (not a callable) so the config stays hashable/picklable;
    # kernels resolve it via functions.sketch_np.CANONICALIZERS.
    canonical: str = "none"

    def config_hash(self) -> str:
        return _config_hash(self)


@dataclass(frozen=True)
class PipelineConfig:
    sketch: SketchConfig = field(default_factory=SketchConfig)
    # LSH banding: n_bands OPH multiply-shift rehash keys per doc, each key
    # digesting rows_per_band dense-OPH slots of the sketch contents
    # (operators/banding.py — NOT a sorted-prefix split).
    # Default 32x8 (round-5): the banding sweep (scripts/banding_sweep.py,
    # table in BENCH/BASELINE.md) showed 16x16's implied threshold
    # (1/16)^(1/16) ~= 0.84 sits ABOVE tau=0.8, so pairs AT the threshold
    # were found directly only ~40% of the time (a 20k-page soak sampled
    # 0.83 recall on tau-edge pairs); 32x8's implied threshold ~0.65 puts
    # p_hit(0.8) at 0.9972 — the config every gate query and test already
    # used explicitly.
    n_bands: int = 32
    rows_per_band: int = 8
    jaccard_threshold: float = 0.8
    # banding reads only the bottom band_input_k sketch values: a KMV
    # prefix of the sketch is itself a KMV sketch, so component-match
    # probability is still the (sub)sketch Jaccard — at maxsize=1000 this
    # cuts banding CPU 4x with the same S-curve
    band_input_k: int = 256
    # skew control: a band bucket with more than this many docs is
    # star-linked (every member pairs with the bucket's min id) instead of
    # producing all C(n,2) pairs — nothing is dropped; transitive closure
    # recovers the clique through the star center. Caveat: if one over-cap
    # bucket holds multiple distinct near-dup cliques, intra-bucket edges
    # between non-center members are not emitted and recall for those pairs
    # relies on the other n_bands-1 bands (operators/candidates.py).
    band_group_cap: int = 2000
    min_doc_bytes: int = 21  # docs shorter than one shingle produce no sketch
    # long-document sharding: when > 0, docs whose UTF-8 encoding exceeds
    # this many bytes are sketched as overlapping chunks and merged
    # (operators/sharding.py) — bounds per-task input; 0 disables. The
    # merged sketch is bit-identical either way, so this is a physical
    # knob, but it changes stage row counts and thus participates in
    # config_hash like everything else.
    shard_chunk_bytes: int = 0
    # verify phase-1 prefix width: the bottom-prefilter_k prefix of each
    # signature estimates full-sketch Jaccard with sigma ~ sqrt(t(1-t)/K);
    # pairs below tau - 6*sigma are dropped before the exact pass. The
    # normal 6-sigma reading (~1e-9) overstates the guarantee — the
    # Binomial(K, tau) tail at that cut is ~1e-7 per pair at K=64 — so for
    # exactness-sensitive runs (the final edge set must be EXACTLY the
    # tau-set with overwhelming probability at billions of candidates)
    # raise this to 128-256; 64 keeps the join payload at 512B/side.
    prefilter_k: int = 64
    # where document text comes from: "column" trusts the pages table's
    # text column (the default — a crawl store that already ran extraction
    # with the byte-identity invariant); "html" runs the native HTML
    # extractor (operators/extraction.py) on the html column inside the
    # extract stage, the raw-WARC ingest shape. Output-affecting (the text
    # fed to sketching differs if the stored column ever drifts from the
    # html), so it participates in config_hash.
    text_source: str = "column"
    # Unicode normalization applied to the extracted text before any
    # hashing: "none" (default — preserves the byte-identity invariant
    # with a store that did its own normalization), "nfc" or "nfkc"
    # (functions/unicode_norm.py, Arrow-batched). Composed-vs-decomposed
    # variants of the same visible text hash to different sketches, so a
    # raw-crawl ingest should turn this on. Output-affecting.
    normalize: str = "none"
    # C4-style corpus-wide line dedup inside the extract stage: lines of
    # at least this many chars keep only their first (url, position)
    # occurrence corpus-wide (operators/corpus.line_dedup — skew-proof
    # min(struct) winner). 0 disables (default). Output-affecting: the
    # text fed to sketching loses duplicated boilerplate lines — and a
    # doc whose EVERY line is a dup (e.g. a single-line exact duplicate)
    # is emptied and dropped by min_doc_bytes here, so it never reaches
    # the exact-collapse stage or the finalize election: C4 ordering
    # removes duplicated CONTENT before doc-level dedup sees it.
    line_dedup_min_len: int = 0

    def config_hash(self) -> str:
        # hash EVERY field: any output-affecting config change (band_input_k
        # changes band keys, band_group_cap changes candidate pairs,
        # min_doc_bytes changes extract) must invalidate checkpoints —
        # resuming across a semantic change would silently give wrong clusters
        return _config_hash(self)


@dataclass(frozen=True)
class CurationConfig:
    """Funnel-stage knobs for operators/curation.curation_funnel, hashed
    into the run manifest the same way PipelineConfig gates checkpoint
    resume: every field is output-affecting (it changes which documents
    survive), so the recorded hash pins exactly which funnel produced a
    curated table. Tables (robots rules, benchmark set) are referenced by
    PATH here — the hash covers the pointer; content-addressing the table
    itself is the store's job (plans/versioned.py snapshots)."""

    quality_min: float = 0.4
    passage_words: int = 16
    max_dup_frac: float = 0.5
    ngram: int = 4
    # round-6 gate stages (all off by default — the funnel is then
    # byte-identical to the pre-round-6 five-stage output)
    url_col: str | None = None
    blocked_hosts: tuple[str, ...] = ()
    blocked_path_terms: tuple[str, ...] = ()
    robots_path: str | None = None  # parquet of (host, body) robots bodies
    agent: str = "*"
    classifier_weights: tuple[int, ...] = ()
    classifier_min: int = 0

    def config_hash(self) -> str:
        return _config_hash(self)

    def funnel_kwargs(self) -> dict:
        """kwargs for curation_funnel (the robots table itself is loaded
        by the caller from robots_path)."""
        return {
            "quality_min": self.quality_min,
            "passage_words": self.passage_words,
            "max_dup_frac": self.max_dup_frac,
            "ngram": self.ngram,
            "url_col": self.url_col,
            "blocked_hosts": list(self.blocked_hosts),
            "blocked_path_terms": list(self.blocked_path_terms),
            "agent": self.agent,
            "classifier_weights": list(self.classifier_weights),
            "classifier_min": self.classifier_min,
        }
