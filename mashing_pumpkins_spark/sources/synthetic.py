"""Deterministic synthetic `pages` corpus with planted duplicate clusters.

Implements FIXTURES.md §1 exactly: seeded random.Random(42), 5,000-word
vocabulary, base docs of 50-400 words spawning 0-6 near-duplicate variants
(geometric p=0.5) with 0-10% token edits, 2% byte-identical copies, one
shared 150-word boilerplate footer on 10% of ALL docs (the planted hot LSH
band), occasional multibyte words to exercise UTF-8 byte identity.

No external data; no Spark needed to generate (pandas/pyarrow only) — Spark
reads the written parquet, mirroring the Iceberg `pages` table of the north
star at sandbox scale.
"""

from __future__ import annotations

import random
import string
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd

from ..hashkernels import xxh64

MULTIBYTE_WORDS = ["café", "naïve", "東京", "déjà", "über", "søren", "niño"]


def _vocab(rng: random.Random) -> list[str]:
    words = [f"w{i}" for i in range(2500)]
    for _ in range(2500 - len(MULTIBYTE_WORDS)):
        ln = rng.randint(3, 9)
        words.append("".join(rng.choice(string.ascii_lowercase) for _ in range(ln)))
    words.extend(MULTIBYTE_WORDS)
    return words


def _edit(tokens: list[str], vocab: list[str], rng: random.Random) -> list[str]:
    """0-10% token edits: substitute / insert / delete."""
    out = list(tokens)
    n_edits = int(len(out) * rng.random() * 0.10)
    for _ in range(n_edits):
        op = rng.choice(("sub", "ins", "del"))
        if not out:
            break
        i = rng.randrange(len(out))
        if op == "sub":
            out[i] = rng.choice(vocab)
        elif op == "ins":
            out.insert(i, rng.choice(vocab))
        elif len(out) > 1:
            del out[i]
    return out


def generate_pages(
    n_pages: int, seed: int = 42
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Returns (pages, oracle) pandas frames.

    pages:  url, warc_ts, html (bytes), text, lang — schema per
            BASELINE.json input_hint.
    oracle: url, oracle_cluster_id — planted ground-truth cluster labels.
    """
    rng = random.Random(seed)
    vocab = _vocab(rng)
    boiler = " ".join(rng.choice(vocab) for _ in range(150))

    texts: list[str] = []
    cluster_ids: list[int] = []
    cluster = 0
    while len(texts) < n_pages:
        base = [rng.choice(vocab) for _ in range(rng.randint(50, 400))]
        members = [" ".join(base)]
        nvar = 0
        while nvar < 6 and rng.random() < 0.5:
            nvar += 1
            if rng.random() < 0.02:
                members.append(members[0])  # byte-identical copy
            else:
                members.append(" ".join(_edit(base, vocab, rng)))
        for text in members:
            if len(texts) >= n_pages:
                break
            if rng.random() < 0.10:
                text = text + " " + boiler  # hot-band plant
            texts.append(text)
            cluster_ids.append(cluster)
        cluster += 1

    langs = []
    minor = ["de", "fr", "es"]
    for i in range(n_pages):
        langs.append("en" if rng.random() < 0.95 else minor[i % 3])

    # Realistic page rendering: inline markup, charrefs, comments,
    # head/script/style noise — extract_text() inverts it byte-exactly
    # (the input_hint invariant), unlike the flat wrapper it replaces.
    from ..operators.extraction import render_html

    base_ts = datetime(2024, 1, 1, tzinfo=timezone.utc)
    urls = [
        f"https://site{i % 200:04d}.example/"
        f"{xxh64(f'path-{seed}-{i}'.encode()):016x}"
        for i in range(n_pages)
    ]
    rows = {
        "url": urls,
        "warc_ts": [base_ts + timedelta(seconds=137 * i) for i in range(n_pages)],
        "html": [
            render_html(t, u, lg) for t, u, lg in zip(texts, urls, langs)
        ],
        "text": texts,
        "lang": langs,
    }
    pages = pd.DataFrame(rows)
    # microsecond precision: Spark's parquet reader rejects TIMESTAMP(NANOS)
    pages["warc_ts"] = (
        pd.to_datetime(pages["warc_ts"]).dt.tz_convert("UTC").astype("datetime64[us, UTC]")
    )
    oracle = pd.DataFrame(
        {"url": rows["url"], "oracle_cluster_id": np.asarray(cluster_ids, np.int64)}
    )
    return pages, oracle


def write_pages_parquet(out_dir: str, n_pages: int, seed: int = 42) -> tuple[str, str]:
    """Write pages.parquet + oracle_clusters.parquet under out_dir."""
    import pathlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    pages, oracle = generate_pages(n_pages, seed)
    pages_path = str(out / "pages.parquet")
    oracle_path = str(out / "oracle_clusters.parquet")
    pq.write_table(
        pa.Table.from_pandas(pages, preserve_index=False), pages_path
    )
    pq.write_table(
        pa.Table.from_pandas(oracle, preserve_index=False), oracle_path
    )
    return pages_path, oracle_path
