"""Unicode normalization for the curation pipeline — the one text
transform that genuinely needs Python (Spark has no NFC/NFKC builtin).

Normalizing BEFORE shingling/hashing is load-bearing for dedup: the same
visible text in composed vs decomposed form ("café" as U+00E9 vs
e+U+0301) hashes to different sketches and silently defeats exact and
near dedup alike. NFC is the conservative default (canonical composition
only); NFKC additionally folds compatibility forms (ligatures, full-width
Katakana) and is the usual choice before tokenization.

Implementation: a scalar Arrow-batched pandas UDF (`pandas_udf`, not a
row-at-a-time `udf`) — one Python round-trip per ~10k-row Arrow batch,
string-in/string-out, stateless, so it pipelines inside whole-stage
boundaries with no shuffle implications at any scale. The DuckDB oracle
replays NFC via its utf8proc-backed `nfc_normalize`; parity with
Python's unicodedata is pinned by test on composed/decomposed/ligature/
multi-combining-mark cases.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

_FORMS = ("NFC", "NFD", "NFKC", "NFKD")


def normalize_unicode(col: Column, form: str = "NFC") -> Column:
    """Column -> Column Unicode normalization (null-preserving)."""
    if form not in _FORMS:
        raise ValueError(f"form must be one of {_FORMS}, got {form!r}")

    @F.pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: unicodedata.normalize(form, x) if x is not None else None
        )

    return _norm(col)
