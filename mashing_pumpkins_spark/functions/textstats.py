"""Text-analysis functions for training-data pipelines — all JVM-side
Column expressions (no Python UDFs), each with an ANSI-SQL equivalent so
the DuckDB oracle can replay them.

These extend the reference's capability surface (it only hashes bytes) with
the document-level signals a 100 TB curation pipeline needs: token counts,
quality scores, language ID, fingerprints.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword marker sets for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pas", "pour", "que", "une"],
    "es": ["el", "la", "los", "las", "es", "y", "que", "para", "una"],
}

_EN_STOPWORDS = LANG_MARKERS["en"] + ["a", "an", "it", "on", "as", "at", "by"]

# per-language stoplists for a lang_id-routed Gopher battery
# (operators/corpus.gopher_rule_columns(stopwords=STOPWORDS_BY_LANG[lang]))
# — the LANG_MARKERS core plus a few high-frequency function words each
STOPWORDS_BY_LANG = {
    "en": _EN_STOPWORDS,
    "de": LANG_MARKERS["de"] + ["den", "von", "auf", "im", "eine", "als", "auch"],
    "fr": LANG_MARKERS["fr"] + ["de", "des", "du", "en", "un", "dans", "au"],
    "es": LANG_MARKERS["es"] + ["de", "del", "en", "un", "con", "por", "se"],
}


def whitespace_token_count(text: Column) -> Column:
    """Number of whitespace-delimited tokens."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish token estimate: runs of letters, runs of digits, and single
    punctuation marks each count as one token."""
    return F.size(
        F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    )


def punctuation_ratio(text: Column) -> Column:
    nonspace = F.regexp_replace(text, r"\s+", "")
    punct = F.regexp_replace(nonspace, r"[A-Za-z0-9]", "")
    return F.when(F.length(nonspace) > 0,
                  F.length(punct).cast("double") / F.length(nonspace).cast("double")
                  ).otherwise(F.lit(0.0))


def stopword_ratio(text: Column) -> Column:
    """Fraction of whitespace tokens that are English stopwords."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    stops = F.array(*[F.lit(w) for w in _EN_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
    return F.when(F.size(toks) > 0,
                  n_stop.cast("double") / F.size(toks).cast("double")
                  ).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality proxy: length band + low punctuation +
    presence of stopwords. Deliberately simple & SQL-replayable."""
    len_ok = (F.length(text) >= 100) & (F.length(text) <= 20000)
    punct_ok = punctuation_ratio(text) < 0.2
    stop_ok = stopword_ratio(text) > 0.01
    return (
        len_ok.cast("double") * 0.4
        + punct_ok.cast("double") * 0.3
        + stop_ok.cast("double") * 0.3
    )


def language_id(text: Column) -> Column:
    """Heuristic language ID: the language whose marker-word hit count is
    highest (ties broken by language code order); 'und' when no markers."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")

    def _contains(markers):
        return lambda t: F.array_contains(markers, t)

    scores = []
    for lang in sorted(LANG_MARKERS):
        markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
        score = F.size(F.filter(toks, _contains(markers)))
        scores.append(F.struct(score.alias("score"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def doc_fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the
    whitespace-normalized, lowercased text (md5 exists in both Spark and
    DuckDB, so the oracle can replay it — unlike our xxh64 kernels)."""
    normalized = F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))
    return F.md5(F.encode(normalized, "utf-8"))


# PII redaction (Dolma-style masking) — conservative RE2-compatible
# patterns (no lookaround) so Spark's Java regex and the DuckDB oracle's
# RE2 match the SAME spans; each is replaced by a typed mask token.
#
# Scope (deliberate, oracle-replayable tradeoffs; where the pattern is
# imprecise it errs toward OVER-masking — under-masking is the unsafe
# direction for a redaction feature):
#   email  practical RFC-lite form; exotic quoted local parts not matched.
#   ipv4   \d{1,3} octets accept invalid values (999.1.1.1 masks as <IP>)
#          — over-masking-safe, and validating octets needs alternation
#          bloat for no redaction benefit.
#   phone  international-prefix ('+') numbers ONLY, now separator-tolerant:
#          "+49 151 2345678", "+1 (415) 555-0100", "+44-20-7946-0958" all
#          mask. Bare national numbers ("(415) 555-0100") and 00-prefix
#          forms are deliberately OUT of scope: without lookaround they
#          are indistinguishable from ids/dates/prices at acceptable
#          false-positive rates. A '+'-leading date like "+2026-08-17"
#          does mask (over-masking-safe).
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,3}([-. ()]{0,2}\d{2,4}){2,5}", "<PHONE>"),
]


def pii_counts(text: Column) -> list[tuple[str, Column]]:
    """(kind, count Column) per PII pattern — how many spans redaction
    would mask. Counting runs BEFORE masking; order in PII_PATTERNS is
    the masking order, so an email's host part is never double-counted
    as an IP (masking replaces it first)."""
    cols = []
    masked = text
    for kind, pat, token in PII_PATTERNS:
        cols.append(
            (kind, F.size(F.regexp_extract_all(masked, F.lit(pat), F.lit(0))))
        )
        masked = F.regexp_replace(masked, pat, token)
    return cols


def redact_pii(text: Column) -> Column:
    """Text with every PII span replaced by its typed mask token, applied
    in PII_PATTERNS order. Pure JVM regexp_replace — no UDF, runs at scan
    speed, SQL-replayable (the `pii_scrub` driver query value-checks the
    masked text per row via md5)."""
    masked = text
    for _kind, pat, token in PII_PATTERNS:
        masked = F.regexp_replace(masked, pat, token)
    return masked


# GPT-2-style byte-pair pre-tokenizer segmentation (Radford et al. 2019,
# the public gpt2 regex minus lookaheads, which RE2 — the oracle engine —
# does not support): contraction suffixes, space-prefixed letter runs,
# space-prefixed digit runs, space-prefixed punctuation runs, whitespace.
# Both Java regex (Spark) and RE2 (DuckDB) resolve alternations
# leftmost-first, so segmentation is engine-identical.
BPE_PRETOKEN_RE = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_pretokens(text: Column) -> Column:
    """Array of GPT-2-style pre-token segments covering the whole string
    (every byte lands in exactly one segment). Pre-token counts are the
    standard training-cost estimate one step sharper than whitespace
    token counts — punctuation and digit runs count separately, as a BPE
    tokenizer would see them. Pure JVM regexp, scan speed."""
    return F.regexp_extract_all(text, F.lit(BPE_PRETOKEN_RE), 0)


def bpe_pretoken_count(text: Column) -> Column:
    return F.size(bpe_pretokens(text))
