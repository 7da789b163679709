"""Linear text classifier scoring over hashed tokens — the
fastText/DCLM-style quality-model shape, as pure Column algebra.

The dominant published recipe for corpus quality filtering (CCNet's LM
filter aside) is a linear model over hashed bag-of-words features: DCLM,
FineWeb-Edu and fastText all score a document as

    score(doc) = sum over tokens t of W[bucket(t)]

with `bucket` a stable hash into a fixed weight table. Training happens
offline; the 100 TB problem is only the SCORING pass, and that is pure
arithmetic — no model runtime needed. This module does that pass
JVM-side: tokens from `words_array`, bucket = md5-derived 32-bit value
mod n_buckets (md5 so the SQL oracle can replay the bucketing — the same
`conv(substr(md5 ...))` parity the sampling operators pin), weight
lookup from a plan-literal array, one `aggregate` fold per doc. Zero
Python, zero shuffle: a scan-speed map like the Gopher battery.

The plan-literal weight table is right for real model sizes (fastText
quality models ship ~10^6 buckets x 1 int ~ a few MB — same order as a
broadcast dim); if a table ever outgrows the plan, explode tokens and
broadcast-join the weights instead — same semantics, one extra shuffle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..operators.corpus import words_array


def token_bucket(token: Column, n_buckets: int) -> Column:
    """Stable 32-bit md5-derived bucket in [0, n_buckets) — identical in
    Spark and ANSI SQL (('0x' || substr(md5(t),1,8))::bigint % n)."""
    return F.pmod(
        F.conv(F.substring(F.md5(token), 1, 8), 16, 10).cast("bigint"),
        F.lit(n_buckets),
    )


def hashed_ngram_score(text: Column, weights: Sequence[int]) -> Column:
    """Integer classifier score: sum of W[bucket(token)] over the doc's
    whitespace tokens. Weights are INTEGER (fixed-point: scale float
    model weights by e.g. 1e6 offline) so scores are bit-identical
    across engines and partitionings — float summation order would
    diverge. Empty text scores 0."""
    if not weights:
        raise ValueError("weights must be non-empty")
    n = len(weights)
    wt = F.array(*[F.lit(int(w)) for w in weights])
    toks = words_array(text)
    return F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, t: acc + F.element_at(wt, (token_bucket(t, n) + 1).cast("int")),
    )

def demo_weight_table(n_buckets: int = 256) -> list[int]:
    """The deterministic demo/gate weight table used by the gated-funnel
    query, plan dumps and the sf1 soak: Knuth-multiplicative spread of the
    bucket id into [-500, 500]. ONE definition here — the SQL oracles
    re-derive the same arithmetic textually on purpose (independent
    replay), but every engine-side consumer must share this helper or a
    recipe edit would let the soak/plan-dump exercise a different model
    than the gate query."""
    return [((b * 2654435761) % 1001) - 500 for b in range(n_buckets)]
