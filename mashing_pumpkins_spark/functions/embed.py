"""Deterministic feature-hashing document embeddings (signed hashed-TF).

The hashing trick (Weinberger et al. 2009, "Feature Hashing for Large
Scale Multitask Learning"): each token is hashed to a bucket in
[0, dim) AND to an independent sign in {+1, -1}; the document vector is
the per-bucket sum of signs, normalized by document length.  The signed
variant keeps random documents near-orthogonal in expectation (unsigned
TF vectors are all-nonnegative, which floors random-pair cosine well
above zero), so a high cosine really does mean shared token mass — the
property the semantic-dedup stage (operators/semdedup.py) thresholds
on.  This gives the engine a model-free text -> embedding edge: the
full SemDedup tier runs on raw text with no external encoder, and
every step replays exactly in ANSI SQL.

Exact-math contract (the same discipline as functions/classifier.py):

- bucket(t) = md5-derived 32-bit value mod dim (md5 chars 1-8), sign(t)
  from the NEXT 32 md5 bits (chars 9-16) — both replayable in DuckDB as
  ('0x' || substr(md5(t), ...))::bigint arithmetic.
- component v[i] = floor(scale * s_i / n_tokens) where s_i is the
  signed bucket sum — EXACT integer floor division (posmod form, the
  operators/semdedup._floordiv discipline), so |v[i]| <= scale and the
  emitted floats are integer-valued (exact in float32 for scale <
  2^24).  Empty documents embed as the zero vector.
- downstream fixed-point bounds: semdedup quantizes q[i] =
  floor(v[i] * 1000), so |q[i]| <= 1000 * scale = 1e5 at the default
  scale 100.  At dim 64 that bounds norm2 <= 6.4e11 and every 128-bit
  comparison term (dot^2 * 1e12, tau_ppm^2 * norm2_p * norm2_q) below
  ~4.1e35 — safely inside DECIMAL(38,0)/HUGEINT.  Callers raising
  `scale` or `dim` must re-check: the prune test needs
  1e12 * (dim * (1000*scale)^2)^2 < 1e38.

Scale shape: pure Column algebra folded into the scan — one
md5-per-token transform, one aggregate() fold updating the bucket array
by slice/concat (O(dim) native array copy per token, NOT O(dim)
interpreted lambda evaluations — higher-order-function lambdas are
interpreted, so per-token work must stay at a handful of expression
nodes), one floor-divide transform.  Zero Python, zero shuffle, zero
joins: embedding a corpus costs one scan, like the Gopher battery.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..operators.corpus import words_array

EMBED_SCALE = 100


def token_bucket_sign(token: Column, dim: int) -> Column:
    """struct(b, s): stable md5 bucket in [0, dim) and sign in {+1, -1}
    from independent md5 bits — identical in Spark and ANSI SQL."""
    h = F.md5(token)
    b = F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(dim))
    s = (
        F.when(
            F.pmod(F.conv(F.substring(h, 9, 8), 16, 10).cast("long"), F.lit(2)) == 0,
            F.lit(1),
        )
        .otherwise(F.lit(-1))
        .cast("long")
    )
    return F.struct(b.alias("b"), s.alias("s"))


def hashed_doc_embedding(
    text: Column, dim: int = 64, scale: int = EMBED_SCALE
) -> Column:
    """array<float> of integer-valued components: v[i] =
    floor(scale * signed_bucket_sum_i / n_tokens); zero vector for
    empty text.  See module docstring for the exact-math contract."""
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    toks = words_array(text)
    bs = F.transform(toks, lambda t: token_bucket_sign(t, dim))
    acc0 = F.array_repeat(F.lit(0).cast("long"), dim)
    # per-token update: copy-before + bumped element + copy-after (three
    # native array ops; slice clamps past the end, so the tail slice is
    # empty when b == dim-1)
    sums = F.aggregate(
        bs,
        acc0,
        lambda acc, x: F.concat(
            F.slice(acc, 1, x["b"].cast("int")),
            F.array(F.element_at(acc, (x["b"] + 1).cast("int")) + x["s"]),
            F.slice(acc, (x["b"] + 2).cast("int"), F.lit(dim)),
        ),
    )
    n = F.size(toks).cast("long")
    # exact floor division for possibly-negative sums: (a - posmod(a, n))
    # is exactly divisible by n and the quotient is an integer with
    # |q| <= scale, so the double division is exact and floor is a no-op
    # safety net (same posmod form as operators/semdedup._floordiv)
    def comp(s: Column) -> Column:
        a = s * F.lit(int(scale))
        posmod = ((a % n) + n) % n
        return F.when(n > 0, F.floor((a - posmod) / n)).otherwise(
            F.lit(0).cast("long")
        )

    return F.transform(sums, lambda s: comp(s).cast("float"))
