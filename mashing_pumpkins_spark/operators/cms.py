"""Count-min-sketch (CMS) token-frequency estimation.

Cormode & Muthukrishnan 2005: a depth x width counter matrix; each token
increments one counter per row (row-salted hash); a point query reads the
MIN of its depth counters — never an underestimate, overestimate bounded
by e/width * N with probability 1 - e^-depth.

Why it matters at 100 TB: exact token counting shuffles |vocab| keys
(web-scale: billions, skewed); the CMS state is depth*width rows NO
MATTER the corpus — the groupBy partial-aggregates to at most
depth*width rows per task before the exchange, so the shuffle is O(d*w)
per partition regardless of data volume, and two sketches built on
disjoint corpus halves merge by elementwise counter addition
(:func:`merge_counters` — the mergeability test is the scale contract).

Determinism: buckets come from the same 32-bit md5 idiom as the
classifier/DSIR (functions/classifier.token_bucket), so an ANSI-SQL
engine replays the entire sketch bit-identically — the gate query
`heavy_hitters_cms` carries a FULL value oracle, estimates included.

All Column algebra; no Python in any per-row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.classifier import token_bucket

__all__ = [
    "cms_bucket",
    "cms_estimate",
    "merge_counters",
    "token_counter_table",
]

# Row salt separator: tokens from [a-z]+ pretokenization can never
# contain a control char, so concat(token, US, row) is injective.
_SALT = "\x1f"

DEFAULT_PRETOKEN_RE = "[a-z]+"


def cms_bucket(token: Column, row_i: Column, width: int) -> Column:
    """Counter index for ``token`` in sketch row ``row_i`` — the 32-bit
    md5 bucket of the row-salted token (SQL mirror:
    ``('0x'||substr(md5(t||chr(31)||i),1,8))::bigint % width``)."""
    return token_bucket(
        F.concat(token, F.lit(_SALT), row_i.cast("string")), width
    )


def _probe_rows(token: Column, depth: int, width: int) -> Column:
    return F.transform(
        F.sequence(F.lit(0), F.lit(depth - 1)),
        lambda i: F.struct(
            i.cast("int").alias("row_i"),
            cms_bucket(token, i, width).alias("bucket"),
        ),
    )


def token_counter_table(
    df: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width: int = 8192,
    pretoken_re: str = DEFAULT_PRETOKEN_RE,
) -> DataFrame:
    """Build the CMS counter table ``(row_i, bucket, cnt)`` over the
    corpus — at most ``depth * width`` rows, map-side combined."""
    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}/{width}")
    token = F.explode(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(pretoken_re), 0)
    )
    return (
        df.select(token.alias("t"))
        .select(F.explode(_probe_rows(F.col("t"), depth, width)).alias("rb"))
        .groupBy(
            F.col("rb.row_i").alias("row_i"), F.col("rb.bucket").alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_counters(a: DataFrame, b: DataFrame) -> DataFrame:
    """Elementwise counter addition — CMS(A) + CMS(B) == CMS(A union B)
    exactly, so sketches build independently per corpus shard/day and
    fold together without touching the data again."""
    return (
        a.unionByName(b)
        .groupBy("row_i", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    counters: DataFrame,
    tokens_df: DataFrame,
    token_col: str = "token",
    depth: int = 4,
    width: int = 8192,
) -> DataFrame:
    """Point-query estimates for ``tokens_df[token_col]``: min over the
    token's ``depth`` counters (0 for a row whose counter was never
    touched).  The counter table is broadcast — it is bounded by
    depth*width rows, never corpus-sized."""
    probes = tokens_df.select(
        token_col, F.explode(_probe_rows(F.col(token_col), depth, width)).alias("rb")
    ).select(token_col, "rb.row_i", "rb.bucket")
    return (
        probes.join(F.broadcast(counters), ["row_i", "bucket"], "left")
        .groupBy(token_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("bigint").alias("est_count"))
    )
