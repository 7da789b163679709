"""Link-graph operators: outlink extraction and a deterministic
fixed-point PageRank.

A web-curation pipeline weights pages by link centrality (Common Crawl
publishes harmonic/PageRank centrality per host; quality-weighted
sampling uses it as a prior). Two pieces:

- `extract_links`: outlink edges straight off the raw `html` column as
  pure JVM Column algebra (regexp + explode) — runs at scan speed next
  to the WARC ingest, no Python.
- `pagerank`: the classic damped power iteration, but in EXACT integer
  arithmetic (ranks are bigint micro-units of a fixed total mass, every
  division is floor division) so the result is bit-identical across
  engines, partitionings and summation orders — floating-point PageRank
  diverges across engines in the low bits because double addition is
  not associative, which would make a value oracle flaky by design.

Scale shape: each iteration is ONE shuffle (per-edge contributions
grouped by destination) plus a scalar aggregate for the dangling mass;
the degree table joins on the same key as the contribution join. Every
iteration ends in localCheckpoint() so Catalyst's plan doesn't grow
with the iteration count (the connected-components loop's discipline —
persist alone leaves the logical plan chaining and the plan STRING
alone OOMs the driver around iteration 8). At 10^12 nodes the
edge join is the dominant cost and partitions by dst — skewed in-degree
(a popular page) is absorbed by map-side partial aggregation of the
sum, so no salting is needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HREF_RE = r'href="([^"]*)"'


def extract_links(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """(src, dst) outlink edges from raw HTML: every absolute
    http(s) `href="..."` attribute value, distinct, self-loops dropped.
    Relative links are out of scope (resolving them needs a base-URL
    join; canonicalize with functions.urltools downstream if needed).
    Accepts `html` as string or binary (decoded as UTF-8 with
    replacement, matching the extractor's tolerance)."""
    html = F.col(html_col)
    if dict(pages.dtypes)[html_col] == "binary":
        html = F.decode(html, "UTF-8")
    links = F.explode(
        F.regexp_extract_all(html, F.lit(_HREF_RE), 1)
    ).alias("dst")
    return (
        pages.select(F.col(url_col).alias("src"), links)
        .where(F.col("dst").rlike(r"^https?://"))
        .where(F.col("dst") != F.col("src"))
        .distinct()
    )


_ANCHOR_RE = r'<a href="([^"]*)"[^>]*>([^<]*)</a>'


def extract_anchor_texts(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """(src, dst, anchor) triples: every absolute http(s) `<a>` element
    with its inner text (anchor text is the classic relevance signal a
    crawl-derived search/quality corpus mines). Pure JVM Column algebra:
    one regexp_extract_all for the full `<a ...>text</a>` matches, then
    per-element group extraction inside `transform` — no Python, runs at
    scan speed next to the ingest. Nested elements inside the anchor are
    out of scope (the `[^<]*` body stops at the first tag), matching the
    oracle's RE2 semantics exactly.

    Unlike `extract_links` this keeps duplicates: the same (src, dst)
    link with two different anchor texts is two signals."""
    html = F.col(html_col)
    if dict(pages.dtypes)[html_col] == "binary":
        html = F.decode(html, "UTF-8")
    matches = F.regexp_extract_all(html, F.lit(_ANCHOR_RE), 0)
    pairs = F.transform(
        matches,
        lambda m: F.struct(
            F.regexp_extract(m, _ANCHOR_RE, 1).alias("dst"),
            F.regexp_extract(m, _ANCHOR_RE, 2).alias("anchor"),
        ),
    )
    return (
        pages.select(F.col(url_col).alias("src"), F.explode(pairs).alias("p"))
        .select("src", F.col("p.dst").alias("dst"), F.col("p.anchor").alias("anchor"))
        .where(F.col("dst").rlike(r"^https?://"))
        .where(F.col("dst") != F.col("src"))
    )


def degree_stats(
    edges: DataFrame,
    nodes: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-node (id, out_deg, in_deg) over `edges`, zero-filled for
    isolated nodes — the crawl-frontier/link-prior diagnostic. Two
    single-key aggregations + two left joins on the node id; at web
    scale each is one shuffle on the same key and AQE coalesces the
    post-agg sides."""
    out_d = edges.groupBy(F.col(src_col).alias("id")).agg(
        F.count("*").alias("out_deg")
    )
    in_d = edges.groupBy(F.col(dst_col).alias("id")).agg(
        F.count("*").alias("in_deg")
    )
    return (
        nodes.select(F.col(id_col).alias("id"))
        .distinct()
        .join(out_d, "id", "left")
        .join(in_d, "id", "left")
        .select(
            "id",
            F.coalesce("out_deg", F.lit(0)).cast("long").alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).cast("long").alias("in_deg"),
        )
    )


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 10,
    damping_pct: int = 85,
    total_mass: int = 10**12,
) -> DataFrame:
    """Damped PageRank over `edges` restricted to `nodes`, `n_iter`
    power iterations, in exact bigint arithmetic: every node starts at
    base = total_mass // N; one step is

        r'(v) = ((100 - d) * base
                 + d * (sum over in-edges u->v of r(u) // deg(u)
                        + dangling_sum // N)) // 100

    with d = damping_pct. Floor divisions leak a deterministic dust of
    mass (bounded by N + 100 units per step) instead of accumulating
    float error. Returns (id, rank) with rank in mass units — divide by
    total_mass for the probability. Deterministic: same result on any
    cluster size, any partitioning, and replayable in ANSI SQL.

    Self-loops and duplicate edges are removed; edges with endpoints
    outside `nodes` are dropped (a crawl's outlinks routinely point at
    pages outside the fetched set)."""
    if not 0 < damping_pct < 100:
        raise ValueError("damping_pct must be in (0, 100)")
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    # ids is re-read inside EVERY iteration (contribution left-join and
    # the dangling anti-join) — persist it or the node-set distinct
    # shuffle re-executes once per eager localCheckpoint
    ids = nodes.select(F.col(id_col).alias("id")).distinct().persist()
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .join(ids.withColumnRenamed("id", "src"), "src", "leftsemi")
        .join(ids.withColumnRenamed("id", "dst"), "dst", "leftsemi")
        .persist()
    )
    n = ids.count()
    if n == 0:
        e.unpersist()
        ids.unpersist()
        return ids.select("id", F.lit(0).cast("bigint").alias("rank"))
    base = total_mass // n
    deg = e.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg")).persist()
    # nodes with no out-edges contribute their whole rank to the
    # dangling pool each step; the set is static, the sum is not
    dangling_ids = ids.join(deg, "id", "leftanti").persist()
    ranks = ids.select("id", F.lit(base).cast("bigint").alias("rank")).persist()
    keep = 100 - damping_pct
    for _ in range(n_iter):
        # the dangling-rank sum rides INTO the iteration's single job as a
        # broadcast 1-row aggregate (constant-key hash join, not a
        # crossJoin/BNLJ) instead of a separate .first() action — one job
        # per iteration, which at crawl scale halves driver round-trips
        # and at sandbox scale halves scheduling overhead
        dang = (
            dangling_ids.join(ranks, "id")
            .agg(F.coalesce(F.sum("rank"), F.lit(0)).alias("_dang_sum"))
            .select(F.lit(1).alias("_k"), "_dang_sum")
        )
        # `div` is exact integer floor division — float `/` followed by a
        # cast would silently lose low bits above 2^53
        share = (
            ranks.join(deg, "id")
            .select(F.col("id").alias("src"), F.expr("rank div deg").alias("_s"))
        )
        contrib = (
            e.join(share, "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("_s").alias("c"))
        )
        new_ranks = (
            ids.join(contrib, "id", "left")
            .withColumn("_k", F.lit(1))
            .join(F.broadcast(dang), "_k")
            .select(
                "id",
                F.expr(
                    f"cast(({keep} * cast({base} as bigint)"
                    f" + {damping_pct} * (coalesce(c, 0)"
                    f" + (_dang_sum div cast({n} as bigint)))) div 100"
                    " as bigint)"
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        ranks.unpersist()
        ranks = new_ranks
    out = ranks.orderBy(F.col("rank").desc(), F.col("id").asc())
    e.unpersist()
    deg.unpersist()
    dangling_ids.unpersist()
    ids.unpersist()
    return out
