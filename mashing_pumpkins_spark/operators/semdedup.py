"""SemDedup-style semantic deduplication over an embedding column.

SemDedup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication") removes semantic duplicates
that exact/near-text dedup cannot see: cluster document embeddings with
k-means, then WITHIN each cluster compare all pairs by cosine
similarity and drop every point that has a sufficiently similar,
higher-ranked neighbour.  The published retention heuristic keeps the
points FARTHEST from their cluster centroid ("edge" examples) — the
rank used here.

Everything is fixed-point integer arithmetic so one run is
bit-identical on any cluster size / partitioning AND the whole job —
k-means iterations included — replays exactly in ANSI SQL (the
oracle unrolls the Lloyd iterations as CTEs):

- quantize:   q[i] = floor(cast(x as double) * 1000) as BIGINT
              (float->double promotion is exact in both engines;
              floor is unambiguous where round() half-cases are not)
- norm2      = sum q[i]^2                        (exact BIGINT)
- seeding:    the k rows with smallest md5(cast(id as string)) —
              a deterministic pseudo-random sample, replayable as
              ORDER BY md5 LIMIT k (TakeOrderedAndProject in Spark)
- Lloyd step: assign to argmin_c dist2(p,c) = norm2_p - 2*dot(p,c)
              + norm2_c, ties to the smaller centroid id; update
              component-wise with EXACT floor division
              (s - ((s % n) + n) % n) / n; empty clusters keep their
              previous centroid
- dedup rank: within the final cluster, (dist2 to centroid DESC,
              id ASC) — farthest-first per the paper
- duplicate:  p is removed iff some q with rank_q < rank_p in the
              same cluster has cos(p, q) >= tau; the comparison is
              exact-rational: dot > 0 AND dot^2 * 10^12 >=
              tau_ppm^2 * norm2_p * norm2_q, evaluated in 128-bit
              (DECIMAL(38,0) in Spark, HUGEINT in the oracle).
              |q[i]| <= ~4e3 at dim 64 bounds every product below
              1e27, far inside both types.

Scale shape: the quantized table is computed once and persisted; each
Lloyd iteration is ONE map-side-combinable groupBy over (cid, pos)
(<= k*dim groups) plus a k-row collect — assignment against the tiny
collected centroid set is pure Column algebra folded into the scan
(array_min over a k-literal struct array, no join, no shuffle, no
Python).  The within-cluster pairwise join is SemDedup's inherent
cost: pick n_clusters ~ n / target_cluster_size, and/or pass
`max_cluster_size` to deterministically salt oversized clusters into
md5-bucketed subclusters (the same cap discipline as the banding
candidate cap) at a documented recall tradeoff.  For n_clusters in
the thousands, swap the literal-array assignment for an int64-numpy
mapInArrow with the identical integer formula; the semantics above
are deliberately backend-free.

Reference parity note: the reference library (mashing-pumpkins) has
no embedding surface; this operator extends the engine's dedup tier
(SURVEY.md §2.3) alongside MinHash/SimHash/substring dedup per the
LLM-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

_SCALE = 1000  # fixed-point quantization scale for embedding components
_DEC = DecimalType(38, 0)


def quantize_embeddings(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, q array<bigint>, norm2 bigint) — the fixed-point view every
    downstream step (and the SQL oracle) works from."""
    q = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(float(_SCALE))).cast("long"),
    )
    return emb.select(
        F.col(id_col),
        q.alias("q"),
        F.aggregate(
            F.transform(q, lambda v: v * v), F.lit(0).cast("long"), lambda a, v: a + v
        ).alias("norm2"),
    )


def _dot_lit(qcol: Column, centroid: list[int]) -> Column:
    """Exact BIGINT dot product of a quantized column with a literal
    centroid vector (k*dim literal nodes total — fine for the
    literal-assignment regime; see module docstring for large k)."""
    lits = F.array(*[F.lit(int(v)).cast("long") for v in centroid])
    return F.aggregate(
        F.zip_with(qcol, lits, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _assign_expr(centroids: list[tuple[int, list[int], int]]) -> Column:
    """(cid, dist2) of the nearest centroid: array_min over
    struct(dist2, cid) implements argmin with ties to the smaller cid."""
    entries = [
        F.struct(
            (
                F.col("norm2")
                - F.lit(2).cast("long") * _dot_lit(F.col("q"), cvec)
                + F.lit(int(cn2)).cast("long")
            ).alias("d"),
            F.lit(int(cid)).alias("cid"),
        )
        for cid, cvec, cn2 in centroids
    ]
    best = F.array_min(F.array(*entries))
    return F.struct(best["cid"].alias("cid"), best["d"].alias("dist2"))


# above this many centroids the k*dim literal expression tree stops being
# the right plan (Catalyst build time, codegen limits) and the vectorized
# Arrow path wins; both compute the IDENTICAL integer formula
_LITERAL_ASSIGN_MAX_K = 64


def _assigned(
    quant: DataFrame,
    centroids: list[tuple[int, list[int], int]],
    backend: str = "auto",
) -> DataFrame:
    """quant + (_cid long, _dist2 long) columns for the nearest centroid.

    backend='literal' folds the centroids into a pure-Column projection
    (no join/shuffle/Python — the plan audited in PLANS.md);
    backend='numpy' is the large-k scale path: ONE mapInArrow stage
    computing D = norm2[:,None] - 2*(Q @ C.T) + cn2[None,:] with
    float64 BLAS, which is EXACT for this operator's bounds (|q[i]|
    <= ~4e3 at dim 64 keeps every product <= 2^24 and every partial
    sum < 2^53, so no float64 rounding can occur) and np.argmin
    breaks ties to the smaller cid exactly like the struct ordering."""
    if backend == "auto":
        backend = "literal" if len(centroids) <= _LITERAL_ASSIGN_MAX_K else "numpy"
    if backend == "literal":
        a = _assign_expr(centroids)
        return quant.withColumn("_cid", a["cid"].cast("long")).withColumn(
            "_dist2", a["dist2"]
        )
    if backend != "numpy":
        raise ValueError(f"unknown assign backend: {backend!r}")

    import numpy as np
    import pyarrow as pa

    cmat = np.array([c[1] for c in centroids], dtype=np.float64)
    cn2 = np.array([c[2] for c in centroids], dtype=np.float64)
    cids = np.array([c[0] for c in centroids], dtype=np.int64)
    dim = cmat.shape[1]

    from pyspark.sql.types import LongType, StructField, StructType

    # StructType.add MUTATES; build a fresh schema so quant's is untouched
    out_schema = StructType(
        list(quant.schema.fields)
        + [StructField("_cid", LongType()), StructField("_dist2", LongType())]
    )
    from pyspark.sql.pandas.types import to_arrow_schema

    arrow_schema = to_arrow_schema(out_schema)

    def assign_batches_typed(batches):
        for b in batches:
            qcol = b.column(b.schema.get_field_index("q"))
            flat = qcol.flatten().to_numpy(zero_copy_only=False)
            qmat = flat.astype(np.float64).reshape(len(qcol), dim)
            n2 = (
                b.column(b.schema.get_field_index("norm2"))
                .to_numpy(zero_copy_only=False)
                .astype(np.float64)
            )
            d = n2[:, None] - 2.0 * (qmat @ cmat.T) + cn2[None, :]
            a = d.argmin(axis=1)
            cols = list(b.columns) + [
                pa.array(cids[a], type=pa.int64()),
                pa.array(d[np.arange(len(a)), a].astype(np.int64), type=pa.int64()),
            ]
            yield pa.RecordBatch.from_arrays(cols, schema=arrow_schema)

    return quant.mapInArrow(assign_batches_typed, out_schema)


def _floordiv(s: Column, n: Column) -> Column:
    """Exact floor division for possibly-negative BIGINT sums, written
    so the identical expression replays in ANSI SQL (the oracle uses
    HUGEINT `//`).  (s - posmod) is exactly divisible, and the decimal
    quotient is integral, so the floor/cast is exact — double division
    would round sums past 2^53."""
    posmod = ((s % n) + n) % n
    return (
        F.floor((s - posmod).cast(_DEC) / n.cast(_DEC)).cast("long")
    )


def fit_centroids(
    quant: DataFrame,
    n_clusters: int,
    n_iters: int,
    id_col: str = "vec_id",
    assign_backend: str = "auto",
) -> list[tuple[int, list[int], int]]:
    """Deterministic fixed-point Lloyd iterations; returns the final
    [(cid, vector, norm2)] list (k rows — driver-side by design, like
    ann.ivf_cosine_topk's centroid table)."""
    if n_clusters < 1:
        raise ValueError(f"n_clusters must be >= 1, got {n_clusters}")
    if n_iters < 0:
        raise ValueError(f"n_iters must be >= 0, got {n_iters}")
    seed_rows = (
        quant.orderBy(F.md5(F.col(id_col).cast("string").cast("binary")), F.col(id_col))
        .limit(n_clusters)
        .collect()
    )
    centroids = [
        (i, [int(v) for v in r["q"]], int(r["norm2"]))
        for i, r in enumerate(seed_rows)
    ]
    for _ in range(n_iters):
        assigned = _assigned(quant, centroids, assign_backend).select(
            F.col("_cid").alias("cid"), F.posexplode("q").alias("pos", "val")
        )
        sums = (
            assigned.groupBy("cid", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .withColumn("comp", _floordiv(F.col("s"), F.col("n")))
            .groupBy("cid")
            .agg(F.sort_array(F.collect_list(F.struct("pos", "comp"))).alias("pc"))
            .collect()
        )
        updated = {
            int(r["cid"]): [int(p["comp"]) for p in r["pc"]] for r in sums
        }
        centroids = [
            (
                cid,
                updated.get(cid, old_vec),
                sum(v * v for v in updated[cid]) if cid in updated else old_n2,
            )
            for cid, old_vec, old_n2 in centroids
        ]
    return centroids


def choose_n_clusters(
    n_docs: int,
    target_cluster_size: int = 500,
    min_clusters: int = 1,
    max_clusters: int = 1 << 20,
) -> int:
    """Pick k for a corpus of ``n_docs``: k = ceil(n / target_cluster_size),
    clamped.  The within-cluster pairwise prune is SemDedup's inherent
    quadratic — its expected cost is n * avg_cluster_size / 2
    comparisons, so holding avg_cluster_size constant keeps per-doc
    work FLAT as the corpus grows (the 100x contract); the k-means side
    scales as n * k dot products per Lloyd iteration, which at
    target 500 stays well under the prune cost until k ~ dim * 10^4.
    target_cluster_size ~ 500 matches the committed 1M probes
    (k=2048 -> avg ~500, prune ~= 2 Lloyd iterations in wall time).
    Pure arithmetic — same inputs, same choice, on any machine; pair
    with max_cluster_size ~= 4 * target_cluster_size to salt the skew
    tail without touching typical clusters."""
    if n_docs < 0:
        raise ValueError(f"n_docs must be >= 0, got {n_docs}")
    if target_cluster_size < 1:
        raise ValueError(
            f"target_cluster_size must be >= 1, got {target_cluster_size}"
        )
    k = -(-n_docs // target_cluster_size)  # ceil
    return max(min_clusters, min(max_clusters, k))


def semantic_text_dedup(
    docs: DataFrame,
    n_clusters: int,
    tau_ppm: int = 980_000,
    n_iters: int = 2,
    dim: int = 64,
    max_cluster_size: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    assign_backend: str = "auto",
    embed_backend: str = "auto",
) -> DataFrame:
    """SemDedup straight off a TEXT column — no external encoder: the
    documents are embedded by the deterministic signed hashed-TF
    projection (functions/embed.embed_documents — Column or Arrow
    backend, identical integers) and the standard fixed-point
    semdedup() pass runs on the result.  Returns
    (id, cluster_id, dist2, kept).

    The default tau is higher than the embedding-input default
    (0.98 vs 0.95): hashed-TF vectors of near-duplicate documents sit
    at cosine ~1 (identical token multisets embed IDENTICALLY — the
    projection is scale-invariant under doc concatenation with itself),
    while topically-similar-but-distinct pages land well below; the
    high threshold keeps this a DEDUP pass, not a topic collapse.
    Everything (embedding included) replays exactly in ANSI SQL."""
    from ..functions.embed import embed_documents

    emb = embed_documents(
        docs, dim=dim, id_col=id_col, text_col=text_col, backend=embed_backend
    )
    return semdedup(
        emb,
        n_clusters=n_clusters,
        tau_ppm=tau_ppm,
        n_iters=n_iters,
        max_cluster_size=max_cluster_size,
        id_col=id_col,
        assign_backend=assign_backend,
    )


def semdedup(
    emb: DataFrame,
    n_clusters: int,
    tau_ppm: int = 950_000,
    n_iters: int = 2,
    max_cluster_size: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign_backend: str = "auto",
) -> DataFrame:
    """Full SemDedup pass: (id, cluster_id, dist2, kept).  `tau_ppm` is
    the cosine threshold in parts-per-million (950_000 = 0.95).
    `max_cluster_size` salts clusters larger than the cap into
    deterministic md5 subclusters before the pairwise stage.
    `assign_backend`: 'literal' | 'numpy' | 'auto' (numpy above
    _LITERAL_ASSIGN_MAX_K centroids) — identical integer semantics."""
    if not 0 < tau_ppm <= 1_000_000:
        raise ValueError(f"tau_ppm must be in (0, 1e6], got {tau_ppm}")
    quant = quantize_embeddings(emb, id_col, vec_col).persist()
    try:
        centroids = fit_centroids(quant, n_clusters, n_iters, id_col, assign_backend)
        pts = _assigned(quant, centroids, assign_backend).select(
            F.col(id_col),
            F.col("q"),
            F.col("norm2"),
            F.col("_cid").alias("cluster_id"),
            F.col("_dist2").alias("dist2"),
        )
        if max_cluster_size is not None:
            if max_cluster_size < 1:
                raise ValueError(
                    f"max_cluster_size must be >= 1, got {max_cluster_size}"
                )
            n_sub = F.ceil(
                F.count(F.lit(1)).over(Window.partitionBy("cluster_id"))
                / F.lit(max_cluster_size)
            ).cast("long")
            salt = (
                F.conv(
                    F.substring(F.md5(F.col(id_col).cast("string").cast("binary")), 1, 8),
                    16,
                    10,
                ).cast("long")
                % n_sub
            )
            pts = pts.withColumn("_salt", salt)
        else:
            pts = pts.withColumn("_salt", F.lit(0).cast("long"))
        rank = F.row_number().over(
            Window.partitionBy("cluster_id", "_salt").orderBy(
                F.col("dist2").desc(), F.col(id_col).asc()
            )
        )
        ranked = pts.withColumn("rank", rank).persist()
        try:
            lo = ranked.select(
                F.col("cluster_id"),
                F.col("_salt"),
                F.col("rank").alias("_rlo"),
                F.col("q").alias("_qlo"),
                F.col("norm2").alias("_n2lo"),
            )
            dot = F.aggregate(
                F.zip_with(F.col("q"), F.col("_qlo"), lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            )
            thr = (dot > 0) & (
                dot.cast(_DEC) * dot.cast(_DEC) * F.lit(10**12).cast(_DEC)
                >= F.lit(int(tau_ppm) ** 2).cast(_DEC)
                * F.col("norm2").cast(_DEC)
                * F.col("_n2lo").cast(_DEC)
            )
            removed = (
                ranked.join(lo, ["cluster_id", "_salt"])
                .where((F.col("_rlo") < F.col("rank")) & thr)
                .select(F.col(id_col))
                .distinct()
            )
            out = ranked.join(
                removed.withColumn("_rm", F.lit(True)), id_col, "left"
            ).select(
                F.col(id_col),
                F.col("cluster_id").cast("long").alias("cluster_id"),
                F.col("dist2"),
                F.coalesce(~F.col("_rm"), F.lit(True)).alias("kept"),
            )
            out = out.localCheckpoint(eager=True)
        finally:
            ranked.unpersist()
    finally:
        quant.unpersist()
    return out
