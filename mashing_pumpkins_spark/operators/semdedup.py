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
# pairwise-prune scoring block budget (elements of the dot-matrix slice
# held at once: ~32 MB of float64) — module-level so the block-boundary
# test can shrink it and force many blocks on a small cluster
_PRUNE_BLOCK_ELEMS = 4_000_000


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
# Arrow path wins; both compute the IDENTICAL integer formula.
# Round-8 measurement: Catalyst evaluates the aggregate/zip_with lambdas of
# the literal expression INTERPRETED, per element — at k=10, dim=64 that is
# ~640 interpreted evals per row and the assignment dominated every Lloyd
# iteration (~3-4 s/iteration at 20k rows where the numpy path is ~0.3 s).
# `auto` therefore now always picks the numpy backend, which round 8 made
# exact for ALL magnitudes (per-batch float64-exactness proof with an
# integer fallback — see _assigned); the literal path remains available
# explicitly and the backend-equality test pins the two identical.
_LITERAL_ASSIGN_MAX_K = 64


def _assigned(
    quant: DataFrame,
    centroids: list[tuple[int, list[int], int]],
    backend: str = "auto",
) -> DataFrame:
    """quant + (_cid long, _dist2 long) columns for the nearest centroid.

    backend='literal' folds the centroids into a pure-Column projection
    (no join/shuffle/Python);
    backend='numpy' (the `auto` choice since round 8) is ONE mapInArrow
    stage computing D = norm2[:,None] - 2*(Q @ C.T) + cn2[None,:]. Per
    batch it proves the float64 BLAS path exact (every intermediate is an
    integer below 2^53 when 4 * dim * max|q| * max|c| < 2^53 — true for
    every committed config by orders of magnitude) and otherwise falls
    back to int64 matmul (exact below 2^62) or object-int matmul
    (arbitrary precision), so the integers equal the literal expression's
    for ALL magnitudes; np.argmin breaks ties to the smaller cid exactly
    like the struct ordering."""
    if backend == "auto":
        backend = "numpy"
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
    cmax = float(np.abs(cmat).max()) if cmat.size else 0.0
    cmat_i = cmat.astype(np.int64)
    cn2_i = cn2.astype(np.int64)

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
            flat_i = qcol.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
            qmat_i = flat_i.reshape(len(qcol), dim)
            n2_i = (
                b.column(b.schema.get_field_index("norm2"))
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            qmax = float(np.abs(qmat_i).max()) if qmat_i.size else 0.0
            # exactness dispatch (integers only, no estimation): every
            # intermediate of D = n2 - 2*(Q @ C.T) + cn2 is bounded by
            # 4 * dim * max|q| * max|c|; float64 is exact below 2^53,
            # int64 below 2^62, and object-ints always.
            bound = 4.0 * dim * max(qmax, 1.0) * max(cmax, 1.0)
            if bound < float(1 << 53):
                d = (
                    n2_i.astype(np.float64)[:, None]
                    - 2.0 * (qmat_i.astype(np.float64) @ cmat.T)
                    + cn2[None, :]
                )
                a = d.argmin(axis=1)
                dmin = d[np.arange(len(a)), a].astype(np.int64)
            elif bound < float(1 << 62):
                d = n2_i[:, None] - 2 * (qmat_i @ cmat_i.T) + cn2_i[None, :]
                a = d.argmin(axis=1)
                dmin = d[np.arange(len(a)), a]
            else:
                d = (
                    n2_i.astype(object)[:, None]
                    - 2 * (qmat_i.astype(object) @ cmat_i.astype(object).T)
                    + cn2_i.astype(object)[None, :]
                )
                a = d.argmin(axis=1).astype(np.int64)
                dmin = np.array(
                    [int(d[i, a[i]]) for i in range(len(a))], dtype=np.int64
                )
            cols = list(b.columns) + [
                pa.array(cids[a], type=pa.int64()),
                pa.array(dmin, type=pa.int64()),
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
        # ONE map-side-combined shuffle per iteration (round 8): collect the
        # <= k*dim (cid, pos, sum, count) rows and apply the exact floor
        # division driver-side — Python's // on ints IS the _floordiv
        # semantics ((s - ((s%n)+n)%n)/n), so the centroid integers are
        # unchanged; the second groupBy(cid) + sort_array(collect_list)
        # shuffle the old shape paid per iteration disappears.
        sums = (
            assigned.groupBy("cid", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        by_cid: dict[int, dict[int, int]] = {}
        for r in sums:
            by_cid.setdefault(int(r["cid"]), {})[int(r["pos"])] = int(r["s"]) // int(
                r["n"]
            )
        updated = {
            cid: [pc[p] for p in sorted(pc)] for cid, pc in by_cid.items()
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
        ranked = pts.withColumn("rank", rank)
        # Within-cluster pairwise prune (round 8): ONE applyInPandas over
        # the (cluster_id, _salt) groups the rank window already
        # partitioned by — no second shuffle — computing the g x g dot
        # matrix with numpy instead of the old self-join whose
        # aggregate/zip_with dot was evaluated INTERPRETED per vector
        # element (g^2 * dim lambda evals per cluster dominated the
        # operator). Decision semantics are unchanged and exact: p is
        # removed iff some lower-ranked q in its group has dot > 0 and
        # dot^2 * 10^12 >= tau_ppm^2 * norm2_p * norm2_q. The dot matrix
        # is float64 (exact when dim * max|q|^2 < 2^53 — every committed
        # config by orders of magnitude — else object-int matmul); the
        # 128-bit comparison runs in float64 with a relative-error margin
        # and only margin-straddling pairs re-test in exact Python ints,
        # so the kept set equals the DECIMAL(38,0) SQL form bit for bit
        # (the unrolled-CTE oracle pins it).
        import numpy as np
        import pandas as pd

        tau2 = int(tau_ppm) ** 2
        id_sql_type = ranked.schema[id_col].dataType.simpleString()
        out_schema = (
            f"{id_col} {id_sql_type}, cluster_id bigint, dist2 bigint, kept boolean"
        )

        def prune(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("rank", kind="mergesort").reset_index(drop=True)
            g = len(pdf)
            q = np.stack(pdf["q"].to_numpy()).astype(np.int64) if g else np.zeros((0, 1), np.int64)
            n2 = pdf["norm2"].to_numpy().astype(np.int64)
            removed = np.zeros(g, dtype=bool)
            if g > 1:
                qmax = float(np.abs(q).max()) if q.size else 0.0
                dim_g = q.shape[1]
                f64_exact = dim_g * max(qmax, 1.0) ** 2 < float(1 << 53)
                qf = q.astype(np.float64)
                n2f = n2.astype(np.float64)
                # row-blocked scoring: the dot matrix is never materialized
                # whole — blocks of ~4M elements bound task memory at
                # ~32 MB regardless of cluster size (an uncapped cluster of
                # 10^5 members would otherwise need an 80 GB g x g matrix;
                # the cap discipline is max_cluster_size, but the operator
                # must not OOM when a caller leaves it unset)
                bs = max(1, _PRUNE_BLOCK_ELEMS // g)
                for i0 in range(1, g, bs):
                    i1 = min(i0 + bs, g)
                    # only lower-ranked columns j < i can remove row i
                    jmax = i1 - 1
                    if f64_exact:
                        dots = qf[i0:i1] @ qf[:jmax].T
                        exact_dots = None
                    else:
                        exact_dots = (
                            q[i0:i1].astype(object) @ q[:jmax].astype(object).T
                        )
                        dots = exact_dots.astype(np.float64)
                    lhs = (dots * dots) * 1e12
                    rhs = float(tau2) * (n2f[i0:i1, None] * n2f[None, :jmax])
                    margin = 1e-9 * np.maximum(np.abs(lhs), np.abs(rhs))
                    sure_ge = lhs >= rhs + margin
                    near = ~(sure_ge | (lhs <= rhs - margin))
                    hit = (dots > 0) & sure_ge
                    if near.any():
                        for bi, j in zip(*np.nonzero(near)):
                            i = i0 + bi
                            dij = (
                                int(exact_dots[bi, j])
                                if exact_dots is not None
                                else int(
                                    np.dot(q[i].astype(object), q[j].astype(object))
                                )
                            )
                            hit[bi, j] = dij > 0 and dij * dij * (
                                10**12
                            ) >= tau2 * int(n2[i]) * int(n2[j])
                    # p (global row i, rank order) removed iff any hit
                    # against a strictly lower-ranked j (j < i)
                    col = np.arange(jmax)[None, :]
                    row = np.arange(i0, i1)[:, None]
                    removed[i0:i1] = (hit & (col < row)).any(axis=1)
            return pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "cluster_id": pdf["cluster_id"].astype("int64"),
                    "dist2": pdf["dist2"].astype("int64"),
                    "kept": ~removed,
                }
            )

        out = ranked.groupBy("cluster_id", "_salt").applyInPandas(prune, out_schema)
        out = out.localCheckpoint(eager=True)
    finally:
        quant.unpersist()
    return out
