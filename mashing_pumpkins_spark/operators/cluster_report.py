"""Cluster-quality audit — the report a dedup run checks BEFORE dropping
cluster members.

Connected components over LSH-verified edges can chain documents together
transitively (A~B~C admits A-C pairs below the pairwise threshold), so a
production run audits each cluster's cohesion against its representative
before deleting anything: per cluster, the member count and the min/mean
sketch Jaccard of every member against the hub (the cluster id, by
construction the minimum member). A cluster whose min_hub_jaccard is far
below the verify threshold is a chaining artifact to review, not a safe
drop.

Scale shape: two equi-joins (member -> its signature; cluster id -> the
hub's signature — one row per cluster, broadcastable) and one groupBy per
cluster id; the Jaccard runs as the same JVM Column expression the
estimator suite uses. No shuffle carries text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.estimators import jaccard_similarity


def cluster_quality_report(
    clusters: DataFrame,
    signatures: DataFrame,
    url_col: str = "url",
    cluster_col: str = "cluster_id",
    sig_col: str = "sig",
) -> DataFrame:
    """(cluster_id, n_members, min_hub_jaccard, avg_hub_jaccard) per
    cluster. `clusters` is run_pipeline's output (members INCLUDING the
    hub row url == cluster_id); `signatures` maps url -> sketch array
    (use an un-truncated config for exact values, the production k for
    estimates). The hub's own row contributes Jaccard 1.0."""
    members = clusters.join(
        signatures.select(F.col(url_col), F.col(sig_col).alias("_ms")), url_col
    )
    # Restrict to ACTUAL hub rows before broadcasting: signatures holds one
    # row per document, so broadcasting it whole would ship every sketch in
    # the corpus to every executor. A leftsemi join against the distinct
    # cluster ids keeps one row per cluster — that set is what the
    # broadcast-size reasoning in the module docstring is about.
    hub_ids = clusters.select(F.col(cluster_col).alias(url_col)).distinct()
    hubs = (
        signatures.join(hub_ids, url_col, "leftsemi")
        .select(F.col(url_col).alias(cluster_col), F.col(sig_col).alias("_hs"))
    )
    # LEFT join: a cluster whose hub url is missing from `signatures` must
    # surface (null hub Jaccard) rather than vanish from the audit.
    joined = members.join(F.broadcast(hubs), cluster_col, "left")
    # per-member values rounded to 6 BEFORE aggregation: the report's
    # stated precision, and it makes the aggregate replayable bit-for-bit
    # by an engine that rounds pair Jaccards the same way
    hub_jacc = F.round(
        F.when(F.col(url_col) == F.col(cluster_col), F.lit(1.0))
        .when(F.col("_hs").isNull(), F.lit(None).cast("double"))
        .otherwise(jaccard_similarity(F.col("_ms"), F.col("_hs"))),
        6,
    )
    return (
        joined.select(F.col(cluster_col), hub_jacc.alias("_hj"))
        .groupBy(cluster_col)
        .agg(
            F.count("*").alias("n_members"),
            F.round(F.min("_hj"), 6).alias("min_hub_jaccard"),
            F.round(F.avg("_hj"), 6).alias("avg_hub_jaccard"),
        )
        .orderBy(cluster_col)
    )


def finalize_dedup(
    clusters: DataFrame,
    pages: DataFrame,
    url_col: str = "url",
    cluster_col: str = "cluster_id",
    text_col: str = "text",
    score: Column | None = None,
) -> DataFrame:
    """The dedup run's actual deliverable: per page, which cluster it
    belongs to (null if it has no near-duplicate), which member was
    elected representative, and whether the page is KEPT. Representative
    policy: highest score wins (default: text length — keep the fullest
    copy), ties broken by ascending url so elections are deterministic.
    Unclustered pages are kept with null cluster_id/rep_url.

    Scale shape: scores are computed on the scan and only (url, score)
    enters the election — text never shuffles. The election is one
    window over cluster members (dup members are a small fraction of the
    corpus); the final assignment is two equi-joins on url/cluster_id
    carrying ids only. Everything is exact ANSI-SQL-replayable.
    """
    from pyspark.sql import Window

    score_col = score if score is not None else F.length(F.col(text_col))
    scores = pages.select(F.col(url_col), score_col.cast("bigint").alias("_sc"))
    members = clusters.select(url_col, cluster_col).join(scores, url_col)
    w = Window.partitionBy(cluster_col).orderBy(
        F.col("_sc").desc(), F.col(url_col).asc()
    )
    reps = (
        members.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(F.col(cluster_col), F.col(url_col).alias("rep_url"))
    )
    assigned = (
        pages.select(url_col)
        .join(clusters.select(url_col, cluster_col), url_col, "left")
        .join(reps, cluster_col, "left")
    )
    kept = F.coalesce(F.col(url_col) == F.col("rep_url"), F.lit(True))
    return assigned.select(
        F.col(url_col),
        F.col(cluster_col),
        F.col("rep_url"),
        kept.alias("kept"),
    ).orderBy(url_col)
