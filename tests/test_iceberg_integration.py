"""Iceberg end-to-end integration — SKIP-IF-ABSENT (round-4 verdict #4).

The north star names Iceberg as the checkpoint sink; IcebergCheckpointStore
is code-complete but this container ships no iceberg-spark-runtime jar, so
until now only its failure mode was exercised. This test makes the binding
executable the moment a jar IS available: it looks for the runtime jar in
the conventional places ($ICEBERG_SPARK_RUNTIME_JAR, the pyspark jars dir,
~/.ivy2), and

  - if found: launches a FRESH JVM (subprocess — spark.jars must be on the
    classpath at JVM start, which the shared session fixture cannot
    provide) with a hadoop-type Iceberg catalog in a tmpdir, commits two
    stages through IcebergCheckpointStore, asserts the second run RESUMES
    both (skipped=True via table-property manifests, not side files), and
    asserts each table has a queryable snapshot id in
    `{table}.snapshots` — the time-travel contract.
  - if absent: pytest.skip (reported as SKIPPED, never as passed).
"""

from __future__ import annotations

import glob
import os
import pathlib
import subprocess
import sys
import tempfile
import textwrap

import pytest


def _find_iceberg_jar() -> str | None:
    env = os.environ.get("ICEBERG_SPARK_RUNTIME_JAR")
    if env and os.path.isfile(env):
        return env
    candidates: list[str] = []
    try:
        import pyspark

        candidates += glob.glob(
            os.path.join(
                os.path.dirname(pyspark.__file__), "jars", "iceberg-spark-runtime*.jar"
            )
        )
    except ImportError:  # pragma: no cover
        pass
    candidates += glob.glob(
        os.path.expanduser("~/.ivy2/**/iceberg-spark-runtime*.jar"), recursive=True
    )
    return candidates[0] if candidates else None


_DRIVER = textwrap.dedent(
    """
    import sys

    from pyspark.sql import SparkSession

    jar, warehouse, repo = sys.argv[1], sys.argv[2], sys.argv[3]
    sys.path.insert(0, repo)
    from mashing_pumpkins_spark.plans.iceberg import IcebergCheckpointStore

    spark = (
        SparkSession.builder.master("local[2]")
        .appName("iceberg-integration")
        .config("spark.jars", jar)
        .config("spark.sql.catalog.lake", "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.lake.type", "hadoop")
        .config("spark.sql.catalog.lake.warehouse", warehouse)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def stage_a():
        return spark.range(100).selectExpr("id", "id * 2 as v")

    def stage_b():
        return spark.range(10).selectExpr("id", "id + 1 as w")

    store = IcebergCheckpointStore(spark, "lake.run1", "cafebabe")
    _, ra = store.get_or_compute(spark, "stage_a", stage_a)
    _, rb = store.get_or_compute(spark, "stage_b", stage_b)
    assert not ra.skipped and not rb.skipped
    assert ra.rows == 100 and rb.rows == 10
    assert sum(ra.partition_counts) == 100  # per-partition lineage recorded

    # second pipeline run: both stages must RESUME from the catalog
    store2 = IcebergCheckpointStore(spark, "lake.run1", "cafebabe")
    df_a, ra2 = store2.get_or_compute(
        spark, "stage_a", lambda: (_ for _ in ()).throw(AssertionError("recompute"))
    )
    _, rb2 = store2.get_or_compute(
        spark, "stage_b", lambda: (_ for _ in ()).throw(AssertionError("recompute"))
    )
    assert ra2.skipped and rb2.skipped
    assert df_a.count() == 100

    # a DIFFERENT config hash must invalidate the resume
    store3 = IcebergCheckpointStore(spark, "lake.run1", "deadbeef")
    assert not store3.has("stage_a")

    # time travel: every committed stage has queryable snapshot ids
    for table in ("lake.run1.stage_a", "lake.run1.stage_b"):
        snaps = spark.sql(
            f"SELECT snapshot_id FROM {table}.snapshots"
        ).collect()
        assert len(snaps) >= 1, table
        sid = snaps[-1]["snapshot_id"]
        n = (
            spark.read.option("snapshot-id", sid).format("iceberg").load(table)
        ).count()
        assert n in (100, 10), (table, n)

    # the FULL near-dup pipeline with every stage committed to Iceberg —
    # the north star's literal sentence (checkpoints + mid-pipeline resume)
    from pyspark.sql import functions as F

    from mashing_pumpkins_spark.config import PipelineConfig, SketchConfig
    from mashing_pumpkins_spark.plans.pipeline import run_pipeline

    cfg = PipelineConfig(
        sketch=SketchConfig(nsize=21, maxsize=256, hash_name="xxh64", seed=0),
        n_bands=32,
        rows_per_band=8,
        jaccard_threshold=0.8,
    )
    base = spark.range(120).select(
        F.lpad(F.col("id").cast("string"), 6, "0").alias("url"),
        F.concat(
            F.lit("the quick brown fox jumps over the lazy dog number "),
            # ids 0/1 share text (exact dup), the rest are distinct
            F.when(F.col("id") < 2, F.lit("0")).otherwise(F.col("id").cast("string")),
            F.lit(" with enough trailing content to shingle properly at k twenty one"),
        ).alias("text"),
    )
    pstore = IcebergCheckpointStore(spark, "lake.pipe1", cfg.config_hash())
    clusters, report = run_pipeline(spark, base, cfg, store=pstore)
    got = {(r["url"], r["cluster_id"]) for r in clusters.collect()}
    assert ("000001", "000000") in got, got  # the planted exact-dup pair
    assert len(report.stages) == 7 and not any(s.skipped for s in report.stages)

    # resume: a second run must skip every committed stage
    pstore2 = IcebergCheckpointStore(spark, "lake.pipe1", cfg.config_hash())
    clusters2, report2 = run_pipeline(spark, base, cfg, store=pstore2)
    assert all(s.skipped for s in report2.stages)
    assert {(r["url"], r["cluster_id"]) for r in clusters2.collect()} == got

    print("ICEBERG_INTEGRATION_OK")
    spark.stop()
    """
)


def test_iceberg_store_end_to_end_when_jar_present():
    jar = _find_iceberg_jar()
    if jar is None:
        pytest.skip(
            "no iceberg-spark-runtime jar in this container "
            "(set ICEBERG_SPARK_RUNTIME_JAR to enable)"
        )
    repo = str(pathlib.Path(__file__).resolve().parent.parent)
    with tempfile.TemporaryDirectory(prefix="iceberg_wh_") as warehouse:
        proc = subprocess.run(
            [sys.executable, "-c", _DRIVER, jar, warehouse, repo],
            capture_output=True,
            text=True,
            timeout=600,
        )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "ICEBERG_INTEGRATION_OK" in proc.stdout
