"""Iceberg-backed stage checkpoint store — the production storage binding.

Same contract as ParquetCheckpointStore (has/read/write/get_or_compute with
config-hash-guarded resume and per-partition lineage), bound to an Iceberg
catalog: each stage commits as `{namespace}.{stage}` via
``df.writeTo(...).createOrReplace()`` — an ATOMIC snapshot commit (the
parquet store emulates this with tmp-dir rename), and the manifest payload
(config hash, rows, wall time, per-partition counts) rides in Iceberg TABLE
PROPERTIES so a resume inspects the catalog, not a side file. Snapshot ids
give time travel over pipeline reruns for free.

This container ships no Iceberg runtime jar, so the class verifies the
catalog is actually configured at construction and raises a clear error
otherwise; the parquet store exercises the identical resume logic in tests
(plans/checkpoint.py docstring). Everything here is the public Iceberg
Spark integration (iceberg.apache.org/docs/latest/spark-writes), nothing
container-specific.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession

from .checkpoint import StageResult

_PROP_PREFIX = "mashing_pumpkins"


class IcebergCheckpointStore:
    """Stage store over an Iceberg catalog namespace.

    ``namespace`` example: "lake.pipeline_run_42" (catalog.db). Requires a
    session configured with an Iceberg catalog, e.g.::

        spark.sql.catalog.lake = org.apache.iceberg.spark.SparkCatalog
        spark.sql.catalog.lake.type = hive | hadoop | rest
    """

    def __init__(self, spark: SparkSession, namespace: str, config_hash: str):
        self.spark = spark
        self.namespace = namespace
        self.config_hash = config_hash
        catalog = namespace.split(".", 1)[0]
        impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
        if impl is None:
            raise RuntimeError(
                f"no Iceberg catalog configured under spark.sql.catalog."
                f"{catalog}; set it to org.apache.iceberg.spark.SparkCatalog "
                "(needs the iceberg-spark-runtime jar) or use "
                "ParquetCheckpointStore, which implements the same contract"
            )
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {namespace}")

    def _table(self, stage: str) -> str:
        return f"{self.namespace}.{stage}"

    def _props(self, stage: str) -> dict:
        rows = self.spark.sql(f"SHOW TBLPROPERTIES {self._table(stage)}").collect()
        return {r["key"]: r["value"] for r in rows}

    def has(self, stage: str) -> bool:
        if not self.spark.catalog.tableExists(self._table(stage)):
            return False
        props = self._props(stage)
        return (
            props.get(f"{_PROP_PREFIX}.complete") == "true"
            and props.get(f"{_PROP_PREFIX}.config_hash") == self.config_hash
        )

    def read(self, spark: SparkSession, stage: str) -> DataFrame:
        return spark.read.table(self._table(stage))

    def manifest(self, stage: str) -> dict:
        props = self._props(stage)
        return json.loads(props[f"{_PROP_PREFIX}.manifest"])

    def write(
        self, spark: SparkSession, stage: str, df: DataFrame
    ) -> tuple[DataFrame, StageResult]:
        table = self._table(stage)
        t0 = time.monotonic()
        df.writeTo(table).createOrReplace()  # atomic snapshot commit
        # per-partition lineage from the files metadata table (no rescan)
        files = spark.sql(
            f"SELECT record_count FROM {table}.files"
        ).collect()
        partition_counts = [int(r["record_count"]) for r in files]
        rows = int(sum(partition_counts))
        wall = time.monotonic() - t0
        manifest = {
            "stage": stage,
            "rows": rows,
            "wall_sec": wall,
            "partition_counts": partition_counts,
        }
        props = {
            f"{_PROP_PREFIX}.complete": "true",
            f"{_PROP_PREFIX}.config_hash": self.config_hash,
            f"{_PROP_PREFIX}.manifest": json.dumps(manifest),
        }
        set_clause = ", ".join(
            f"'{k}' = '{v}'" for k, v in props.items()
        )
        spark.sql(f"ALTER TABLE {table} SET TBLPROPERTIES ({set_clause})")
        return (
            self.read(spark, stage),
            StageResult(stage, rows, wall, partition_counts, skipped=False),
        )

    def get_or_compute(
        self, spark: SparkSession, stage: str, compute
    ) -> tuple[DataFrame, StageResult]:
        if self.has(stage):
            meta = self.manifest(stage)
            return (
                self.read(spark, stage),
                StageResult(
                    stage,
                    meta["rows"],
                    0.0,
                    meta.get("partition_counts", []),
                    skipped=True,
                ),
            )
        return self.write(spark, stage, compute())
