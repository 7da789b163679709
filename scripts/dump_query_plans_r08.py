#!/usr/bin/env python
"""Dump .explain("formatted") for named queries into plans/r08/.

Usage:
    python scripts/dump_query_plans_r08.py <tag> q1 q2 ...

Writes plans/r08/<query>_<tag>.txt for each query (tag = before|after).
Env: ENTRY_PATH — directory whose __spark_entry__/mashing_pumpkins_spark
to import (default: this repo; point it at a round-start snapshot to
produce the _before plans). SF_DIR — data dir (default sf0.01; the plan
SHAPE is scale-independent). Output always lands in THIS repo's
plans/r08/ regardless of ENTRY_PATH.

Queries that execute eager sub-jobs internally (the checkpointed
pipeline, semdedup's Lloyd loop) show the plan of the RETURNED frame;
the narrative in OPTIMIZATION_r08.md covers their internal stages.
"""

from __future__ import annotations

import contextlib
import io
import os
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
ENTRY = os.environ.get("ENTRY_PATH", str(REPO))
sys.path.insert(0, ENTRY)

OUT_DIR = REPO / "plans" / "r08"


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    OUT_DIR.mkdir(parents=True, exist_ok=True)

    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = E.queries()
    for name in names:
        if name not in queries:
            print(f"SKIP unknown query {name}")
            continue
        df = queries[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = OUT_DIR / f"{name}_{tag}.txt"
        path.write_text(
            f"# {name} — explain('formatted'), tag={tag}, entry={ENTRY}\n"
            + buf.getvalue()
        )
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
