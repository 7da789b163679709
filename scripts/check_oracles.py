"""Side-by-side Spark-vs-DuckDB oracle check, mirroring the driver's gate.

Usage: python scripts/check_oracles.py [query ...]   (default: all with oracles)
Env: SF_DIR (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"create view {t} as select * from parquet_scan('{path}')")
    oracles = E.oracle_sql()
    names = sys.argv[1:] or [n for n in E.queries() if n in oracles]
    failures = 0
    for name in names:
        if name not in oracles:
            print(f"{name}: NO ORACLE (rows-only)")
            continue
        try:
            sdf = E.queries()[name](spark, sf_dir).toPandas()
            odf = con.execute(oracles[name]).df()
            sdf = sdf[sorted(sdf.columns)].reset_index(drop=True)
            odf = odf[sorted(odf.columns)].reset_index(drop=True)
            ok = (
                sdf.shape == odf.shape
                and list(sdf.columns) == list(odf.columns)
                and all(
                    (sdf[c].astype(str).values == odf[c].astype(str).values).all()
                    for c in sdf.columns
                )
            )
        except Exception as exc:  # pragma: no cover - diagnostic path
            print(f"{name}: ERROR {exc}")
            failures += 1
            continue
        print(f"{name}: {'MATCH' if ok else 'MISMATCH'} {sdf.shape}")
        if not ok:
            failures += 1
            if sdf.shape == odf.shape:
                for c in sdf.columns:
                    bad = sdf[c].astype(str).values != odf[c].astype(str).values
                    if bad.any():
                        i = int(bad.argmax())
                        print(f"  col {c} row {i}: spark={sdf[c].iloc[i]} oracle={odf[c].iloc[i]}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
