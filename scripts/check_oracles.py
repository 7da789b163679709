"""Side-by-side Spark-vs-DuckDB oracle check, mirroring the driver's gate.

Usage: python scripts/check_oracles.py [query ...]   (default: the FULL
registry — every queries() entry; rows-only entries get a spark_rows
count and err="no_oracle", exactly the driver's record shape)
Env: SF_DIR (default /root/testdata/sf0.01)
     CORRECTNESS_OUT (default <repo>/CORRECTNESS_local.json)

Writes a driver-schema JSON — per query {rows_match, schema_match,
hash_match, spark_rows, oracle_rows, err} — so the round's hard
correctness evidence is self-contained even when the driver's own
CORRECTNESS_r{N}.json covers a frozen subset of the registry (it has
recorded the same 50-query snapshot since r04; this file is the committed
record for the other entries, same pattern as BENCH_local.json).
"""

from __future__ import annotations

import json
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    out_path = os.environ.get(
        "CORRECTNESS_OUT", os.path.join(REPO, "CORRECTNESS_local.json")
    )
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
    queries = E.queries()
    oracles = E.oracle_sql()
    names = sys.argv[1:] or list(queries)
    failures = 0
    records: dict[str, dict] = {}
    for name in names:
        rec = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        records[name] = rec
        if name not in oracles:
            # rows-only entry: the driver records the Spark row count and
            # err="no_oracle"; a query that ERRORS must still fail the gate
            try:
                sdf = queries[name](spark, sf_dir).toPandas()
                rec["spark_rows"] = int(len(sdf))
                rec["err"] = "no_oracle"
                print(f"{name}: NO ORACLE (rows-only, {len(sdf)} rows)")
            except Exception as exc:
                rec["err"] = f"{type(exc).__name__}: {exc}"[:500]
                print(f"{name}: ERROR {exc}")
                failures += 1
            continue
        try:
            sdf = queries[name](spark, sf_dir).toPandas()
            odf = con.execute(oracles[name]).df()
            rec["spark_rows"] = int(len(sdf))
            rec["oracle_rows"] = int(len(odf))
            sdf = sdf[sorted(sdf.columns)].reset_index(drop=True)
            odf = odf[sorted(odf.columns)].reset_index(drop=True)
            rec["rows_match"] = bool(sdf.shape[0] == odf.shape[0])
            rec["schema_match"] = bool(list(sdf.columns) == list(odf.columns))
            rec["hash_match"] = bool(
                rec["rows_match"]
                and rec["schema_match"]
                and all(
                    (sdf[c].astype(str).values == odf[c].astype(str).values).all()
                    for c in sdf.columns
                )
            )
            ok = rec["hash_match"]
        except Exception as exc:  # pragma: no cover - diagnostic path
            rec["err"] = f"{type(exc).__name__}: {exc}"[:500]
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
    with open(out_path, "w") as fh:
        json.dump(records, fh, indent=1)
    n_green = sum(1 for r in records.values() if r["hash_match"])
    n_rows_only = sum(1 for r in records.values() if r["err"] == "no_oracle")
    print(
        f"wrote {out_path}: {len(records)} queries, {n_green} full-match, "
        f"{n_rows_only} rows-only, {failures} failures"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
