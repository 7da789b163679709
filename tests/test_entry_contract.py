"""Replica of the driver's correctness gate: run every queries() entry at
sf0.01 and compare against oracle_sql() through DuckDB (row count, column
names, order-insensitive value hash)."""

from __future__ import annotations

import hashlib
import math
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _normalize(v):
    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _value_hash(rows, colnames) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x1f".join(_normalize(row[i]) for i in order) for row in rows
    )
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from '{SF_DIR}/{t}.parquet'"
        )
    return con


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


def test_every_oracle_key_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, ddb, name):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(ORACLES[name])
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    assert spark_cols == duck_cols, f"{name}: column names differ"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: {len(spark_rows)} spark rows vs {len(duck_rows)} oracle rows"
    )
    assert _value_hash(spark_rows, spark_cols) == _value_hash(duck_rows, duck_cols), (
        f"{name}: value hash mismatch"
    )


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    sdf = QUERIES[name](spark, SF_DIR)
    assert sdf.count() >= 0
    assert len(sdf.columns) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0


@pytest.mark.parametrize(
    "name",
    ["sketch_stats", "shingle_jaccard_exact", "shingle_multiplicity",
     "source_sketch_rollup"],
)
def test_shingle_oracles_are_byte_exact_on_non_ascii(spark, tmp_path, name):
    """The engine shingles the UTF-8 byte encoding; the DuckDB oracle now
    shingles hex(encode(text)) windows — they must agree on multibyte text
    (round-1 advice: char-based substr silently diverged off-ASCII)."""
    import pandas as pd

    base = "наïve café 北京 data deduplication ワークロード "
    rows = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                base * 6,
                base * 6 + "экстра хвост",
                "żółć gęślą jaźń " * 8,
                "pure ascii text only here " * 8,
            ],
            "lang": ["ru", "ru", "pl", "en"],
            "source": ["web", "web", "web", "news"],
            "n_chars": [0, 0, 0, 0],
        }
    )
    rows.to_parquet(tmp_path / "documents.parquet")
    sdf = QUERIES[name](spark, str(tmp_path))
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from '{tmp_path}/documents.parquet'"
    )
    res = con.execute(ORACLES[name])
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()
    assert spark_cols == duck_cols
    assert len(spark_rows) == len(duck_rows), name
    assert _value_hash(spark_rows, spark_cols) == _value_hash(duck_rows, duck_cols), name
