"""Local replica of the driver's correctness gate.

Runs every __spark_entry__ query at the given sf dir AND its DuckDB oracle,
compares row count, column names (sorted), and order-insensitive values
(rows sorted by all columns, compared after canonicalizing floats).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entrymod
from neo4j_graph_algorithms_spark.session import build_session

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()

    # Phase 1: all oracles first (before Spark eats the fd budget)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle_results: dict[str, pd.DataFrame | Exception] = {}
    for name in qs:
        if only and name not in only:
            continue
        if name not in sqls:
            continue
        try:
            oracle_results[name] = con.execute(sqls[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            oracle_results[name] = e
    con.close()

    # Phase 2: Spark queries + compare
    spark = build_session(app_name="correctness", master="local[8]", shuffle_partitions=8)
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: spark query raised: {e}")
            failures += 1
            continue
        if name not in sqls:
            print(f"[rows-only] {name}: {len(spark_pdf)} rows (no oracle)")
            continue
        oracle_pdf = oracle_results[name]
        if isinstance(oracle_pdf, Exception):
            print(f"[FAIL] {name}: oracle raised: {oracle_pdf}")
            failures += 1
            continue
        a, b = canon(spark_pdf), canon(oracle_pdf)
        if list(a.columns) != list(b.columns):
            print(f"[FAIL] {name}: columns {list(a.columns)} vs {list(b.columns)}")
            failures += 1
            continue
        if len(a) != len(b):
            print(f"[FAIL] {name}: rows {len(a)} vs {len(b)}")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
            print(f"[OK]   {name}: {len(a)} rows")
        except AssertionError as e:
            print(f"[FAIL] {name}: value mismatch\n{str(e)[:800]}")
            failures += 1
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
