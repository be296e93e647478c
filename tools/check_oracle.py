#!/usr/bin/env python3
"""Dev-only local oracle check (mirrors the driver's DuckDB compare).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<query> parquet dumped by graft.Verify, runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the
<sfDir> parquet tables, and compares row counts, column names, and
value-normalized sorted rows. NOT part of the library — iteration tooling.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # round away one-ulp noise, keep shortest-repr (matches VARCHAR dumps)
        return str(round(v, 9))
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    failed = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchall()
            spark_cols = [d[0] for d in con.description]
            want = con.execute(sql).fetchall()
            want_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failed += 1
            continue
        # driver semantics: sort columns by name, then sort rows
        sidx = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
        widx = sorted(range(len(want_cols)), key=lambda i: want_cols[i])
        s_rows = sorted(tuple(norm(r[i]) for i in sidx) for r in spark)
        w_rows = sorted(tuple(norm(r[i]) for i in widx) for r in want)
        cols_ok = sorted(spark_cols) == sorted(want_cols)
        if not cols_ok:
            print(f"FAIL {name}: cols {sorted(spark_cols)} vs {sorted(want_cols)}")
            failed += 1
        elif s_rows != w_rows:
            diff = [(a, b) for a, b in zip(s_rows, w_rows) if a != b]
            print(f"FAIL {name}: rows {len(s_rows)} vs {len(w_rows)}, "
                  f"first diffs: {diff[:3]}")
            failed += 1
        else:
            print(f"ok   {name} ({len(s_rows)} rows)")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
