#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify, runs the recorded oracle SQL in DuckDB
against the same parquet tables, sorts columns by name and rows by all
columns, and compares cell-by-cell (exact for ints/strings, exact-or-1e-12-rel
for floats so we can see how close "exact" is).
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if isinstance(v, float):
        return v
    return v

def cmp_cell(a, b):
    import pandas as pd
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        if a == b:
            return True
        return abs(a - b) <= 1e-12 * max(abs(a), abs(b))
    return a == b

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            fails += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {str(e)[:120]}")
            fails += 1
            continue
        exp = exp[sorted(exp.columns)]
        got = got[sorted(got.columns)]
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            fails += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            fails += 1
            continue
        exp = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
        got = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        bad = 0
        exact = True
        for c in exp.columns:
            ev, gv = exp[c].tolist(), got[c].tolist()
            for i in range(len(ev)):
                if not cmp_cell(ev[i], gv[i]):
                    if bad < 3:
                        print(f"  {name}.{c}[{i}]: exp={ev[i]!r} got={gv[i]!r}")
                    bad += 1
                elif isinstance(ev[i], float) and isinstance(gv[i], float) and ev[i] != gv[i]:
                    exact = False
        if bad:
            print(f"FAIL {name}: {bad} mismatched cells")
            fails += 1
        else:
            tag = "OK  " if exact else "OK~ (float not bit-exact)"
            print(f"{tag} {name} ({len(exp)} rows)")
    # rows-only queries
    rows_only = set()
    import os
    for d in os.listdir(out_dir):
        if d.startswith("q") and d not in oracle:
            rows_only.add(d)
    for name in sorted(rows_only):
        try:
            n = con.sql(f"SELECT count(*) FROM '{out_dir}/{name}/*.parquet'").fetchone()[0]
            print(f"ROWS {name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
        except Exception as e:
            print(f"ROWS {name}: unreadable: {str(e)[:120]}")
    print(f"\n{fails} failures / {len(oracle)} oracle queries")
    return 1 if fails else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
