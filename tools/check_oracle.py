#!/usr/bin/env python3
"""Dev-only local oracle check (mirrors the driver's DuckDB compare).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<query> parquet dumped by graft.Verify, runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the
<sfDir> parquet tables, and compares row counts, column names, and
value-normalized sorted rows. Floats compare numerically (relative
tolerance), not via string rounding — a 1-ulp value straddling a decimal
rounding boundary must not flip the verdict. NOT part of the library —
iteration tooling.
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

REL_TOL = 1e-9
ABS_TOL = 1e-12


def sort_key(v):
    """Normalization used only to give both sides the same row ORDER.
    Coarse on purpose; boundary-straddling rows that sort differently on
    the two sides are rescued by the tolerant fallback match below."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v):  # '1' and '1.0' must key identically
            return str(int(v))
        return str(round(v, 6))
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def values_eq(a, b):
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        return math.isclose(fa, fb, rel_tol=REL_TOL, abs_tol=ABS_TOL)
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, bool) or isinstance(b, bool):
        return str(a).lower() == str(b).lower()
    return str(a) == str(b)


def rows_eq(ra, rb):
    return len(ra) == len(rb) and all(values_eq(a, b) for a, b in zip(ra, rb))


def type_family(t):
    """Group physical types into the families a type-tagged hasher keys on.

    The r10 driver hash-reds (q197/q200) were rows-match/schema-match/
    hash-MISMATCH caused purely by DuckDB widening a windowed sum(BIGINT)
    to HUGEINT while Spark emits INT64 — identical values, different value
    *types*. Any oracle column whose family differs from its Spark twin's
    is one driver-hash red waiting to happen, even if today's value
    compare passes."""
    u = t.upper()
    if u in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if u in ("HUGEINT", "UHUGEINT") or u.startswith("DECIMAL"):
        return "wide"
    if u in ("FLOAT", "REAL", "DOUBLE"):
        return "float"
    if u.startswith("TIMESTAMP"):
        return "timestamp"
    return u


def type_parity(con, out_dir, name, sql):
    """Returns [(col, oracle_type, spark_type)] whose families mismatch."""
    try:
        s_types = {r[0]: r[1] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{out_dir}/{name}/*.parquet'"
        ).fetchall()}
        w_types = {r[0]: r[1] for r in con.execute(
            f"DESCRIBE {sql}").fetchall()}
    except Exception:
        return []
    return [(c, w_types[c], s_types[c]) for c in w_types
            if c in s_types
            and type_family(w_types[c]) != type_family(s_types[c])]


def tolerant_match(sa, sb):
    """Greedy multiset match with tolerance for the (small) sets of rows
    the sorted zip left unpaired — rescues rows whose float sort keys
    straddled a rounding boundary and sorted differently per side.
    Returns the rows of sa that found no partner."""
    remaining = list(sb)
    unmatched = []
    for ra in sa:
        for i, rb in enumerate(remaining):
            if rows_eq(ra, rb):
                del remaining[i]
                break
        else:
            unmatched.append(ra)
    return unmatched


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    # graft.Verify records thrown queries here; surface them loudly even
    # though the poison parquet would also fail the compare below.
    manifest = {}
    mpath = f"{out_dir}/_failures.json"
    if os.path.exists(mpath):
        with open(mpath) as f:
            manifest = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    failed = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        if name in manifest:
            print(f"FAIL {name}: query THREW in Verify: {manifest[name]}")
            failed += 1
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
        # type-family parity (the q197/q200 HUGEINT driver-hash trap):
        # flagged even when the value compare below passes
        tmis = type_parity(con, out_dir, name, sql)
        if tmis:
            print(f"TYPE {name}: oracle vs spark type-family mismatch "
                  f"{tmis} — a type-tagged driver hash goes red on this")
            failed += 1
        # driver semantics: sort columns by name, then sort rows
        sidx = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
        widx = sorted(range(len(want_cols)), key=lambda i: want_cols[i])
        s_rows = sorted((tuple(r[i] for i in sidx) for r in spark),
                        key=lambda r: tuple(sort_key(v) for v in r))
        w_rows = sorted((tuple(r[i] for i in widx) for r in want),
                        key=lambda r: tuple(sort_key(v) for v in r))
        if sorted(spark_cols) != sorted(want_cols):
            print(f"FAIL {name}: cols {sorted(spark_cols)} vs {sorted(want_cols)}")
            failed += 1
        elif len(s_rows) != len(w_rows):
            # count mismatch reported BEFORE any pairing — zip would hide
            # the extra rows
            print(f"FAIL {name}: row count {len(s_rows)} vs {len(w_rows)}")
            failed += 1
        else:
            diff = [(a, b) for a, b in zip(s_rows, w_rows)
                    if not rows_eq(a, b)]
            if diff:
                # rescue sort-boundary mispairings before failing
                unmatched = tolerant_match([a for a, _ in diff],
                                           [b for _, b in diff])
                if unmatched:
                    print(f"FAIL {name}: {len(unmatched)} unmatched rows of "
                          f"{len(s_rows)}, first: {unmatched[:3]}")
                    failed += 1
                    continue
            print(f"ok   {name} ({len(s_rows)} rows)")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
