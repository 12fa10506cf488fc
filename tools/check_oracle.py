#!/usr/bin/env python3
"""Local replica of the driver's DuckDB differential oracle.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), registers
the sfDir parquet tables as DuckDB views, runs each oracle SQL, loads the
Spark result parquet, and compares: columns sorted by name, rows in query
order, doubles rounded to 6 decimals (stricter than we expect the driver
to be). Exit code 1 if any query mismatches.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [tuple(norm_cell(r[i]) for i in order) for r in rows]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)

    failures = []
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            oc = con.execute(sql)
            ocols = [d[0] for d in oc.description]
            orows = oc.fetchall()
        except Exception as e:
            failures.append((name, f"oracle SQL failed: {e}"))
            continue
        try:
            sc = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            scols = [d[0] for d in sc.description]
            srows = sc.fetchall()
        except Exception as e:
            failures.append((name, f"spark result missing: {e}"))
            continue
        if sorted(ocols) != sorted(scols):
            failures.append(
                (name, f"schema mismatch: spark={sorted(scols)} oracle={sorted(ocols)}"))
            continue
        o, s = norm_rows(ocols, orows), norm_rows(scols, srows)
        if len(o) != len(s):
            failures.append((name, f"row count: spark={len(s)} oracle={len(o)}"))
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(s, o)) if a != b]
        if bad:
            i, a, b = bad[0]
            failures.append(
                (name, f"{len(bad)} differing rows; first at {i}: spark={a} oracle={b}"))
        else:
            print(f"OK    {name} ({len(s)} rows)")
    for name, msg in failures:
        print(f"FAIL  {name}: {msg}")
    print(f"\n{len(oracle) - len(failures)}/{len(oracle)} queries match")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
