#!/usr/bin/env python3
"""Local differential oracle mirroring the driver's compare:
run after `sbt "runMain graft.Verify <sfDir> <outDir>"`.

For each query dir under outDir: load the Spark parquet result, run the
oracle SQL (from oracle_sql.json) in DuckDB over the same sf parquet
tables, sort columns by name, and compare rows/schema/values.
"""
import json, math, sys, glob, os

import duckdb

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 4)
    return v

def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    results = {}
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(qdir)
        if not os.path.isdir(qdir):
            continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM read_parquet('{qdir}/*.parquet')").fetchdf()
        except Exception as e:
            results[name] = {"err": f"spark result unreadable: {e}"}
            continue
        if name not in oracle:
            results[name] = {"rows": len(spark_df), "oracle": "none (rows-only check)",
                             "ok": len(spark_df) > 0}
            continue
        try:
            ora_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = {"err": f"oracle sql failed: {e}"}
            continue
        s = spark_df[sorted(spark_df.columns)]
        o = ora_df[sorted(ora_df.columns)]
        entry = {"spark_rows": len(s), "oracle_rows": len(o),
                 "spark_cols": list(s.columns), "oracle_cols": list(o.columns)}
        if list(s.columns) != list(o.columns):
            entry["ok"] = False
            entry["err"] = "column-name mismatch"
        elif len(s) != len(o):
            entry["ok"] = False
            entry["err"] = "row-count mismatch"
        else:
            ok = True
            for i in range(len(s)):
                for c in s.columns:
                    a, b = norm(s.iloc[i][c]), norm(o.iloc[i][c])
                    if isinstance(a, float) and isinstance(b, float):
                        if not math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-4):
                            ok = False
                            entry.setdefault("diffs", []).append(
                                f"row {i} col {c}: spark={a} oracle={b}")
                    elif str(a) != str(b):
                        ok = False
                        entry.setdefault("diffs", []).append(
                            f"row {i} col {c}: spark={a!r} oracle={b!r}")
                    if not ok and len(entry.get("diffs", [])) >= 5:
                        break
                if not ok and len(entry.get("diffs", [])) >= 5:
                    break
            entry["ok"] = ok
        results[name] = entry

    n_ok = sum(1 for r in results.values() if r.get("ok"))
    print(json.dumps(results, indent=2, default=str))
    print(f"\n== {n_ok}/{len(results)} ok ==", file=sys.stderr)
    for name, r in results.items():
        if not r.get("ok"):
            print(f"FAIL {name}: {r.get('err', r.get('diffs', 'unknown'))}",
                  file=sys.stderr)

if __name__ == "__main__":
    main()
