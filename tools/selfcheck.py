#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Reads the parquet dumps written by `graft.Verify <sfDir> <outDir>` and the
oracle_sql.json next to them, runs each oracle in DuckDB against the same
testdata tables, and compares: row count, column names (sorted), and a hash
of all values with columns sorted by name (mirroring the driver's compare).

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

def canon(rows, cols):
    # sort columns by name, then rows by their string form
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort()
    return sorted(c for c in cols), out

def norm(v):
    if isinstance(v, float):
        return f"{v:.10g}"
    return str(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        spark_dir = f"{out_dir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"MISS  {name}: no spark output dir"); n_fail += 1; continue
        try:
            sdf = con.execute(
                f"SELECT * FROM '{spark_dir}/*.parquet'").fetchall()
            scols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL  {name}: reading spark output: {e}"); n_fail += 1; continue
        try:
            odf = con.execute(sql).fetchall()
            ocols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}"); n_fail += 1; continue
        sc, sr = canon(sdf, scols)
        oc, orows = canon(odf, ocols)
        if sc != oc:
            print(f"FAIL  {name}: cols spark={sc} oracle={oc}"); n_fail += 1
        elif len(sr) != len(orows):
            print(f"FAIL  {name}: rows spark={len(sr)} oracle={len(orows)}"); n_fail += 1
        elif sr != orows:
            bad = next(i for i in range(len(sr)) if sr[i] != orows[i])
            print(f"FAIL  {name}: value mismatch at sorted-row {bad}:")
            print(f"      spark  = {sr[bad]}")
            print(f"      oracle = {orows[bad]}")
            n_fail += 1
        else:
            print(f"ok    {name}: {len(sr)} rows"); n_pass += 1
    print(f"\n{n_pass} ok, {n_fail} failed")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
