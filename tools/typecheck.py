#!/usr/bin/env python3
"""Type-parity audit between Spark verify dumps and the DuckDB oracles.

tools/selfcheck.py compares VALUES through str(), so a query whose two
sides agree cell-for-cell but carry different column TYPES (Spark
DECIMAL(38,0) vs DuckDB HUGEINT was embedding_gram's r12 red row;
HUGEINT promotion through sum() re-created it in a window-sum oracle in
r13) passes selfcheck and still fails the driver's type-sensitive hash.
This audit closes that gap: for every declared query it DESCRIBEs the
Spark parquet dump and the oracle SQL and compares column-type families.

Run after `graft.Verify`:
    python3 tools/typecheck.py <sfDir> <verifyOutDir>
Expect: "0 type mismatches".
"""
import sys, json, os
import duckdb

# comparable families: SIGNED integer widths below 64 bits hash alike
# through parquet (the dump is physically INT64). UBIGINT is deliberately
# NOT in the family: values above 2^63-1 have no INT64 representation, so
# an oracle that promotes to unsigned 64-bit must surface as a mismatch,
# not silently "hash alike" (the exact width class this audit exists for).
def norm(t):
    t = t.upper()
    if t in ("BIGINT", "INTEGER", "SMALLINT", "TINYINT"):
        return "INT"
    if t in ("DOUBLE", "FLOAT", "REAL"):
        return "FLOAT"
    if t.startswith("TIMESTAMP"):
        return "TS"
    return t  # DECIMAL(p,s), HUGEINT, UBIGINT, VARCHAR, BOOLEAN, lists, ... exact


# decimal precision the driver's cross-engine hasher can canonicalize:
# <= 18 fits decimal64; above it the parquet physical type is a 16-byte
# FIXED_LEN_BYTE_ARRAY (decimal128) and the r12/r13 embedding_gram rows
# proved the hash never matches even with bit-identical values. ANY
# declared Spark output carrying precision > 18 is an error on its own,
# independent of whether the oracle agrees.
def decimal128(t):
    t = t.upper()
    if not t.startswith("DECIMAL"):
        return False
    try:
        prec = int(t.split("(", 1)[1].split(",")[0])
    except (IndexError, ValueError):
        return False
    return prec > 18

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    bad = 0
    for name, sql in sorted(oracles.items()):
        d = f"{out_dir}/{name}"
        if not os.path.isdir(d):
            continue
        try:
            sdesc = con.execute(
                f"DESCRIBE SELECT * FROM '{d}/*.parquet'").fetchall()
            odesc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            print(f"ERR   {name}: {e}")
            bad += 1
            continue
        stypes = {r[0]: norm(r[1]) for r in sdesc}
        otypes = {r[0]: norm(r[1]) for r in odesc}
        for col, raw in ((r[0], r[1]) for r in sdesc):
            if decimal128(raw):
                print(f"DEC128 {name}.{col}: spark declares {raw} "
                      f"(precision > 18 is not driver-hashable)")
                bad += 1
        if set(stypes) != set(otypes):
            print(f"COLS  {name}: spark={sorted(stypes)} oracle={sorted(otypes)}")
            bad += 1
            continue
        for c in sorted(stypes):
            if stypes[c] != otypes[c]:
                print(f"TYPE  {name}.{c}: spark={stypes[c]} oracle={otypes[c]}")
                bad += 1
    print(f"\n{bad} type mismatches over {len(oracles)} queries")
    return 1 if bad else 0

if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    sys.exit(main(sf, out))
