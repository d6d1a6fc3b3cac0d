#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run after
`sbt "runMain graft.Verify <sfDir> <outDir>"`, compares each query's
parquet dump against its DuckDB oracle (row count, sorted-column value
hash), mirroring the driver's compare."""
import sys, json, glob, hashlib
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon_hash(df):
    # driver-style: sort columns by name, sort rows, hash values
    cols = sorted(df.columns)
    df = df[cols].sort_values(by=cols).reset_index(drop=True)
    h = hashlib.sha256()
    for c in cols:
        for v in df[c].tolist():
            h.update(repr(v).encode())
    return h.hexdigest()

fails = []
for d in sorted(glob.glob(f"{out_dir}/*/")):
    name = d.rstrip("/").split("/")[-1]
    try:
        got = con.sql(f"SELECT * FROM '{d}*.parquet'").df()
    except Exception as e:
        fails.append(name); print(f"{name:20s} READ-FAIL {e}"); continue
    if name not in oracles:
        print(f"{name:20s} rows-only: {len(got)} rows " +
              ("OK" if len(got) > 0 else "EMPTY!"))
        if len(got) == 0: fails.append(name)
        continue
    try:
        exp = con.sql(oracles[name]).df()
    except Exception as e:
        fails.append(name); print(f"{name:20s} ORACLE-SQL-FAIL {e}"); continue
    ok_rows = len(got) == len(exp)
    ok_cols = sorted(got.columns) == sorted(exp.columns)
    ok_hash = ok_rows and ok_cols and canon_hash(got) == canon_hash(exp)
    status = "OK" if ok_hash else "MISMATCH"
    if not ok_hash:
        fails.append(name)
    print(f"{name:20s} {status} rows={len(got)}/{len(exp)} cols_ok={ok_cols}")
print("\nFAILED:", fails if fails else "none")
sys.exit(1 if fails else 0)
