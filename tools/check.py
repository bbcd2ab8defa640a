#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run after
`sbt "runMain graft.Verify <sfDir> <outDir>"`, compares each query's
parquet dump against its DuckDB oracle SQL on the same tables.

Usage: python3 tools/check.py <sfDir> <outDir>
"""
import sys, os, json, glob
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails, passes, rows_only = [], [], []
for name in sorted(os.listdir(outdir)):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d):
        continue
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        fails.append((name, "no parquet written"))
        continue
    got = con.sql(f"SELECT * FROM '{files[0]}'").fetchdf()
    if name not in oracle:
        rows_only.append((name, len(got)))
        continue
    try:
        exp = con.sql(oracle[name]).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        continue
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        fails.append((name, f"schema mismatch: got {gc} vs oracle {ec}"))
        continue
    g = got[gc].reset_index(drop=True)
    e = exp[ec].reset_index(drop=True)
    if len(g) != len(e):
        fails.append((name, f"row count: got {len(g)} vs oracle {len(e)}"))
        continue
    # driver sorts columns by name then hashes values; emulate with a
    # row-order-sensitive exact compare (both sides ORDER BY)
    try:
        import pandas as pd
        eq = g.equals(e)
        if not eq:
            # find first differing cell for the report
            diff = None
            for c in gc:
                if not g[c].equals(e[c]):
                    idx = (g[c] != e[c])
                    idx = idx[idx].index[0] if idx.any() else None
                    diff = (c, idx, None if idx is None else g[c][idx],
                            None if idx is None else e[c][idx])
                    break
            fails.append((name, f"value mismatch at {diff}"))
        else:
            passes.append(name)
    except Exception as ex:
        fails.append((name, f"compare error: {ex}"))

print(f"PASS ({len(passes)}):", " ".join(passes))
for n, r in rows_only:
    print(f"ROWS-ONLY: {n} rows={r}")
for n, msg in fails:
    print(f"FAIL: {n}: {msg}")
sys.exit(1 if fails else 0)
