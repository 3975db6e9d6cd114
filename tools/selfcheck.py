#!/usr/bin/env python3
"""Replicate the driver's correctness gate locally: for each query result
parquet in the Verify outDir, run the oracle SQL from oracle_sql.json in
DuckDB against the sf testdata tables and compare row sets exactly.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[: -len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
fails = []
for q in sorted(os.listdir(out_dir)):
    qdir = os.path.join(out_dir, q)
    if not os.path.isdir(qdir):
        continue
    got = con.sql(f"SELECT * FROM '{qdir}/*.parquet'").df()
    if q not in oracles:
        print(f"{q:24s} rows={len(got)} (no oracle — rows-only)")
        continue
    want = con.sql(oracles[q]).df()
    cols_got, cols_want = sorted(got.columns), sorted(want.columns)
    if cols_got != cols_want:
        fails.append(q)
        print(f"{q:24s} FAIL schema: got {cols_got} want {cols_want}")
        continue
    g = got[cols_got].sort_values(cols_got).reset_index(drop=True)
    w = want[cols_want].sort_values(cols_want).reset_index(drop=True)
    if len(g) != len(w):
        fails.append(q)
        print(f"{q:24s} FAIL rows: got {len(g)} want {len(w)}")
        continue
    eq = g.equals(w)
    if not eq:
        # exact element compare with NaN-safe check
        import pandas as pd
        diff = ~((g == w) | (g.isna() & w.isna()))
        bad = diff.any(axis=1)
        fails.append(q)
        print(f"{q:24s} FAIL values: {bad.sum()} differing rows; first:")
        print(pd.concat([g[bad].head(3).add_suffix("_got"),
                         w[bad].head(3).add_suffix("_want")], axis=1))
    else:
        print(f"{q:24s} OK rows={len(g)}")
print("FAILED:" if fails else "ALL OK", fails)
sys.exit(1 if fails else 0)
