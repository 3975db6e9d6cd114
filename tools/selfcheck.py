#!/usr/bin/env python3
"""Replicate the driver's correctness gate locally: for each query result
parquet in the Verify outDir, run the oracle SQL from oracle_sql.json in
DuckDB against the sf testdata tables and compare row sets exactly.

Also enforces a per-oracle time budget (round-5 lesson: one >10-minute
DuckDB oracle timed out the driver's correctness step and the round's
CORRECTNESS file was committed empty — a slow oracle must fail HERE,
before the driver ever sees it) and checks the Verify-side self-report
verify_status.json for Spark-side failures.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir> [--budget-seconds N]
"""
import sys, os, json, glob, time, argparse, threading
import duckdb

ap = argparse.ArgumentParser()
ap.add_argument("sf_dir")
ap.add_argument("out_dir")
ap.add_argument("--budget-seconds", type=float, default=60.0)
ns = ap.parse_args()
sf_dir, out_dir, budget = ns.sf_dir, ns.out_dir, ns.budget_seconds
con = duckdb.connect()


def run_budgeted(sql):
    """Run an oracle with the budget ENFORCED: a watchdog thread calls
    con.interrupt() at the deadline, so a hung or pathologically slow
    oracle fails within ~budget seconds instead of running to completion
    (the round-5 'slow oracle silently zeroes the round' failure mode)."""
    timer = threading.Timer(budget, con.interrupt)
    timer.start()
    try:
        return con.sql(sql).df(), None
    except Exception as e:  # duckdb.InterruptException on timeout
        return None, f"{type(e).__name__}: {e}"
    finally:
        timer.cancel()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[: -len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
fails = []

status_path = os.path.join(out_dir, "verify_status.json")
if not os.path.exists(status_path):
    fails.append("verify_status.json")
    print("MISSING verify_status.json — Verify did not self-report")
else:
    vstatus = json.load(open(status_path))
    for q, st in sorted(vstatus.items()):
        if st.get("status") != "ok":
            fails.append(q)
            print(f"{q:24s} FAIL spark-side: {st.get('status')}")

for q in sorted(os.listdir(out_dir)):
    qdir = os.path.join(out_dir, q)
    if not os.path.isdir(qdir):
        continue
    got = con.sql(f"SELECT * FROM '{qdir}/*.parquet'").df()
    if q not in oracles:
        print(f"{q:24s} rows={len(got)} (no oracle — rows-only)")
        continue
    t0 = time.monotonic()
    want, err = run_budgeted(oracles[q])
    secs = time.monotonic() - t0
    if err is not None:
        fails.append(q)
        print(f"{q:24s} {secs:6.1f}s FAIL oracle ({'INTERRUPTED over budget' if secs >= budget else err})")
        continue
    over = secs > budget
    if over:
        fails.append(q)
    tag = f"{secs:6.1f}s" + (" OVER-BUDGET" if over else "")
    cols_got, cols_want = sorted(got.columns), sorted(want.columns)
    if cols_got != cols_want:
        fails.append(q)
        print(f"{q:24s} {tag} FAIL schema: got {cols_got} want {cols_want}")
        continue
    g = got[cols_got].sort_values(cols_got).reset_index(drop=True)
    w = want[cols_want].sort_values(cols_want).reset_index(drop=True)
    if len(g) != len(w):
        fails.append(q)
        print(f"{q:24s} {tag} FAIL rows: got {len(g)} want {len(w)}")
        continue
    eq = g.equals(w)
    if not eq:
        # exact element compare with NaN-safe check
        import pandas as pd
        diff = ~((g == w) | (g.isna() & w.isna()))
        bad = diff.any(axis=1)
        fails.append(q)
        print(f"{q:24s} {tag} FAIL values: {bad.sum()} differing rows; first:")
        print(pd.concat([g[bad].head(3).add_suffix("_got"),
                         w[bad].head(3).add_suffix("_want")], axis=1))
    else:
        print(f"{q:24s} {tag} OK rows={len(g)}")
print("FAILED:" if fails else "ALL OK", sorted(set(fails)))
sys.exit(1 if fails else 0)
