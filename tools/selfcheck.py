#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against the oracle SQL in DuckDB over the same parquet tables and compare.

Usage: python3 tools/selfcheck.py [sfDir] [outDir]
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"MISS  {name}: no spark output")
        fail += 1
        continue
    got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
    try:
        want = con.sql(sql).df()
    except Exception as e:
        print(f"ORACLE-ERR {name}: {e}")
        fail += 1
        continue
    g = got.reindex(sorted(got.columns), axis=1)
    w = want.reindex(sorted(want.columns), axis=1)
    status, detail = "OK", ""
    if list(g.columns) != list(w.columns):
        status, detail = "COLS", f"spark={list(g.columns)} duck={list(w.columns)}"
    elif len(g) != len(w):
        status, detail = "ROWS", f"spark={len(g)} duck={len(w)}"
    elif len(g) == 0:
        pass  # both empty: equal
    else:
        # Reproduce the DRIVER's comparison sort first: pandas sort_values
        # on the RAW columns. An output type pandas cannot lexsort (e.g.
        # an array<...> column, r20's q210) fails HERE exactly as it fails
        # at the driver, instead of slipping through the stringified sort
        # below (the r20 selfcheck/driver fidelity gap).
        try:
            g.sort_values(by=list(g.columns))
            w.sort_values(by=list(w.columns))
        except TypeError as e:
            status, detail = "SORT", f"driver-style sort failed: {e}"
        if status == "OK":
            gs = g.astype(str).apply(lambda r: "|".join(r), axis=1).sort_values().values
            ws = w.astype(str).apply(lambda r: "|".join(r), axis=1).sort_values().values
            diff = [(a, b) for a, b in zip(gs, ws) if a != b]
            if diff:
                status, detail = "VALS", f"first diff spark={diff[0][0]!r} duck={diff[0][1]!r}"
    if status == "OK":
        ok += 1
        print(f"OK    {name} ({len(g)} rows)")
    else:
        fail += 1
        print(f"{status:5s} {name}: {detail}")
print(f"\n{ok} ok, {fail} failing")
sys.exit(1 if fail else 0)
