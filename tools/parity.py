#!/usr/bin/env python3
"""Compare two graft.Verify output dirs query-by-query (schema + sorted
row multiset) — used for the lifecycle local-vs-reliable parity check."""
import glob
import os
import sys

import pandas as pd

a, b = sys.argv[1], sys.argv[2]
names = sorted(d for d in os.listdir(a)
               if os.path.isdir(os.path.join(a, d)))
ok = fail = 0
for n in names:
    fa = sorted(glob.glob(f"{a}/{n}/*.parquet"))
    fb = sorted(glob.glob(f"{b}/{n}/*.parquet"))
    if not fb:
        print(f"MISS  {n}: absent in {b}")
        fail += 1
        continue
    da = pd.concat([pd.read_parquet(f) for f in fa])
    db = pd.concat([pd.read_parquet(f) for f in fb])
    da = da.reindex(sorted(da.columns), axis=1)
    db = db.reindex(sorted(db.columns), axis=1)
    if list(da.columns) != list(db.columns):
        print(f"COLS  {n}")
        fail += 1
        continue
    sa = da.astype(str).apply(lambda r: "|".join(r), axis=1).sort_values().values
    sb = db.astype(str).apply(lambda r: "|".join(r), axis=1).sort_values().values
    if len(sa) != len(sb) or any(x != y for x, y in zip(sa, sb)):
        print(f"DIFF  {n}: {len(sa)} vs {len(sb)} rows")
        fail += 1
    else:
        ok += 1
print(f"{ok} identical, {fail} differing")
sys.exit(1 if fail else 0)
