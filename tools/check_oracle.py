#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracles and diff. Usage:
  python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import json, math, os, sys

import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = set(sys.argv[3:])

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)]
    cols = sorted(df.columns)
    df = df.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    return df

fails = []
for name in sorted(os.listdir(out)):
    path = os.path.join(out, name)
    if not os.path.isdir(path):
        continue
    if only and name not in only:
        continue
    got = con.execute(f"SELECT * FROM read_parquet('{path}/*.parquet')").df()
    if name not in oracle:
        print(f"{name:24s} rows-only: {len(got)} rows " +
              ("OK" if len(got) > 0 else "EMPTY!"))
        if len(got) == 0:
            fails.append(name)
        continue
    try:
        exp = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"{name:24s} ORACLE SQL ERROR: {e}")
        fails.append(name)
        continue
    g, e = canon(got), canon(exp)
    if list(g.columns) != list(e.columns):
        print(f"{name:24s} COLUMN MISMATCH got={list(g.columns)} exp={list(e.columns)}")
        fails.append(name)
        continue
    if len(g) != len(e):
        print(f"{name:24s} ROWCOUNT got={len(g)} exp={len(e)}")
        fails.append(name)
        continue
    bad = None
    for c in g.columns:
        gv, ev = g[c], e[c]
        if str(gv.dtype) != str(ev.dtype):
            # dtype difference is a schema mismatch in the driver
            bad = f"dtype {c}: got={gv.dtype} exp={ev.dtype}"
            break
        for i in range(len(gv)):
            a, b = gv.iloc[i], ev.iloc[i]
            anull = a is None or (isinstance(a, float) and math.isnan(a))
            bnull = b is None or (isinstance(b, float) and math.isnan(b))
            try:
                import pandas as pd
                anull = bool(pd.isna(a)) if not isinstance(a, (list, tuple)) else False
                bnull = bool(pd.isna(b)) if not isinstance(b, (list, tuple)) else False
            except Exception:
                pass
            if anull and bnull:
                continue
            if anull != bnull or a != b:
                bad = f"value {c}[{i}]: got={a!r} exp={b!r}"
                break
        if bad:
            break
    if bad:
        print(f"{name:24s} MISMATCH {bad}")
        fails.append(name)
    else:
        print(f"{name:24s} OK ({len(g)} rows)")

print()
if fails:
    print("FAILED:", " ".join(fails))
    sys.exit(1)
print("ALL OK")
