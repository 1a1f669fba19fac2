#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: for each query output
written by graft.Verify, run the corresponding oracle SQL in DuckDB over
the same parquet tables and compare (schema, row count, values).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
fails = 0
for name, sql in sorted(oracle.items()):
    qdir = os.path.join(out_dir, name)
    files = glob.glob(os.path.join(qdir, "*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        got = pd.read_parquet(qdir)
    except Exception as e:
        print(f"FAIL {name}: cannot read spark output: {e}"); fails += 1; continue
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: duckdb error: {e}"); fails += 1; continue
    # driver sorts columns by name before hashing
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
        fails += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fails += 1; continue
    bad = []
    for c in got.columns:
        a, b = got[c], exp[c]
        try:
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                ok = np.allclose(a.astype(float), b.astype(float),
                                 rtol=0, atol=0, equal_nan=True)
                exact = ok
            else:
                av = a.astype(str).values; bv = b.astype(str).values
                exact = (av == bv).all()
            if not exact:
                bad.append(c)
        except Exception as e:
            bad.append(f"{c}({e})")
    if bad:
        print(f"FAIL {name}: value mismatch in {bad}")
        for c in bad[:2]:
            c = str(c).split('(')[0]
            if c in got.columns:
                diff = got[c].astype(str).values != exp[c].astype(str).values
                idx = np.nonzero(diff)[0][:5]
                print(f"   {c}: spark={got[c].iloc[idx].tolist()} duckdb={exp[c].iloc[idx].tolist()} at rows {idx.tolist()}")
        fails += 1
    else:
        print(f"OK   {name} ({len(got)} rows, {len(got.columns)} cols)")
# rows-only queries (no oracle)
for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
    name = os.path.basename(qdir)
    if os.path.isdir(qdir) and name not in oracle:
        try:
            n = len(pd.read_parquet(qdir))
            print(f"ROWS {name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
            if n == 0: fails += 1
        except Exception as e:
            print(f"FAIL {name}: {e}"); fails += 1
print(f"\n{'ALL OK' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
