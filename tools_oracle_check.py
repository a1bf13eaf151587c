#!/usr/bin/env python3
"""Local oracle check: replay oracle_sql.json in DuckDB over the sf tables
and compare with the dumped Spark parquet (sorted columns, sorted rows,
exact values). Usage: tools_oracle_check.py <sfDir> <dumpDir> [names...]"""
import sys, json, glob
import duckdb
import pandas as pd

sf, out = sys.argv[1], sys.argv[2]
names = sys.argv[3:]
oracle = json.load(open(f"{out}/oracle_sql.json"))
if not names:
    names = sorted(oracle)

con = duckdb.connect()
for t in glob.glob(f"{sf}/*.parquet"):
    name = t.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")

import datetime

def _norm(v):
    if isinstance(v, (pd.Timestamp, datetime.datetime, datetime.date)):
        return str(pd.Timestamp(v))
    if isinstance(v, float) and v == 0.0:
        return 0.0  # -0.0 == 0.0 numerically; don't let repr-sort split them
    return v

def canon(df):
    df = df[sorted(df.columns)]
    df = df.reindex(sorted(df.columns), axis=1)
    rows = [tuple(None if pd.isna(v) else _norm(v) for v in r)
            for r in df.itertuples(index=False, name=None)]
    return sorted(rows, key=repr)

fails = 0
for n in names:
    if n not in oracle:
        print(f"{n}: NO ORACLE"); continue
    try:
        o = con.execute(oracle[n]).df()
    except Exception as e:
        print(f"{n}: ORACLE ERROR {e}"); fails += 1; continue
    s = pd.concat([pd.read_parquet(p) for p in
                   glob.glob(f"{out}/{n}/*.parquet")], ignore_index=True)
    sc, oc = sorted(s.columns), sorted(o.columns)
    if sc != oc:
        print(f"{n}: SCHEMA {sc} vs {oc}"); fails += 1; continue
    # the driver's hasher is dtype-strict (5 != 5.0): flag int-vs-float
    # column drift (e.g. DuckDB widening a windowed sum to HUGEINT ->
    # float64 while Spark dumps int64) instead of letting Python ==
    # silently accept it. A float side with NaNs is just nullable-int
    # representation, so only all-integral NaN-free floats are flagged.
    dtype_bad = []
    for c in sc:
        ks, ko = s[c].dtype.kind, o[c].dtype.kind
        if {ks, ko} <= {"i", "u", "f"} and ("f" in (ks, ko)) \
                and (ks in "iu" or ko in "iu"):
            f = s[c] if ks == "f" else o[c]
            if not f.isna().any() and (f % 1 == 0).all():
                dtype_bad.append((c, ks, ko))
    if dtype_bad:
        print(f"{n}: DTYPE int-vs-float drift {dtype_bad} "
              "(spark_kind, oracle_kind)")
        fails += 1; continue
    rs, ro = canon(s), canon(o)
    if len(rs) != len(ro):
        print(f"{n}: ROWS {len(rs)} vs {len(ro)}"); fails += 1; continue
    bad = [(a, b) for a, b in zip(rs, ro) if a != b]
    if bad:
        print(f"{n}: HASH MISMATCH {len(bad)}/{len(rs)} first={bad[0]}")
        fails += 1
    else:
        print(f"{n}: OK ({len(rs)} rows)")
sys.exit(1 if fails else 0)
