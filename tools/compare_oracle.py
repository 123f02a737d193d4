#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: reads Verify output
(outDir/<name>/ parquet + outDir/oracle_sql.json), runs each oracle SQL in
DuckDB over the same sf tables, and compares (columns sorted by name,
values stringified, rows sorted). Usage: compare_oracle.py <sfDir> <outDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: repr(v))
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

ok = fail = 0
for name in sorted(os.listdir(outdir)):
    path = os.path.join(outdir, name)
    if not os.path.isdir(path):
        continue
    got = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(f"{path}/*.parquet"))])
    if name not in oracle:
        print(f"[rows-only] {name}: rows={len(got)}")
        continue
    try:
        want = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"[FAIL-sql ] {name}: oracle SQL error: {e}")
        fail += 1
        continue
    if sorted(got.columns) != sorted(want.columns):
        print(f"[FAIL-cols] {name}: spark={sorted(got.columns)} duckdb={sorted(want.columns)}")
        fail += 1
        continue
    g, w = canon(got), canon(want)
    if len(g) != len(w):
        print(f"[FAIL-rows] {name}: spark={len(g)} duckdb={len(w)}")
        fail += 1
        continue
    if not g.equals(w):
        diff = (g != w).any(axis=1)
        idx = diff[diff].index[:3]
        print(f"[FAIL-vals] {name}: {int(diff.sum())}/{len(g)} rows differ; first:")
        for i in idx:
            print(f"    spark : {g.loc[i].to_dict()}")
            print(f"    duckdb: {w.loc[i].to_dict()}")
        fail += 1
        continue
    print(f"[OK       ] {name}: {len(g)} rows")
    ok += 1
print(f"\n{ok} ok, {fail} fail, {len(oracle)} oracles declared")
sys.exit(1 if fail else 0)
