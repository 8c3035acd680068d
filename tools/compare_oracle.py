#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: for each query output
parquet under OUTDIR, run the matching oracle SQL from oracle_sql.json in
DuckDB against the same sf parquet tables, and compare row multisets
(columns sorted by name, rows sorted, floats to 6dp).

Usage: compare_oracle.py <sfDir> <outDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracles = json.load(open(f"{out}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                              str(type(v)).endswith("ndarray'>") else v)
        try:
            import numpy as np
            if df[c].dtype in (np.float64, np.float32):
                df[c] = df[c].round(6)
        except Exception:
            pass
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

fails, passes, nooracle = [], [], []
for qdir in sorted(glob.glob(f"{out}/q*")):
    name = os.path.basename(qdir)
    spark_df = pd.concat([pd.read_parquet(f) for f in
                          glob.glob(f"{qdir}/*.parquet")], ignore_index=True) \
        if glob.glob(f"{qdir}/*.parquet") else pd.DataFrame()
    if name not in oracles:
        nooracle.append((name, len(spark_df)))
        continue
    try:
        oracle_df = con.sql(oracles[name]).df()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        continue
    a, b = canon(spark_df), canon(oracle_df)
    if list(a.columns) != list(b.columns):
        fails.append((name, f"columns differ: spark={list(a.columns)} oracle={list(b.columns)}"))
        continue
    if len(a) != len(b):
        fails.append((name, f"row count: spark={len(a)} oracle={len(b)}"))
        continue
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                      check_exact=False, atol=2e-6)
        passes.append((name, len(a)))
    except AssertionError as e:
        fails.append((name, str(e).split("\n")[0] + " | " +
                      str(e).split("\n")[-1]))

print(f"PASS ({len(passes)}):")
for n, r in passes: print(f"  {n}: {r} rows")
print(f"NO-ORACLE rows-only ({len(nooracle)}):")
for n, r in nooracle: print(f"  {n}: {r} rows")
print(f"FAIL ({len(fails)}):")
for n, m in fails: print(f"  {n}: {m[:300]}")
sys.exit(1 if fails else 0)
