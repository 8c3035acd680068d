#!/usr/bin/env python3
"""Free-diff scale-correctness compare: diffs the Spark verify dumps
against the DuckDB oracle results that bench_duckdb_subset.py ALREADY
dumped during the timed twin run — no second DuckDB burn, so the sf1/sf4
hash gate can complete in seconds right after the twin leg lands
(r13 verdict item 1: the gate must be structural, not another 1.5 h of
oracle re-runs sequenced last).

Same canonical multiset compare as compare_oracle.py (columns sorted by
name, rows sorted, floats to 6dp). Classification per query:
  pass / FAIL        — dump present, compared
  ORACLE-TIMEOUT     — twin leg recorded a >timeout run (slope finding)
  CARRIED-TIMEOUT    — excluded from the twin leg as a known >timeout
                       oracle (certified at sf0.01/sf0.1 by the standard
                       gate; the timeout itself proved in a prior round)
  DUMP-MISSING       — no dump and no timeout record (a real hole)

Usage: compare_from_dump.py <verifyOutDir> <dumpDir> <q1,q2,...>
                            [duckJson] [carriedCsv]
"""
import glob, json, os, sys

import numpy as np
import pandas as pd

out, dump, subset = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
duck_timeouts = set()
if len(sys.argv) > 4 and os.path.exists(sys.argv[4]):
    try:
        duck_timeouts = set(json.load(open(sys.argv[4])).get("timeouts", []))
    except Exception as e:
        print(f"# WARN: could not read timeouts from {sys.argv[4]}: {e}")
carried = set(sys.argv[5].split(",")) if len(sys.argv) > 5 else set()


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                              str(type(v)).endswith("ndarray'>") else v)
        if df[c].dtype in (np.float64, np.float32):
            df[c] = df[c].round(6)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


passes, fails, timeouts, missing = [], [], [], []
for name in subset:
    name = name.strip()
    dpath = f"{dump}/{name}.parquet"
    if not os.path.exists(dpath):
        if name in duck_timeouts:
            timeouts.append(name)
            print(f"  ORACLE-TIMEOUT {name} (twin leg recorded >timeout "
                  "at this scale)")
        elif name in carried:
            timeouts.append(name)
            print(f"  ORACLE-TIMEOUT {name} (CARRIED: excluded from the "
                  "twin leg as a known >timeout oracle)")
        else:
            missing.append(name)
            print(f"  DUMP-MISSING {name}")
        continue
    try:
        spark_files = glob.glob(f"{out}/{name}/*.parquet")
        spark_df = pd.concat([pd.read_parquet(f) for f in spark_files],
                             ignore_index=True) if spark_files \
            else pd.DataFrame()
        oracle_df = pd.read_parquet(dpath)
        a, b = canon(spark_df), canon(oracle_df)
        if list(a.columns) != list(b.columns):
            fails.append(name)
            print(f"  FAIL {name}: columns differ: spark={list(a.columns)} "
                  f"oracle={list(b.columns)}")
            continue
        if len(a) != len(b):
            fails.append(name)
            print(f"  FAIL {name}: row count: spark={len(a)} oracle={len(b)}")
            continue
        pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                      check_exact=False, atol=2e-6)
        passes.append(name)
        print(f"  pass {name} (rows={len(a)})")
    except AssertionError as e:
        fails.append(name)
        print(f"  FAIL {name}: {str(e).splitlines()[0][:200]} | "
              f"{str(e).splitlines()[-1][:200]}")
    except Exception as e:
        fails.append(name)
        print(f"  FAIL {name}: {type(e).__name__}: {str(e)[:200]}")

print(f"PASS ({len(passes)})  FAIL ({len(fails)}): {','.join(fails)}  "
      f"ORACLE-TIMEOUT ({len(timeouts)}): {','.join(timeouts)}  "
      f"DUMP-MISSING ({len(missing)}): {','.join(missing)}")
sys.exit(1 if (fails or missing) else 0)
