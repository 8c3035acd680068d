#!/usr/bin/env python3
"""Times every oracle SQL from a Verify dump in DuckDB on the same
parquet tables — the single-node baseline the Spark BENCH numbers are
compared against (BASELINE.md has no published numbers, so we measure).

Usage: bench_duckdb.py <sfDir> <verifyOutDir> [repeats]
Prints one JSON line: {"queries": {name: best_sec}, "total": sec}
"""
import json, sys, glob, os, time
import duckdb

sf, out = sys.argv[1], sys.argv[2]
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    con.sql(f"CREATE VIEW {os.path.basename(p)[:-8]} AS SELECT * FROM '{p}'")

oracles = json.load(open(f"{out}/oracle_sql.json"))
times = {}
for name, sql in sorted(oracles.items()):
    best = None
    try:
        for _ in range(reps):
            t0 = time.monotonic()
            con.sql(sql).fetchall()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
    except Exception as e:
        best = None
        print(f"# {name}: error {e}", file=sys.stderr)
    if best is not None:
        times[name] = round(best, 4)
print(json.dumps({"queries": times, "total": round(sum(times.values()), 3)}))
