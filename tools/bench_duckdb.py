#!/usr/bin/env python3
"""Times every oracle SQL from a Verify dump in DuckDB on the same
parquet tables — the single-node baseline the Spark BENCH numbers are
compared against (BASELINE.md has no published numbers, so we measure).

Measurement convention (round 11): per-query 3-run MEDIAN, same as the
Spark side — best-of-N flattered cold-cache outliers in both directions
(the r10 q32 twin committed 2.98 s where a warm re-time gives ~1.04 s).
Optionally pass a prior round's JSON: any query whose median moved >2x
on unchanged SQL+data is flagged in "suspect" and on stderr — a twin
that moves that much between rounds is a measurement problem, not a
data point.

Usage: bench_duckdb.py <sfDir> <verifyOutDir> [repeats] [priorJson]
Prints one JSON line:
  {"queries": {name: median_sec}, "total": sec, "convention": "...",
   "suspect": {name: {"now": s, "prior": s}}}
"""
import json, statistics, sys, glob, os, time
import duckdb

sf, out = sys.argv[1], sys.argv[2]
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
prior_path = sys.argv[4] if len(sys.argv) > 4 else None
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    con.sql(f"CREATE VIEW {os.path.basename(p)[:-8]} AS SELECT * FROM '{p}'")

oracles = json.load(open(f"{out}/oracle_sql.json"))
times = {}
for name, sql in sorted(oracles.items()):
    samples = []
    try:
        for _ in range(reps):
            t0 = time.monotonic()
            con.sql(sql).fetchall()
            samples.append(time.monotonic() - t0)
    except Exception as e:
        samples = []
        print(f"# {name}: error {e}", file=sys.stderr)
    if samples:
        times[name] = round(statistics.median(samples), 4)

suspect = {}
if prior_path and os.path.exists(prior_path):
    prior = json.load(open(prior_path)).get("queries", {})
    for name, now in times.items():
        p = prior.get(name)
        ratio = max(now, 0.05) / max(p, 0.05) if p else 1.0
        if ratio > 2 or ratio < 0.5:
            suspect[name] = {"now": now, "prior": p}
            print(f"# SUSPECT {name}: median {now}s vs prior {p}s "
                  f"(>2x move on unchanged SQL+data)", file=sys.stderr)

print(json.dumps({"queries": times,
                  "total": round(sum(times.values()), 3),
                  "convention": f"median of {reps} in-process reps",
                  "suspect": suspect}))
