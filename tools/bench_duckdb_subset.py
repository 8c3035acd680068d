#!/usr/bin/env python3
"""DuckDB twin for the sf1 slope bench: runs a subset of the oracle SQL
against a (generated) sf directory, one subprocess per query with a hard
timeout — the recursive/brute-force oracles can explode at scale, and a
timeout IS a slope finding, not an error.

Usage: bench_duckdb_subset.py <sfDir> <verifyOutDir> <q1,q2,...> [timeoutSec]
Prints one JSON line {"queries": {...}, "timeouts": [...], "total": sec}.
"""
import json, sys, glob, os, time, subprocess

sf, out, subset = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
tmo = int(sys.argv[4]) if len(sys.argv) > 4 else 900

# Round-11 measurement convention: 3-rep MEDIAN like the Spark side —
# unless the first rep already exceeds 60 s, where the box's 2-4 s
# cold-cache noise is <7% of the wall and two more reps would cost
# tens of minutes for no precision (the long walls are the point of
# the slope run, not the noise floor).
WORKER = r"""
import json, statistics, sys, glob, os, time
import duckdb
sf, out, name = sys.argv[1], sys.argv[2], sys.argv[3]
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    con.sql(f"CREATE VIEW {os.path.basename(p)[:-8]} AS SELECT * FROM '{p}'")
sql = json.load(open(f"{out}/oracle_sql.json"))[name]
samples = []
for rep in range(3):
    t0 = time.monotonic()
    con.sql(sql).fetchall()
    samples.append(time.monotonic() - t0)
    if samples[0] > 60:
        break
print(json.dumps({"sec": round(statistics.median(samples), 3),
                  "reps": len(samples)}))
"""

times, timeouts = {}, []
for name in subset:
    name = name.strip()
    try:
        r = subprocess.run([sys.executable, "-c", WORKER, sf, out, name],
                           capture_output=True, text=True, timeout=tmo)
        if r.returncode == 0:
            times[name] = json.loads(r.stdout.strip().splitlines()[-1])["sec"]
        else:
            print(f"# {name}: {r.stderr.strip()[:200]}", file=sys.stderr)
    except subprocess.TimeoutExpired:
        timeouts.append(name)
        print(f"# {name}: timeout >{tmo}s", file=sys.stderr)
print(json.dumps({"queries": times, "timeouts": timeouts,
                  "timeout_sec": tmo,
                  "total": round(sum(times.values()), 3)}))
