#!/usr/bin/env python3
"""DuckDB twin for the sf1/sf4 slope bench: runs a subset of the oracle
SQL against a (generated) sf directory, one subprocess per query with a
hard timeout — the recursive/brute-force oracles can explode at scale,
and a timeout IS a slope finding, not an error.

Round-14 change (r13 verdict item 1, structural): when a dump directory
is given, each worker ALSO writes the oracle result it just computed to
`<dumpDir>/<name>.parquet` — the scale-correctness compare then becomes
a free parquet diff (tools/compare_from_dump.py) instead of a second
full DuckDB burn, so the hash gate can never again be lost to a session
ending after the timed legs. Timing convention: 3-rep median of
`con.sql(sql).df()` (one extra rep is skipped when the first exceeds
60 s — the long walls are the slope finding, not the noise floor).
r13 timed `.fetchall()`; `.df()` (arrow) is the same materialization
work and lets the LAST rep's frame be dumped without a 4th execution.

Usage: bench_duckdb_subset.py <sfDir> <verifyOutDir> <q1,q2,...>
                              [timeoutSec] [dumpDir]
Prints one JSON line {"queries": {...}, "timeouts": [...], "total": sec}.
"""
import json, sys, os, time, subprocess

sf, out, subset = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
tmo = int(sys.argv[4]) if len(sys.argv) > 4 else 900
dump = sys.argv[5] if len(sys.argv) > 5 else None
if dump:
    os.makedirs(dump, exist_ok=True)

WORKER = r"""
import json, statistics, sys, glob, os, time
import duckdb
sf, out, name, dump = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    con.sql(f"CREATE VIEW {os.path.basename(p)[:-8]} AS SELECT * FROM '{p}'")
sql = json.load(open(f"{out}/oracle_sql.json"))[name]
samples, df = [], None
for rep in range(3):
    t0 = time.monotonic()
    df = con.sql(sql).df()
    samples.append(time.monotonic() - t0)
    if samples[0] > 60:
        break
if dump != "-":
    df.to_parquet(f"{dump}/{name}.parquet", index=False)
print(json.dumps({"sec": round(statistics.median(samples), 3),
                  "reps": len(samples)}))
"""

times, timeouts = {}, []
for name in subset:
    name = name.strip()
    try:
        r = subprocess.run([sys.executable, "-c", WORKER, sf, out, name,
                            dump or "-"],
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
