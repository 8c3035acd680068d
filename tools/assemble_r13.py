#!/usr/bin/env python3
"""Assemble the round-13 measurement artifacts from a finished
chain_r13.sh output directory (/tmp/chain_r13). Medians follow the
repo's measurement convention: per-query median across the 3 fresh-JVM
runs; the headline is the median of the 3 run totals.

Usage: assemble_r13.py [chainOutDir] [head] [note-suffix]
Writes BENCH_LOCAL_r13.json, BENCH_SF1_r13.json, BENCH_SF4_r13.json,
BENCH_ANN_r13.json, DUCKDB_BASELINE_r13.json, DUCKDB_SF1_r13.json,
DUCKDB_SF4_r13.json, CORRECTNESS_SCALE_r13.json into the repo root.
"""
import json, os, re, statistics, sys

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/chain_r13"
# Provenance: the head is the one the CHAIN measured, recorded in its
# status file at start — never the assembly-time HEAD.
if len(sys.argv) > 2:
    head = sys.argv[2]
else:
    import pathlib
    st = pathlib.Path("/tmp/chain_r13.status").read_text()
    m = re.search(r"chain start head=([0-9a-f]+)", st)
    assert m, "no 'chain start head=' line in /tmp/chain_r13.status"
    head = m.group(1)

NOTE = ("Round-13 3-run medians at the round-closing head (data-snapshot "
        "token in memo proofs; size-gated literal-map path translation; "
        "exactQuantiles/sampleQuantiles local branch; q114 local "
        "co-purchase kernel absorbing distinct+cap; centralized "
        "localEdgePairs gate), fresh JVM per run, toRdd materialization. "
        "Status file logs cumulative /proc/stat steal per leg — box "
        "contention windows are attributable. DuckDB twins are 3-rep "
        "in-process medians (bench_duckdb.py) with a >2x-mover suspect "
        "flag vs the r11 committed baseline (r12 artifacts were lost "
        "with /tmp before assembly). Each Spark bench line also carries "
        "ann_split (one timed IVF build + one 20-query search against "
        "the prebuilt index) beside q56's one-shot row. q88's twin is a "
        "closed-form feature prediction - exclude from ratio reporting.")


def bench_medians(jsonl, dst, sf):
    if not os.path.exists(jsonl):
        print(f"{dst}: SKIPPED ({jsonl} missing)")
        return None
    runs = [json.loads(l) for l in open(jsonl) if l.strip()]
    if not runs:
        print(f"{dst}: SKIPPED ({jsonl} empty)")
        return None
    if len(runs) != 3:
        print(f"{dst}: WARNING {len(runs)} runs (convention is 3) — "
              "medians over what completed")
    names = runs[0]["queries"].keys()
    qm = {n: round(statistics.median(r["queries"][n] for r in runs), 4)
          for n in sorted(names)}
    totals = sorted(round(r["value"], 2) for r in runs)
    art = {"median_total_sec": totals[len(totals) // 2],
           "totals_sec": totals, "runs": len(runs),
           "sf": sf, "head": head, "note": NOTE, "queries_median": qm,
           "gc_ms": [r.get("gc_ms") for r in runs],
           "ann_split": [r.get("ann_split") for r in runs],
           "extra_conf": sorted({r["extra_conf"] for r in runs
                                 if r.get("extra_conf")})}
    json.dump(art, open(dst, "w"), indent=1)
    print(f"{dst}: total={art['median_total_sec']} ({len(qm)} queries)")
    return qm


def ann(jsonl, dst):
    if not os.path.exists(jsonl):
        print(f"{dst}: SKIPPED ({jsonl} missing)")
        return
    lines = [json.loads(l) for l in open(jsonl) if l.strip()]
    if not lines:
        print(f"{dst}: SKIPPED ({jsonl} empty)")
        return
    points = {}
    for l in lines:
        p = points.setdefault(l["sf"], {"ivf": [], "ivfpq": []})
        for kind in ("ivf", "ivfpq"):
            p[kind].append(l[kind])
    art = {"head": head, "unit": "sec",
           "runs_per_sf": max(len(v["ivf"]) for v in points.values()),
           "points": {}}
    for sf, p in points.items():
        art["points"][sf] = {}
        for kind in ("ivf", "ivfpq"):
            runs = p[kind]
            art["points"][sf][kind] = {
                "build_median": round(statistics.median(
                    r["build"] for r in runs), 4),
                "search_median_of_medians": round(statistics.median(
                    r["search_median"] for r in runs), 4),
                "per_run": [{"build": r["build"],
                             "searches": r["searches"]} for r in runs]}
    json.dump(art, open(dst, "w"), indent=1)
    print(f"{dst}: {len(points)} sf points")


def duck(src, dst):
    if not os.path.exists(src) or os.path.getsize(src) == 0:
        print(f"{dst}: SKIPPED ({src} missing/empty)")
        return
    art = json.load(open(src))
    art["head"] = head
    json.dump(art, open(dst, "w"), indent=1)
    print(f"{dst}: total={art.get('total')} suspect={art.get('suspect')} "
          f"timeouts={art.get('timeouts')}")


def scale_correctness(dst):
    art = {"head": head}
    for sf, txt in (("sf1", f"{out}/cmpsf1.txt"), ("sf4", f"{out}/cmpsf4.txt")):
        res = {}
        if not os.path.exists(txt):
            art[sf] = {"summary": "MISSING (chain leg did not run)"}
            print(f"CORRECTNESS_SCALE {sf}: MISSING")
            continue
        for line in open(txt):
            m = re.match(r"\s+(pass|FAIL|ORACLE-TIMEOUT)\s+(q\w+)", line)
            if m:
                res[m.group(2)] = {"pass": "PASS", "FAIL": "FAIL",
                                   "ORACLE-TIMEOUT": "ORACLE-TIMEOUT"}[
                                       m.group(1)]
        npass = sum(1 for v in res.values() if v == "PASS")
        nfail = sum(1 for v in res.values() if v == "FAIL")
        ntmo = sum(1 for v in res.values() if v == "ORACLE-TIMEOUT")
        art[sf] = {"summary": f"{npass} PASS / {nfail} FAIL / "
                              f"{ntmo} oracle-timeout",
                   "results": dict(sorted(res.items()))}
        print(f"CORRECTNESS_SCALE {sf}: {art[sf]['summary']}")
    json.dump(art, open(dst, "w"), indent=1)


# steal attribution: per-leg deltas from the status file
def steal_summary():
    import pathlib
    st = pathlib.Path("/tmp/chain_r13.status").read_text()
    rows = re.findall(r"^(.*?) steal=(\d+) (\d\d:\d\d:\d\d)$", st, re.M)
    prev = None
    out_rows = []
    for tag, s, tm in rows:
        s = int(s)
        if prev is not None:
            out_rows.append({"leg": tag.strip(), "steal_delta": s - prev,
                             "at": tm})
        prev = s
    return out_rows


bench_medians(f"{out}/bench_sf01.jsonl", "BENCH_LOCAL_r13.json",
              "/root/testdata/sf0.1")
bench_medians(f"{out}/bench_sf1.jsonl", "BENCH_SF1_r13.json", "/tmp/sf1gen")
bench_medians(f"{out}/bench_sf4.jsonl", "BENCH_SF4_r13.json", "/tmp/sf4gen")
ann(f"{out}/bench_ann.jsonl", "BENCH_ANN_r13.json")
duck(f"{out}/duck_sf01.json", "DUCKDB_BASELINE_r13.json")
duck(f"{out}/duck_sf1.json", "DUCKDB_SF1_r13.json")
duck(f"{out}/duck_sf4.json", "DUCKDB_SF4_r13.json")
scale_correctness("CORRECTNESS_SCALE_r13.json")
try:
    sj = steal_summary()
    json.dump({"head": head, "legs": sj},
              open("STEAL_r13.json", "w"), indent=1)
    print(f"STEAL_r13.json: {len(sj)} legs")
except Exception as e:
    print("steal summary skipped:", e)
print("assembled at head", head)
