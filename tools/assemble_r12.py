#!/usr/bin/env python3
"""Assemble the round-12 measurement artifacts from a finished
chain_r12.sh output directory (/tmp/chain_r12). Medians follow the
repo's measurement convention: per-query median across the 3 fresh-JVM
runs; the headline is the median of the 3 run totals.

Usage: assemble_r12.py [chainOutDir] [head] [note-suffix]
Writes BENCH_LOCAL_r12.json, BENCH_SF1_r12.json, BENCH_SF4_r12.json,
BENCH_ANN_r12.json, DUCKDB_BASELINE_r12.json, DUCKDB_SF1_r12.json,
DUCKDB_SF4_r12.json, CORRECTNESS_SCALE_r12.json into the repo root.
"""
import json, re, statistics, subprocess, sys

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/chain_r12"
# Provenance fix (ADVICE r11): the head is the one the CHAIN measured,
# recorded in its status file at start - never the assembly-time HEAD,
# which silently misattributes artifacts after any post-chain commit.
if len(sys.argv) > 2:
    head = sys.argv[2]
else:
    import pathlib
    st = pathlib.Path("/tmp/chain_r12.status").read_text()
    m = re.search(r"chain start head=([0-9a-f]+)", st)
    assert m, "no 'chain start head=' line in /tmp/chain_r12.status; pass head explicitly"
    head = m.group(1)

NOTE = ("Round-12 3-run medians at the round-closing head (leaf-byte-gated "
        "compact-scan spreads; data-sized session edge index; q113 local "
        "kernel gate; q106 self-asof shape; session-scoped compiler id-map "
        "and seed-probe memos; q109 on the distributed rank), fresh JVM "
        "per run, toRdd materialization. DuckDB twins are 3-rep in-process "
        "medians (bench_duckdb.py) with a >2x-mover suspect flag vs r11. "
        "q88's twin is a closed-form feature prediction - a correctness "
        "oracle, not a timing baseline; exclude it from ratio reporting.")


def bench_medians(jsonl, dst, sf, extra=None):
    runs = [json.loads(l) for l in open(jsonl) if l.strip()]
    assert len(runs) == 3, f"{jsonl}: expected 3 runs, got {len(runs)}"
    names = runs[0]["queries"].keys()
    qm = {n: round(statistics.median(r["queries"][n] for r in runs), 4)
          for n in sorted(names)}
    totals = sorted(round(r["value"], 2) for r in runs)
    art = {"median_total_sec": totals[1], "totals_sec": totals, "runs": 3,
           "sf": sf, "head": head, "note": NOTE, "queries_median": qm,
           "gc_ms": [r.get("gc_ms") for r in runs]}
    if extra:
        art.update(extra)
    json.dump(art, open(dst, "w"), indent=1)
    print(f"{dst}: total={totals[1]} ({len(qm)} queries)")
    return qm


def ann(jsonl, dst):
    lines = [json.loads(l) for l in open(jsonl) if l.strip()]
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


def duck(src, dst, q32=None):
    art = json.load(open(src))
    art["head"] = head
    if q32 and os.path.exists(q32):
        a32 = json.load(open(q32))
        art.setdefault("queries", {}).update(a32.get("queries", {}))
        art["timeouts"] = sorted(set(art.get("timeouts", []))
                                 | set(a32.get("timeouts", [])))
        art["total"] = round(sum(art["queries"].values()), 3)
        art["addendum"] = "q32_summarize_pg merged from the idle-box addendum"
    json.dump(art, open(dst, "w"), indent=1)
    t = art.get("total")
    print(f"{dst}: total={t} suspect={art.get('suspect')} "
          f"timeouts={art.get('timeouts')}")


def scale_correctness(dst):
    art = {"head": head}
    for sf, txt in (("sf1", f"{out}/cmpsf1.txt"), ("sf4", f"{out}/cmpsf4.txt")):
        res = {}
        files = [txt, f"{out}/cmp{sf}_q32.txt"]
        for f in files:
            if not os.path.exists(f):
                continue
            for line in open(f):
                m = re.match(r"\s+(pass|FAIL|ORACLE-TIMEOUT)\s+(q\w+)", line)
                if m:
                    res[m.group(2)] = {"pass": "PASS", "FAIL": "FAIL",
                                       "ORACLE-TIMEOUT": "ORACLE-TIMEOUT"}[
                                           m.group(1)]
        # the chain subset carried a typo'd name (no such query) whose
        # row is a harness artifact, not a correctness result; the real
        # q32_summarize_pg row comes from the addendum compare
        res.pop("q32_summarize", None)
        npass = sum(1 for v in res.values() if v == "PASS")
        nfail = sum(1 for v in res.values() if v == "FAIL")
        ntmo = sum(1 for v in res.values() if v == "ORACLE-TIMEOUT")
        art[sf] = {"summary": f"{npass} PASS / {nfail} FAIL / "
                              f"{ntmo} oracle-timeout",
                   "results": dict(sorted(res.items()))}
        print(f"CORRECTNESS_SCALE {sf}: {art[sf]['summary']}")
    json.dump(art, open(dst, "w"), indent=1)


# Addendum legs (tools/addendum_r12.sh), run on the post-chain idle box:
# (a) q32_summarize_pg at sf1/sf4 — the chain subset carried a typo'd
#     name (q32_summarize) so the in-chain legs skipped it; its bench
#     medians, twins and compare rows come from the addendum files and
#     are marked "addendum" in the artifacts;
# (b) full addendum re-reps of the scale subsets, kept alongside the
#     chain legs to QUANTIFY the mid-chain hypervisor-steal inflation
#     (the r11-vs-r12 twin totals moved the same way as the Spark side).
import os, statistics as _st

def addendum_medians(jsonl):
    if not os.path.exists(jsonl):
        return None
    runs = [json.loads(l) for l in open(jsonl) if l.strip()]
    if not runs:
        return None
    names = runs[0]["queries"].keys()
    return {n: round(_st.median(r["queries"][n] for r in runs), 4)
            for n in sorted(names)}, sorted(round(r["value"], 2) for r in runs)

bench_medians(f"{out}/bench_sf01.jsonl", "BENCH_LOCAL_r12.json",
              "/root/testdata/sf0.1")
add1 = addendum_medians(f"{out}/bench_sf1_addendum.jsonl")
add4 = addendum_medians(f"{out}/bench_sf4_addendum.jsonl")
bench_medians(f"{out}/bench_sf1.jsonl", "BENCH_SF1_r12.json", "/tmp/sf1gen",
              extra=({"addendum_queries_median": add1[0],
                      "addendum_totals_sec": add1[1],
                      "addendum_note": "idle-box re-reps incl. q32_summarize_pg"}
                     if add1 else None))
bench_medians(f"{out}/bench_sf4.jsonl", "BENCH_SF4_r12.json", "/tmp/sf4gen",
              extra=({"addendum_queries_median": add4[0],
                      "addendum_totals_sec": add4[1],
                      "addendum_note": "idle-box re-reps incl. q32_summarize_pg"}
                     if add4 else None))
ann(f"{out}/bench_ann.jsonl", "BENCH_ANN_r12.json")
duck(f"{out}/duck_sf01.json", "DUCKDB_BASELINE_r12.json")
duck(f"{out}/duck_sf1.json", "DUCKDB_SF1_r12.json",
     q32=f"{out}/duck_sf1_q32.json")
duck(f"{out}/duck_sf4.json", "DUCKDB_SF4_r12.json",
     q32=f"{out}/duck_sf4_q32.json")
scale_correctness("CORRECTNESS_SCALE_r12.json")
print("assembled at head", head)
