#!/usr/bin/env python3
"""Assemble the round-14 measurement artifacts from a (possibly still
running) chain_r14.sh output directory. Designed to be re-run after
EVERY chain leg — it writes whatever is available and skips the rest,
so the chain can commit artifacts incrementally.

Medians follow the repo's measurement convention: per-query median
across the fresh-JVM runs; the headline is the median of the run totals
(sf1 runs 5 reps this round — r13's 3 spread 128-316 s under steal).

Usage: assemble_r14.py [chainOutDir] [head]
Writes BENCH_LOCAL_r14.json, BENCH_SF1_r14.json, BENCH_SF4_r14.json,
BENCH_ANN_r14.json, DUCKDB_BASELINE_r14.json, DUCKDB_SF1_r14.json,
DUCKDB_SF4_r14.json, CORRECTNESS_SCALE_r14.json,
CORRECTNESS_CHAIN_r14.json, STEAL_r14.json into the repo root.
"""
import json, os, re, statistics, sys

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/chain_r14"
# Provenance: the head is the one the CHAIN measured, recorded in its
# status file at start — never the assembly-time HEAD (mid-chain
# artifact commits move HEAD).
if len(sys.argv) > 2:
    head = sys.argv[2]
else:
    import pathlib
    st = pathlib.Path("/tmp/chain_r14.status").read_text()
    m = re.search(r"chain start head=([0-9a-f]+)", st)
    assert m, "no 'chain start head=' line in /tmp/chain_r14.status"
    head = m.group(1)

NOTE = ("Round-14 medians at the round-closing head (identity self-join "
        "fusion in fixed-hop MATCH; O(1) hash-probe local id translation "
        "carried as an opaque expression reference; window warmup in "
        "Bench so first-use sort/window JIT stays out of q100's row), "
        "fresh JVM per run, toRdd materialization; sf1 runs 5 reps "
        "(r13's 3 spread 128-316 s under steal). Status file logs "
        "cumulative /proc/stat steal per leg. DuckDB sf0.1 twins are "
        "3-rep in-process medians (bench_duckdb.py) with a >2x-mover "
        "suspect flag vs the r13 committed baseline. sf1/sf4 twins time "
        "con.sql(sql).df() (r13 timed .fetchall(); .df() is the same "
        "materialization and lets the last rep's frame be dumped for "
        "the free-diff scale hash gate). Each Spark bench line carries "
        "ann_split (one timed IVF build + one 20-query search against "
        "the prebuilt index) beside q56's one-shot row; the assembled "
        "artifact also carries ann_amortized with the duck one-shot twin "
        "for the ratio the one-shot row cannot express. q88's twin is a "
        "closed-form feature prediction - exclude from ratio reporting.")


def bench_medians(jsonl, dst, sf, expected_runs):
    if not os.path.exists(jsonl):
        print(f"{dst}: SKIPPED ({jsonl} missing)")
        return None
    runs = [json.loads(l) for l in open(jsonl) if l.strip()]
    if not runs:
        print(f"{dst}: SKIPPED ({jsonl} empty)")
        return None
    if len(runs) != expected_runs:
        print(f"{dst}: WARNING {len(runs)} runs (this leg's convention is "
              f"{expected_runs}) — medians over what completed")
    names = runs[0]["queries"].keys()
    qm = {n: round(statistics.median(r["queries"][n] for r in runs), 4)
          for n in sorted(names)}
    totals = sorted(round(r["value"], 2) for r in runs)
    splits = [r["ann_split"] for r in runs if r.get("ann_split")]
    ann_amortized = None
    if splits:
        ann_amortized = {
            "ivf_build_median": round(statistics.median(
                s["ivf_build"] for s in splits), 4),
            "ivf_search_median": round(statistics.median(
                s["ivf_search"] for s in splits), 4),
            "note": "build-once/search-many split of q56's one-shot row; "
                    "duck_oneshot_sec and the ratio are filled once the "
                    "matching twin leg lands"}
    art = {"median_total_sec": totals[len(totals) // 2],
           "totals_sec": totals, "runs": len(runs),
           "sf": sf, "head": head, "note": NOTE, "queries_median": qm,
           "gc_ms": [r.get("gc_ms") for r in runs],
           "ann_split": [r.get("ann_split") for r in runs],
           "ann_amortized": ann_amortized,
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
        return None
    art = json.load(open(src))
    art["head"] = head
    json.dump(art, open(dst, "w"), indent=1)
    print(f"{dst}: total={art.get('total')} suspect={art.get('suspect')} "
          f"timeouts={art.get('timeouts')}")
    return art


def fill_ann_ratio(bench_dst, duck_art):
    """Once a bench artifact AND its duck twin both exist, complete the
    ann_amortized block with the duck one-shot q56 and the ratio."""
    if duck_art is None or not os.path.exists(bench_dst):
        return
    art = json.load(open(bench_dst))
    am = art.get("ann_amortized")
    q56 = (duck_art.get("queries") or {}).get("q56_ivf_ann")
    if not am or q56 is None:
        return
    am["duck_oneshot_sec"] = q56
    am["search_vs_duck_oneshot_ratio"] = round(
        am["ivf_search_median"] / q56, 3) if q56 > 0 else None
    am["note"] = ("build-once/search-many split of q56's one-shot row: "
                  "the one-shot row replays the full k-means build per "
                  "call by its oracle's demand; the shape users run is "
                  "amortized search against a persisted index. The twin "
                  "has no index - its one-shot IS its steady state, so "
                  "the honest amortized comparison is spark search vs "
                  "duck one-shot.")
    json.dump(art, open(bench_dst, "w"), indent=1)
    print(f"{bench_dst}: ann_amortized ratio filled "
          f"(search {am['ivf_search_median']} vs duck {q56})")


def parse_cmp(txt):
    res = {}
    if not os.path.exists(txt):
        return None
    for line in open(txt):
        m = re.match(r"\s+(pass|FAIL|ORACLE-TIMEOUT|DUMP-MISSING)\s+(q\w+)",
                     line)
        if m:
            res[m.group(2)] = {"pass": "PASS", "FAIL": "FAIL",
                               "ORACLE-TIMEOUT": "ORACLE-TIMEOUT",
                               "DUMP-MISSING": "DUMP-MISSING"}[m.group(1)]
    return res


def scale_correctness(dst):
    art = {"head": head,
           "note": "sf1/sf4 oracle results dumped DURING the timed twin "
                   "legs (bench_duckdb_subset.py dump arg) and diffed by "
                   "compare_from_dump.py - the r14 structural fix for the "
                   "r13 gap where the re-burn compare step died with the "
                   "session. ORACLE-TIMEOUT rows are slope findings about "
                   "the twin (those queries are value-certified at "
                   "sf0.01/sf0.1 by the standard gate)."}
    wrote = False
    for sf, txt in (("sf1", f"{out}/cmpsf1.txt"), ("sf4", f"{out}/cmpsf4.txt")):
        res = parse_cmp(txt)
        if res is None:
            art[sf] = {"summary": "MISSING (chain leg not yet run)"}
            print(f"CORRECTNESS_SCALE {sf}: not yet run")
            continue
        wrote = True
        npass = sum(1 for v in res.values() if v == "PASS")
        nfail = sum(1 for v in res.values() if v == "FAIL")
        ntmo = sum(1 for v in res.values() if v == "ORACLE-TIMEOUT")
        nmiss = sum(1 for v in res.values() if v == "DUMP-MISSING")
        art[sf] = {"summary": f"{npass} PASS / {nfail} FAIL / "
                              f"{ntmo} oracle-timeout / {nmiss} missing",
                   "results": dict(sorted(res.items()))}
        print(f"CORRECTNESS_SCALE {sf}: {art[sf]['summary']}")
    if wrote:
        json.dump(art, open(dst, "w"), indent=1)


def chain_correctness(dst):
    art = {"head": head}
    wrote = False
    for sf, txt in (("sf0.01", f"{out}/cmp001.txt"),
                    ("sf0.1", f"{out}/cmp01.txt")):
        if not os.path.exists(txt):
            continue
        lines = open(txt).read()
        mp = re.search(r"^PASS \((\d+)\)", lines, re.M)
        mf = re.search(r"^FAIL \((\d+)\)", lines, re.M)
        if mp and mf:
            wrote = True
            art[sf] = {"pass": int(mp.group(1)), "fail": int(mf.group(1))}
            print(f"CORRECTNESS_CHAIN {sf}: {art[sf]}")
    if wrote:
        json.dump(art, open(dst, "w"), indent=1)


def steal_summary():
    import pathlib
    st = pathlib.Path("/tmp/chain_r14.status").read_text()
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


bench_medians(f"{out}/bench_sf01.jsonl", "BENCH_LOCAL_r14.json",
              "/root/testdata/sf0.1", 3)
bench_medians(f"{out}/bench_sf1.jsonl", "BENCH_SF1_r14.json",
              "/tmp/sf1gen", 5)
bench_medians(f"{out}/bench_sf4.jsonl", "BENCH_SF4_r14.json",
              "/tmp/sf4gen", 3)
ann(f"{out}/bench_ann.jsonl", "BENCH_ANN_r14.json")
d01 = duck(f"{out}/duck_sf01.json", "DUCKDB_BASELINE_r14.json")
d1 = duck(f"{out}/duck_sf1.json", "DUCKDB_SF1_r14.json")
d4 = duck(f"{out}/duck_sf4.json", "DUCKDB_SF4_r14.json")
fill_ann_ratio("BENCH_LOCAL_r14.json", d01)
fill_ann_ratio("BENCH_SF1_r14.json", d1)
fill_ann_ratio("BENCH_SF4_r14.json", d4)
scale_correctness("CORRECTNESS_SCALE_r14.json")
chain_correctness("CORRECTNESS_CHAIN_r14.json")
try:
    sj = steal_summary()
    json.dump({"head": head, "legs": sj},
              open("STEAL_r14.json", "w"), indent=1)
    print(f"STEAL_r14.json: {len(sj)} legs")
except Exception as e:
    print("steal summary skipped:", e)
print("assembled at head", head)
