#!/usr/bin/env python3
"""Assemble CORRECTNESS_sf01_r18.json: the standing 296-query surface was
proven at sf0.1 by the r17 full single-session sweep (CORRECTNESS_sf01_r17
.json at r17 HEAD); this round's artifact records (a) the r18 cohort
(q306-q326) verified at sf0.1 by --only runs at HEAD, and (b) the full
single-session sf0.1 sweep state at round close (complete, or partial with
the last verified query named — the r16/r17 precedent).
"""
import json
import os
import re

OUT = "/root/repo/CORRECTNESS_sf01_r18.json"

d = {"sf_dir": "/root/testdata/sf0.1"}

if os.path.exists("/tmp/sf01_r18_cohort.json"):
    c = json.load(open("/tmp/sf01_r18_cohort.json"))
    d["cohort"] = {
        "queries": c["n_queries"], "pass": c["pass"], "fail": c["fail"],
        "failures": c["failures"],
        "note": "r18 cohort (q306-q326) via tools/check.py --only at HEAD"}

for extra, name in (("/tmp/sf01_q327.json", "q327_wordpiece_encode"),
                    ("/tmp/sf01_q328.json", "q328_ulaw_codec")):
    if os.path.exists(extra):
        c = json.load(open(extra))
        d[name.split("_")[0]] = {
            "pass": c["pass"], "fail": c["fail"],
            "note": f"{name} via --only at its landing HEAD"}

if os.path.exists("/tmp/sf01_r18_sweep.json"):
    s = json.load(open("/tmp/sf01_r18_sweep.json"))
    d["full_sweep"] = {
        "queries": s["n_queries"], "pass": s["pass"], "fail": s["fail"],
        "failures": s["failures"], "env": s.get("env"),
        "note": "full single-session sf0.1 sweep at r18 HEAD"}
elif os.path.exists("/tmp/sf01_r18_sweep.log"):
    log = open("/tmp/sf01_r18_sweep.log").read()
    npass = len(re.findall(r"^PASS ", log, re.M))
    nfail = len(re.findall(r"^FAIL ", log, re.M))
    last = re.findall(r"^PASS (q\S+)", log, re.M)
    d["full_sweep_partial"] = {
        "pass": npass, "fail": nfail,
        "last_verified": last[-1] if last else None,
        "note": "single-session full sf0.1 sweep at r18 HEAD, still "
                "running at round close (name order; the standing 296 "
                "have r17 full-sweep coverage, the cohort has the --only "
                "coverage above)"}

json.dump(d, open(OUT, "w"), indent=1, default=str)
print("wrote", OUT, json.dumps(d)[:200])
