#!/usr/bin/env python3
"""Merge the round-19 sf0.1 sweep logs into CORRECTNESS_sf01_r19.json.

The sweep ran as one Spark Verify phase (all 334 pre-cohort queries'
outputs written once at the mid-round HEAD) plus a DuckDB compare phase
that was PAUSED at q185 to free the box for the closing bench, then
resumed over the remaining names with --no-verify against the same
outputs. The r19 cohort (q329-q339, added after the sweep started) was
verified separately at final HEAD (CORRECTNESS_sf01_r19_cohort.json).

Usage: python3 tools/merge_sf01_r19.py <log1> <log2> [out.json]
"""
import json
import re
import subprocess
import sys

logs = sys.argv[1:3]
out_path = sys.argv[3] if len(sys.argv) > 3 else "CORRECTNESS_sf01_r19.json"

passed, failed = {}, {}
for lg in logs:
    txt = open(lg, errors="replace").read()
    for name, rows in re.findall(r"^PASS (\S+) \((\d+) rows\)", txt, re.M):
        passed[name] = int(rows)
    for name in re.findall(r"^FAIL (\S+)", txt, re.M):
        failed[name] = True
for name in passed:
    failed.pop(name, None)

head = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                      capture_output=True, text=True).stdout.strip()
doc = {
    "sf_dir": "/root/testdata/sf0.1",
    "n_queries": len(passed) + len(failed),
    "pass": len(passed),
    "fail": len(failed),
    "failures": sorted(failed),
    "head": head,
    "note": ("single Verify phase at the mid-round HEAD; DuckDB compare "
             "paused for the closing bench and resumed with --no-verify "
             "over the same outputs; q329-q339 covered by "
             "CORRECTNESS_sf01_r19_cohort.json at final HEAD"),
}
json.dump(doc, open(out_path, "w"), indent=1)
print(out_path, doc["pass"], "pass /", doc["fail"], "fail")
