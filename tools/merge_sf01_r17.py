#!/usr/bin/env python3
"""Assemble CORRECTNESS_sf01_r17.json from the full single-session sf0.1
sweep (started at round-17 launch HEAD, 296 queries) plus the per-batch
--only verifications that covered every query added or changed later in
the round. Run with the sweep finished (/tmp/sf01_r17_sweep.json present)
or still in flight (merges the partial log state, the r16 precedent).
"""
import json
import os
import re

OUT = "/root/repo/CORRECTNESS_sf01_r17.json"
BATCHES = (
    "q214_rendezvous_reshard,q231_ks_drift,q295_token_budget_waterfill,"
    "q297_byte_bpe_encode (4/4, HUGEINT oracle fix + byte BPE); "
    "q298_png_pixel_decode (1/1); q25_events_hourly,q81_bpe_merge,"
    "q171_unpivot_melt (3/3, PlanGuard cast rewrites); "
    "q142_ann_segment_append,q143_ann_segment_compact (2/2, serve-once "
    "compaction trim); q299_cross_corpus_decon (1/1, re-verified again "
    "post one-pass rewrite); q300_rendezvous_canon,q301_ks_canon,"
    "q302_ann_cross_corpus (3/3); q303_gif_lzw_decode (1/1); "
    "q297+q304_stream_byte_bpe (2/2, batch/stream parity); "
    "q305_corpus_release_gate (1/1). All at sf0.1 via tools/check.py "
    "--only at the HEAD of each batch's commit.")

if os.path.exists("/tmp/sf01_r17_sweep.json"):
    d = json.load(open("/tmp/sf01_r17_sweep.json"))
    d["note"] = (
        "full single-session sf0.1 sweep at round-17 launch HEAD "
        "(296 queries registered at launch); r17-new/changed queries "
        "verified at sf0.1 by --only batches: " + BATCHES)
else:
    log = open("/tmp/sf01_r17_sweep.log").read()
    npass = len(re.findall(r"^PASS ", log, re.M))
    nfail = len(re.findall(r"^FAIL ", log, re.M))
    last = re.findall(r"^PASS (q\S+)", log, re.M)
    d = {
        "sf_dir": "/root/testdata/sf0.1",
        "full_sweep_partial": {
            "pass": npass, "fail": nfail,
            "last_verified": last[-1] if last else None,
            "note": "single-session full sf0.1 sweep at round-17 launch "
                    "HEAD, still running at round close (name order; the "
                    "remainder had standing r16 coverage)"},
        "note": "r17-new/changed queries verified at sf0.1 by --only "
                "batches: " + BATCHES}
json.dump(d, open(OUT, "w"), indent=1, default=str)
print("wrote", OUT, "pass:", d.get("pass", d.get("full_sweep_partial")))
