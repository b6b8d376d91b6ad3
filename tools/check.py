#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify, then run
each oracle SQL in DuckDB over the same parquet tables and compare exactly
(column names sorted, row order as produced, exact values).

Usage: python3 tools/check.py [sfdir] [outdir] [--only=q1,q2] [--no-verify]
"""
import json
import math
import subprocess
import sys

_pos = [a for a in sys.argv[1:] if not a.startswith("--")]
SF = _pos[0] if len(_pos) > 0 else "/root/testdata/sf0.01"
OUT = _pos[1] if len(_pos) > 1 else "/tmp/verify_out"
ONLY = None
JSON_OUT = None
for a in sys.argv[1:]:
    if a.startswith("--only="):
        ONLY = set(a[len("--only="):].split(","))
    if a.startswith("--json="):
        JSON_OUT = a[len("--json="):]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_verify():
    extra = " " + ",".join(sorted(ONLY)) if ONLY else ""
    cmd = ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}{extra}']
    env = dict(__import__("os").environ, SPARK_GRAFT_CPUS="8")
    p = subprocess.run(cmd, capture_output=True, text=True, env=env, cwd="/root/repo")
    sys.stdout.write(p.stdout[-3000:])
    sys.stderr.write(p.stderr[-8000:])
    if p.returncode != 0:
        print("VERIFY FAILED rc=", p.returncode)
        sys.exit(1)


def env_fingerprint(duckdb):
    """Environment fingerprint recorded in every JSON artifact so a
    box-specific divergence (the r15 q214/q231 mystery) is attributable:
    duckdb + python + JVM versions, TZ, locale, cpu count."""
    import locale
    import os
    import platform
    try:
        jvm = subprocess.run(["java", "-version"], capture_output=True,
                             text=True).stderr.splitlines()[0]
    except Exception as e:
        jvm = f"unavailable: {e}"
    return {
        "duckdb": duckdb.__version__,
        "python": platform.python_version(),
        "jvm": jvm,
        "tz": os.environ.get("TZ", "(unset)"),
        "locale": locale.setlocale(locale.LC_ALL, None),
        "lang": os.environ.get("LANG", "(unset)"),
        "cpus": os.cpu_count(),
        "platform": platform.platform(),
    }


def cmp_cell(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main():
    if "--no-verify" not in sys.argv:
        run_verify()
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracles = json.load(open(f"{OUT}/oracle_sql.json"))
    names = sorted(n for n in oracles if ONLY is None or n in ONLY)
    npass = nfail = 0
    failures = []
    for name in names:
        try:
            ours = con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'")
            our_cols = list(ours.columns)
            our_rows = ours.fetchall()
        except Exception as e:
            print(f"FAIL {name}: cannot read our output: {e}")
            failures.append({"name": name, "err": f"cannot read our output: {e}"})
            nfail += 1
            continue
        try:
            oracle = con.sql(oracles[name])
            o_cols = list(oracle.columns)
            o_rows = oracle.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures.append({"name": name, "err": f"oracle SQL error: {e}"})
            nfail += 1
            continue
        # type-kind gate (r17): the driver hashes TYPED values, so an oracle
        # column whose DuckDB type kind differs from our parquet type kind
        # (e.g. an uncast sum() → HUGEINT/int128 vs Spark's int64) hash-fails
        # on the driver even when every python value compares equal — the
        # q214/q231 two-round mystery. Fail it here so it never ships.
        def _kind(t):
            # each integer width is its own kind: the driver hashes TYPED
            # values (the q214/q231 int128 incident), so an oracle INTEGER
            # vs our parquet BIGINT is assumed hash-splitting too — cast
            # the oracle rather than collapsing widths here.
            t = str(t)
            if t in ("FLOAT", "DOUBLE"):
                return "float"
            return t
        our_types = dict(zip(our_cols, [str(t) for t in ours.types]))
        o_types = dict(zip(o_cols, [str(t) for t in oracle.types]))
        kind_bad = [
            f"col {c}: oracle {o_types[c]} vs ours {our_types[c]}"
            for c in o_cols
            if c in our_types and _kind(o_types[c]) != _kind(our_types[c])]
        if kind_bad:
            print(f"FAIL {name}: type-kind mismatch: {kind_bad}")
            failures.append({"name": name,
                             "err": f"type-kind mismatch: {kind_bad}"})
            nfail += 1
            continue
        if sorted(our_cols) != sorted(o_cols):
            print(f"FAIL {name}: columns ours={our_cols} oracle={o_cols}")
            failures.append({"name": name, "err": f"columns ours={our_cols} oracle={o_cols}"})
            nfail += 1
            continue
        # driver sorts columns by name before hashing
        perm_o = [our_cols.index(c) for c in sorted(our_cols)]
        perm_d = [o_cols.index(c) for c in sorted(o_cols)]
        a = [tuple(r[i] for i in perm_o) for r in our_rows]
        b = [tuple(r[i] for i in perm_d) for r in o_rows]
        if len(a) != len(b):
            print(f"FAIL {name}: rowcount ours={len(a)} oracle={len(b)}")
            failures.append({"name": name, "err": f"rowcount ours={len(a)} oracle={len(b)}"})
            nfail += 1
            continue
        bad = None
        cols_sorted = sorted(our_cols)
        for i, (ra, rb) in enumerate(zip(a, b)):
            if not all(cmp_cell(x, y) for x, y in zip(ra, rb)):
                cells = [{"row": i, "column": cols_sorted[j],
                          "spark": ra[j], "oracle": rb[j]}
                         for j in range(len(ra))
                         if not cmp_cell(ra[j], rb[j])]
                bad = (i, ra, rb, cells)
                break
        if bad:
            print(f"FAIL {name}: first diff at row {bad[0]}:\n  ours  ={bad[1]}\n  oracle={bad[2]}")
            for c in bad[3]:
                print(f"  cell row={c['row']} col={c['column']}: "
                      f"spark={c['spark']!r} ({type(c['spark']).__name__}) "
                      f"oracle={c['oracle']!r} ({type(c['oracle']).__name__})")
            failures.append({"name": name,
                             "err": f"first diff at row {bad[0]}: ours={bad[1]} oracle={bad[2]}",
                             "cells": bad[3]})
            nfail += 1
        else:
            print(f"PASS {name} ({len(a)} rows)")
            npass += 1
    # rows-only entries (no oracle): report row counts
    import os
    for d in sorted(os.listdir(OUT)):
        if d not in oracles and os.path.isdir(f"{OUT}/{d}"):
            try:
                n = con.sql(f"SELECT count(*) FROM '{OUT}/{d}/*.parquet'").fetchone()[0]
                print(f"ROWS {d}: {n}")
            except Exception as e:
                print(f"ROWS {d}: unreadable: {e}")
    print(f"== {npass} pass / {nfail} fail")
    if JSON_OUT:
        with open(JSON_OUT, "w") as f:
            json.dump({"sf_dir": SF, "n_queries": len(names), "pass": npass,
                       "fail": nfail, "failures": failures,
                       "env": env_fingerprint(duckdb)}, f, indent=1, default=str)
        print(f"wrote {JSON_OUT}")
    sys.exit(1 if nfail else 0)


if __name__ == "__main__":
    main()
