#!/usr/bin/env python3
"""Three-SF float-hazard correctness sweep (VERDICT r8 task 7).

Runs the DuckDB-oracle compare (tools/oracle_check.py) against a
multi-SF Verify dump — one subdir per scale factor, produced by

    sbt "runMain graft.Verify /root/testdata/sf0.001,/root/testdata/sf0.01,/root/testdata/sf0.1 \
         target/verify_3sf --doubles-only"

and writes a per-query × per-SF pass/fail matrix to
target/correctness_3sf.json. Queries with floating-point output are the
only place an engine-rounding hazard can pass at one SF and fail at
another — integer/string outputs are scale-invariant by construction.

Usage: sweep_3sf.py <verifyOutDir> [sfDir...]
  (sfDirs default to the three testdata SFs; each must have a matching
   subdir named like the sfDir basename under verifyOutDir)
"""
import json
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
DEFAULT_SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
               "/root/testdata/sf0.1"]


def main():
    out_dir = sys.argv[1]
    sfs = sys.argv[2:] or DEFAULT_SFS
    matrix = {}
    for sf in sfs:
        sub = os.path.join(out_dir, os.path.basename(sf))
        if not os.path.isdir(sub):
            print(f"missing dump dir {sub}", file=sys.stderr)
            sys.exit(2)
        proc = subprocess.run(
            [sys.executable, os.path.join(HERE, "oracle_check.py"), sf, sub],
            capture_output=True, text=True)
        for line in proc.stdout.splitlines():
            m = re.match(r"^(q\w+): (.*)$", line)
            if not m:
                continue
            name, verdict = m.groups()
            if verdict.startswith("OK"):
                status = "pass"
            elif verdict.startswith("NO-ORACLE"):
                status = "no_oracle"  # rows-only query: nothing to compare
            else:
                status = verdict
            matrix.setdefault(name, {})[os.path.basename(sf)] = status
    n_cells = sum(len(v) for v in matrix.values())
    n_fail = sum(1 for v in matrix.values() for s in v.values()
                 if s not in ("pass", "no_oracle"))
    doc = {"metric": "correctness_3sf", "sfs": [os.path.basename(s) for s in sfs],
           "n_queries": len(matrix), "n_cells": n_cells, "n_fail": n_fail,
           "queries": matrix}
    dest = "target/correctness_3sf.json"
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    with open(dest, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(f"{len(matrix)} queries x {len(sfs)} SFs: {n_fail} failures "
          f"-> {dest}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
