#!/usr/bin/env python3
"""Assemble CORRECTNESS_sf1_subset.json from a scoped Verify dump at target/sf1.

Usage:
  1. qs=$(python3 -c "import json;print(','.join(json.load(open('CORRECTNESS_sf1_subset.json'))['queries']))")
  2. SPARK_GRAFT_ONLY=$qs sbt -batch 'runMain graft.Verify target/sf1 /tmp/verify_sf1'
  3. python3 scripts/sf1_subset.py target/sf1 /tmp/verify_sf1

Runs the same local_check gate, then writes {n, pass, queries, sf_dir}.
Dev-only tooling (driver-side python/duckdb); not part of the shipped library."""
import json, subprocess, sys, os

sfdir = sys.argv[1] if len(sys.argv) > 1 else "target/sf1"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_sf1"

r = subprocess.run([sys.executable, "scripts/local_check.py", sfdir, outdir],
                   capture_output=True, text=True)
lines = [l for l in r.stdout.splitlines() if l.startswith(("PASS", "FAIL"))]
# a gate that DIED (OOM-killed duckdb, etc.) must not masquerade as an empty-but-
# clean run and clobber the committed artifact with n=0
if not lines:
    print(f"local_check produced no PASS/FAIL lines (exit {r.returncode}); "
          f"stderr tail:\n{r.stderr[-2000:]}")
    sys.exit(2)
passed = sorted(l.split()[1] for l in lines if l.startswith("PASS"))
failed = sorted(l.split()[1] for l in lines if l.startswith("FAIL"))
queries = sorted(passed + failed)
artifact = {"n": len(queries), "pass": len(passed), "queries": queries, "sf_dir": sfdir}
with open("CORRECTNESS_sf1_subset.json", "w") as f:
    json.dump(artifact, f, indent=1)
print(f"{len(passed)}/{len(queries)} pass at {sfdir}")
if failed:
    print("FAILED:", ", ".join(failed))
    sys.exit(1)
