#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in DuckDB
over the same parquet tables and diff against the Verify parquet dumps.
Dev-only tooling (driver-side python/duckdb); not part of the shipped library."""
import json, sys, glob, os
import duckdb


# The driver's gate hashes the RENDERED values, so an int64 29 and a float64
# 29.0 hash-differ even when numerically equal (DuckDB widens SUM(BIGINT) to
# HUGEINT -> pandas float64; the r10 msprt/conformal regression). Classify
# dtypes by how pandas renders them and FAIL on class disagreement before any
# float-coerced value comparison.
def _render_class(dtype):
    k = dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "ts"
    return "obj"


def _selftest():
    import pandas as pd
    a = pd.Series([29, 30], dtype="int64")
    b = pd.Series([29.0, 30.0], dtype="float64")
    assert _render_class(a.dtype) != _render_class(b.dtype), \
        "dtype gate failed to flag int64 vs float64 (the driver WOULD hash-fail this)"
    assert _render_class(pd.Series([1], dtype="int32").dtype) == \
        _render_class(pd.Series([1], dtype="int64").dtype), \
        "int32 vs int64 render identically and must NOT be flagged"
    print("selftest OK: int-vs-float dtype mismatch is a loud failure")


if "--selftest" in sys.argv:
    _selftest()
    sys.exit(0)

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
# big-SF oracles (20k-vector graph walks) exceed RAM without a limit: DuckDB's
# default is a fraction of physical memory but some operators still overshoot —
# an explicit limit + temp dir makes it SPILL instead of getting OOM-killed
mem = os.environ.get("GRAFT_DUCKDB_MEM")
if mem:
    con.execute(f"SET memory_limit='{mem}'")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    # driver testdata ships single files; GenScale output may be a parquet DIRECTORY
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
results = {}
for name in sorted(os.listdir(outdir)):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d):
        continue
    spark_rel = con.sql(f"SELECT * FROM read_parquet('{d}/*.parquet')")
    if name not in oracle:
        results[name] = f"rows-only ({spark_rel.shape[0]} rows)"
        continue
    try:
        oracle_rel = con.sql(oracle[name])
        scols = sorted(spark_rel.columns)
        ocols = sorted(oracle_rel.columns)
        if [c.lower() for c in scols] != [c.lower() for c in ocols]:
            results[name] = f"SCHEMA MISMATCH spark={scols} oracle={ocols}"
            continue
        sdf = spark_rel.df()[scols].sort_values(scols, kind="mergesort").reset_index(drop=True)
        odf = oracle_rel.df()[ocols].sort_values(ocols, kind="mergesort").reset_index(drop=True)
        odf.columns = sdf.columns
        if len(sdf) != len(odf):
            results[name] = f"ROWCOUNT MISMATCH spark={len(sdf)} oracle={len(odf)}"
            continue
        import pandas as pd
        bad = None
        for c in scols:
            a, b = sdf[c], odf[c]
            ca, cb = _render_class(a.dtype), _render_class(b.dtype)
            if {ca, cb} == {"int", "float"} or {ca, cb} == {"bool", "int"} \
                    or {ca, cb} == {"bool", "float"}:
                bad = (f"DTYPE MISMATCH col={c} spark={a.dtype} oracle={b.dtype} "
                       f"(driver hash renders these differently, e.g. 29 vs 29.0)")
                break
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                import numpy as np
                an, bn = a.astype(float), b.astype(float)
                eq = (an.isna() & bn.isna()) | (np.isclose(an, bn, rtol=0, atol=1e-9))
            else:
                eq = (a.isna() & b.isna()) | (a.astype(str) == b.astype(str))
            if not eq.all():
                i = int((~eq).idxmax())
                bad = f"VALUE MISMATCH col={c} row={i} spark={a[i]!r} oracle={b[i]!r} ({int((~eq).sum())} bad)"
                break
        results[name] = bad or f"OK ({len(sdf)} rows)"
    except Exception as e:
        results[name] = f"ORACLE ERROR: {e}"

fails = 0
for k, v in sorted(results.items()):
    status = "PASS" if v.startswith(("OK", "rows-only")) else "FAIL"
    if status == "FAIL":
        fails += 1
    print(f"{status:4} {k:22} {v}")
print(f"\n{len(results) - fails}/{len(results)} pass")
# optional JSON artifact (CORRECTNESS_*.json shape): --json <path>
if "--json" in sys.argv:
    out = sys.argv[sys.argv.index("--json") + 1]
    with open(out, "w") as f:
        json.dump({"sf_dir": sfdir, "n": len(results), "pass": len(results) - fails,
                   "queries": results}, f, indent=1, sort_keys=True)
sys.exit(1 if fails else 0)
