#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/diffcheck.py <sfDir> <verifyOutDir>

Registers each testdata parquet as a DuckDB view, runs every query in
oracle_sql.json, loads the corresponding Spark parquet dump, and
compares: row count, column names (sorted), and values (rows sorted by
all columns; exact for non-floats, both exact-hash and 1e-9-tolerance
reported for floats). This is a developer tool only — the engine itself
is pure Scala/Spark.

Besides the stdout report, writes <verifyOutDir>/correctness.json in
the driver's CORRECTNESS shape ({"rows_match","schema_match",
"hash_match","spark_rows","oracle_rows","err"} per query) so a
populated per-query artifact exists from the repo side regardless of
what the driver records (its r12/r13 artifacts were empty). Skipped
under --only/SPARK_GRAFT_ONLY — a subset run must never overwrite the
full-suite artifact.
"""
import json, sys, glob, os, time
import duckdb
import pandas as pd
import numpy as np

# Exponential-replay guard (the q201 lesson, round 14): a DuckDB CTE
# chain that violates the AS MATERIALIZED invariant re-expands ~3^k per
# unrolled round and blows the driver's oracle budget (q201 alone was
# 429 s of an 842 s replay at sf0.01; normal queries run ~0.1 s). Any
# single oracle query slower than this many seconds is a HARD failure
# here so the regression is caught before the driver runs. The limit
# sits ~6x above the slowest honest oracle (q263_holt 9.9 s) and ~7x
# below the q201 failure class, so host contention (2-3x) cannot trip
# it. Override via SPARK_GRAFT_ORACLE_TIME_LIMIT for slower hosts.
ORACLE_TIME_LIMIT = float(os.environ.get("SPARK_GRAFT_ORACLE_TIME_LIMIT", "60"))

sfdir, outdir = sys.argv[1], sys.argv[2]
# --only a,b,c (or SPARK_GRAFT_ONLY): check just that subset — for
# iterating on a new query with a partial Verify dump
only = None
if len(sys.argv) > 4 and sys.argv[3] == "--only":
    only = set(x.strip() for x in sys.argv[4].split(",") if x.strip())
elif os.environ.get("SPARK_GRAFT_ONLY"):
    only = set(x.strip() for x in os.environ["SPARK_GRAFT_ONLY"].split(",") if x.strip())
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
if only is not None:
    oracle = {k: v for k, v in oracle.items() if k in only}
fail = 0
report = {}
oracle_secs = {}
for name in sorted(oracle):
    sql = oracle[name]
    rec = {"rows_match": False, "schema_match": False, "hash_match": False,
           "spark_rows": None, "oracle_rows": None, "err": None}
    report[name] = rec
    try:
        t0 = time.monotonic()
        exp = con.sql(sql).df()
        oracle_secs[name] = time.monotonic() - t0
    except Exception as e:
        rec["err"] = f"oracle error: {e}"
        print(f"FAIL {name}: oracle error: {e}")
        fail += 1
        continue
    rec["oracle_s"] = round(oracle_secs[name], 3)
    if oracle_secs[name] > ORACLE_TIME_LIMIT:
        rec["err"] = (f"oracle replay took {oracle_secs[name]:.1f}s "
                      f"(limit {ORACLE_TIME_LIMIT:.0f}s) — likely an "
                      f"un-MATERIALIZED multiply-referenced CTE chain "
                      f"re-expanding exponentially (CLAUDE.md invariant)")
        print(f"FAIL {name}: {rec['err']}")
        fail += 1
        continue
    rec["oracle_rows"] = len(exp)
    try:
        got = con.sql(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()
    except Exception as e:
        rec["err"] = f"spark output missing: {e}"
        print(f"FAIL {name}: spark output missing: {e}")
        fail += 1
        continue
    rec["spark_rows"] = len(got)
    rec["rows_match"] = len(exp) == len(got)
    problems = []
    if sorted(exp.columns) != sorted(got.columns):
        problems.append(f"cols exp={sorted(exp.columns)} got={sorted(got.columns)}")
    elif len(exp) != len(got):
        problems.append(f"rows exp={len(exp)} got={len(got)}")
    else:
        cols = sorted(exp.columns)
        e = exp[cols].sort_values(cols).reset_index(drop=True)
        g = got[cols].sort_values(cols).reset_index(drop=True)
        for c in cols:
            ev, gv = e[c], g[c]
            if ev.dtype.kind == "f" or gv.dtype.kind == "f":
                ev = ev.astype(float); gv = gv.astype(float)
                both_nan = ev.isna() & gv.isna()
                diff = (ev - gv).abs()
                bad = ~both_nan & ~(diff <= 1e-9)
                exact = ((ev == gv) | both_nan).all()
                # the driver hashes BITS, not values: -0.0 != 0.0 there
                # even though numpy == calls them equal (the q148 driver
                # red row, round 8) — treat signbit mismatch as HARD
                sb = ~both_nan & (np.signbit(ev.values) != np.signbit(gv.values)) & (ev.values == gv.values)
                if bad.any():
                    problems.append(f"col {c}: {bad.sum()} values differ >1e-9 (max {diff[~both_nan].max()})")
                elif sb.any():
                    problems.append(f"col {c}: {sb.sum()} -0.0/0.0 signbit mismatches (driver hash breaks)")
                elif not exact:
                    problems.append(f"col {c}: tolerance-only match (max diff {diff[~both_nan].max():.2e}) [WARN]")
            else:
                if not ev.equals(gv):
                    neq = (ev.astype(str) != gv.astype(str))
                    problems.append(f"col {c}: {neq.sum()} mismatches, e.g. exp={ev[neq].head(2).tolist()} got={gv[neq].head(2).tolist()}")
        # dtype check — HARD failure: CLAUDE.md requires oracle dtypes
        # identical to the Spark output (the driver compares schemas)
        dt_e = {c: str(exp[c].dtype) for c in cols}
        dt_g = {c: str(got[c].dtype) for c in cols}
        if dt_e != dt_g:
            dd = {c: (dt_e[c], dt_g[c]) for c in cols if dt_e[c] != dt_g[c]}
            problems.append(f"dtypes differ: {dd}")
    hard = [p for p in problems if "[WARN]" not in p]
    # schema = columns + dtypes (the driver compares schemas); hash =
    # EXACT values — a tolerance-only float match is a driver-side hash
    # mismatch (it hashes double BITS), so WARN rows record hash_match
    # false even though diffcheck's exit code tolerates them
    rec["schema_match"] = sorted(exp.columns) == sorted(got.columns) and \
        not any(p.startswith("dtypes differ") for p in hard)
    rec["hash_match"] = not problems and rec["rows_match"] and rec["schema_match"]
    if problems:
        rec["err"] = "; ".join(problems)
    if hard:
        fail += 1
        print(f"FAIL {name}: " + "; ".join(problems))
    elif problems:
        print(f"WARN {name}: " + "; ".join(problems))
    else:
        print(f"OK   {name} ({len(exp)} rows)")
if oracle_secs:
    slow = sorted(oracle_secs.items(), key=lambda kv: -kv[1])[:5]
    print("slowest oracle replays: " +
          ", ".join(f"{k}={v:.2f}s" for k, v in slow) +
          f" (total {sum(oracle_secs.values()):.1f}s)")
if only is None:
    with open(f"{outdir}/correctness.json", "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(f"wrote {outdir}/correctness.json ({len(report)} queries)")
print(f"\n{len(oracle) - fail}/{len(oracle)} queries match")
sys.exit(1 if fail else 0)
