#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify via sbt,
then execute each oracle SQL in DuckDB over the same parquet tables and
diff against the Spark parquet output (columns sorted by name, rows sorted,
exact value compare). Usage: python3 tools/check.py [sfDir] [outDir] [--skip-verify]
"""
import json
import math
import os
import subprocess
import sys

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

if "--skip-verify" not in sys.argv:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}'],
        cwd="/root/repo", capture_output=True, text=True)
    sys.stdout.write(r.stdout[-3000:])
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-3000:])
        sys.exit(1)

con = duckdb.connect()
for t in TABLES:
    # driver testdata is one flat file per table; Sf1Gen output is a
    # Spark directory of part files — glob accordingly
    src = f"{SF}/{t}.parquet"
    if os.path.isdir(src):
        src = f"{src}/*.parquet"
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        exp = con.sql(sql).df()
        got = pd.read_parquet(f"{OUT}/{name}")
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {e}")
        fails.append(name)
        continue
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    status, detail = "OK", ""
    if list(exp.columns) != list(got.columns):
        status, detail = "FAIL", f"cols exp={list(exp.columns)} got={list(got.columns)}"
    elif len(exp) != len(got):
        status, detail = "FAIL", f"rows exp={len(exp)} got={len(got)}"
    else:
        e2 = exp.sort_values(list(exp.columns)).reset_index(drop=True)
        g2 = got.sort_values(list(got.columns)).reset_index(drop=True)
        for c in exp.columns:
            ev, gv = e2[c], g2[c]
            if ev.dtype.kind == "f" or gv.dtype.kind == "f":
                ev = ev.astype(float); gv = gv.astype(float)
                bad = ~((ev == gv) | (ev.isna() & gv.isna()))
                if bad.any():
                    i = bad.idxmax()
                    status = "FAIL"
                    detail += (f" col {c}: {int(bad.sum())} diffs; first row {i}:"
                               f" exp={ev[i]!r} got={gv[i]!r} absdiff={abs(ev[i]-gv[i]) if not (math.isnan(ev[i]) or math.isnan(gv[i])) else 'nan'};")
            else:
                ev = ev.astype(str); gv = gv.astype(str)
                bad = ev != gv
                if bad.any():
                    i = bad.idxmax()
                    status = "FAIL"
                    detail += f" col {c}: {int(bad.sum())} diffs; first row {i}: exp={ev[i]!r} got={gv[i]!r};"
        # dtype drift (schema check analog) — strict: the driver's schema
        # compare may reject what a value-compare would tolerate
        for c in exp.columns:
            if exp[c].dtype != got[c].dtype:
                status = "FAIL"
                detail += f" [dtype {c}: exp={exp[c].dtype} got={got[c].dtype}]"
    print(f"{status} {name} ({len(exp)} rows){': ' + detail if detail else ''}")
    if status != "OK":
        fails.append(name)

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} oracle queries match", f"FAILED: {fails}" if fails else "")
sys.exit(1 if fails else 0)
