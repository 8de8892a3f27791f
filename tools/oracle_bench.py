#!/usr/bin/env python3
"""Time the DuckDB oracle over the gated queries and emit ORACLE_BENCH.json.

The bench gate compares the Spark engine against the DuckDB oracle running
the identical SQL on the identical parquet files; this script produces the
oracle side as a machine-readable artifact so graft.Bench can self-report
the ratio in its own JSON line (instead of the judge cross-referencing
SCALING notes).

Usage:
  python3 tools/oracle_bench.py <sf_dir> <oracle_sql.json> [out.json]

<oracle_sql.json> is the dump graft.Verify writes (tools/check.py runs it);
default output is ORACLE_BENCH.json in the repo root. Each query is timed
as min-of-3 on a quiet machine (the same discipline as the scaling notes).
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir = sys.argv[1]
    sql_path = sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else "ORACLE_BENCH.json"
    with open(sql_path) as f:
        oracle_sql = json.load(f)
    con = duckdb.connect()
    # explicit limit: the default auto-detected budget mis-accounts the
    # list-heavy k-means replays (q92) and dies on a 256 KB allocation
    # with >100 GB free; a fixed generous limit is stable
    con.execute("SET memory_limit='48GB'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    queries = {}
    for name in sorted(oracle_sql):
        sql = oracle_sql[name]
        best = None
        for _ in range(3):
            t0 = time.monotonic()
            con.execute(sql).fetchall()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        queries[name] = round(best, 6)
        print(f"{name}: {best:.3f}s", file=sys.stderr)
    out = {"sf": sf_dir, "engine": "duckdb",
           "total_s": round(sum(queries.values()), 6), "queries": queries}
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({"sf": sf_dir, "total_s": out["total_s"]}))


if __name__ == "__main__":
    main()
