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
import os
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
        # driver testdata is one flat file per table; Sf1Gen output is a
        # Spark directory of part files — glob accordingly (as check.py)
        src = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(src):
            src = f"{src}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    # per-run wall budget: at sf1 one oracle replay (q92's unrolled
    # k-means) ran >35 min without completing ONCE — the replay SQL is
    # superlinear in DuckDB even where the engine side is not. A DNF is
    # recorded at the budget (an under-estimate of the true floor, i.e.
    # conservative for the Spark/oracle ratio) and listed in the
    # artifact so the number is never mistaken for a measurement.
    budget = float(os.environ.get("ORACLE_BENCH_BUDGET_S", "300"))

    def timed_once(sql, _retried=False):
        import threading
        done = threading.Event()

        def watchdog():
            # re-check right before firing: done.set() in the main
            # thread can land between wait() timing out and here
            if not done.wait(budget) and not done.is_set():
                con.interrupt()
        w = threading.Thread(target=watchdog, daemon=True)
        w.start()
        t0 = time.monotonic()
        try:
            try:
                con.execute(sql).fetchall()
                interrupted = False
            except duckdb.Error as e:
                if "interrupt" in str(e).lower() or isinstance(
                        e, getattr(duckdb, "InterruptException", ())):
                    interrupted = True
                else:
                    raise
            elapsed = time.monotonic() - t0
        finally:
            done.set()
            # join before the next execute: once joined, the watchdog
            # has either fired or never will — no interrupt can land
            # on the shared connection mid-way through a later query
            w.join()
        if interrupted and elapsed < budget * 0.5 and not _retried:
            # an interrupt well under the budget is a stale one left
            # pending by a previous query's watchdog losing the race
            # at the budget boundary — retry once, don't record a DNF
            print(f"stale interrupt after {elapsed:.3f}s, retrying",
                  file=sys.stderr)
            return timed_once(sql, _retried=True)
        return elapsed, interrupted

    queries = {}
    dnf = []
    for name in sorted(oracle_sql):
        sql = oracle_sql[name]
        best, hit = timed_once(sql)
        if hit:
            dnf.append(name)
        elif best < 5.0:
            # min-of-3 refines noise-dominated small numbers; a >5 s
            # query's first measurement is already signal, and tripling
            # a minutes-long replay buys nothing
            for _ in range(2):
                dt, h2 = timed_once(sql)
                if not h2:
                    best = min(best, dt)
        queries[name] = round(best, 6)
        print(f"{name}: {best:.3f}s{' DNF' if hit else ''}", file=sys.stderr)
    out = {"sf": sf_dir, "engine": "duckdb", "budget_s": budget,
           "dnf": dnf,
           "total_s": round(sum(queries.values()), 6), "queries": queries}
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({"sf": sf_dir, "total_s": out["total_s"]}))


if __name__ == "__main__":
    main()
