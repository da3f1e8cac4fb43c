#!/usr/bin/env python3
"""Oracle-SQL smoke replay (VERDICT r11 item #2).

Round 10 shipped a rewritten q143 oracle that could not EXECUTE on the
gate's DuckDB 1.0.0 (plain multiply-referenced CTEs are inlined; 24
label-propagation rounds tripled the plan each and exhausted the fd
limit), and the flagship correctness row was red for a whole round
because nothing in the loop ever ran generated oracle SQL. This tool is
that missing check: execute each entry of an oracle_sql.json on DuckDB
over the given fixture, under a per-query wall-clock cap, and exit
nonzero if any entry errors or times out. Pure execution check — value
comparison stays with compare.py / the driver's gate.

Usage: python3 tools/oracle_smoke.py <oracle_sql.json> <sfDir>
Env:   ORACLE_SMOKE_TIMEOUT_S  per-query cap (default 30)

Each query runs in its own subprocess so a planner blow-up (fd
exhaustion, OOM) can never take the smoke harness down with it.
Run as part of the round workflow before committing any oracle-SQL
change; OracleSmokeSpec wires the q143/q144/q87 generators into
`sbt test` with a teeth-check (simulated AS MATERIALIZED removal must
be caught).
"""
import json
import multiprocessing as mp
import os
import queue as queue_mod
import sys

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def _exec(sql, sf, out):
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written directory (scale fixtures)
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    out.put(len(con.execute(sql).fetchall()))


def main():
    sql_json, sf = sys.argv[1], sys.argv[2]
    timeout = float(os.environ.get("ORACLE_SMOKE_TIMEOUT_S", "30"))
    oracle = json.load(open(sql_json))
    failures = 0
    for name in sorted(oracle):
        out = mp.Queue()
        p = mp.Process(target=_exec, args=(oracle[name], sf, out))
        p.start()
        p.join(timeout)
        if p.is_alive():
            p.terminate()
            p.join()
            print(f"EXEC_TIMEOUT {name} (> {timeout}s)")
            failures += 1
        elif p.exitcode != 0:
            print(f"EXEC_FAIL {name} (exit={p.exitcode})")
            failures += 1
        else:
            # Queue.empty() is documented-unreliable right after join():
            # the child's feeder thread can still be flushing the pipe, so
            # a passing query could flake as EXEC_FAIL (ADVICE r12). Block
            # with a short timeout instead; only a true absence fails.
            try:
                rows = out.get(timeout=5)
                print(f"EXEC_OK {name} rows={rows}")
            except queue_mod.Empty:
                print(f"EXEC_FAIL {name} (exit=0, no result on queue)")
                failures += 1
    print("SMOKE_FAILURES:", failures)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
