#!/usr/bin/env python3
"""Per-query oracle compare with a wall-clock cap per query.

Drives the same check as .claude/skills/verify/compare.py (hash compare
of the Verify parquet dump vs DuckDB executing oracle_sql.json on the
same tables), but isolates every query in its own subprocess under a
timeout, so one oracle whose DuckDB cost explodes at a large scale
factor (the all-pairs replays) caps out instead of wedging the sweep.

Usage:
  python3 tools/oracle_sweep.py <outDir> <sfDir> [timeout_s] [only_csv]

Writes <outDir>/sweep_results.json:
  {"name": {"status": "ok"|"fail"|"timeout"|"error", "secs": float,
            "rows": int|null}}
and prints one line per query. Exit 1 if any FAIL (timeouts are
reported separately — an oracle-cost cap, not a wrongness signal).
"""
import json
import os
import subprocess
import sys
import time

out = sys.argv[1]
sf = sys.argv[2]
cap = float(sys.argv[3]) if len(sys.argv) > 3 else 120.0
only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None

compare = os.path.join(os.path.dirname(__file__), "..",
                       ".claude", "skills", "verify", "compare.py")
oracle = json.load(open(f"{out}/oracle_sql.json"))
names = sorted(n for n in oracle if (only is None or n in only))

path = f"{out}/sweep_results.json"


def persist(res):
    """Write after every query: a sweep killed by the wall clock still
    leaves a complete record of everything it finished."""
    merged = dict(res)
    if only is not None and os.path.exists(path):
        prior = json.load(open(path))
        prior.update(merged)
        # prune keys no longer in the oracle registry: after a query
        # rename/removal a filtered re-run must not carry a stale entry
        # into the persisted artifact's "N ok of M" summary (ADVICE r13)
        merged = {k: v for k, v in prior.items() if k in oracle}
    with open(path, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    return merged


results = {}
fails = 0
for name in names:
    t0 = time.time()
    try:
        p = subprocess.run(
            [sys.executable, compare, out, sf, name],
            capture_output=True, text=True, timeout=cap)
        secs = round(time.time() - t0, 1)
        text = p.stdout
        if f"ok   {name}" in text:
            rows = int(text.split("(")[-1].split(" rows")[0])
            results[name] = {"status": "ok", "secs": secs, "rows": rows}
            print(f"ok      {name} ({rows} rows, {secs}s)", flush=True)
        elif f"FAIL {name}" in text:
            fails += 1
            results[name] = {"status": "fail", "secs": secs, "rows": None}
            print(f"FAIL    {name}: {text.strip().splitlines()[0]}",
                  flush=True)
        else:
            fails += 1
            results[name] = {"status": "error", "secs": secs, "rows": None,
                             "err": (p.stderr or text)[-300:]}
            print(f"ERROR   {name}: {(p.stderr or text)[-200:].strip()}",
                  flush=True)
    except subprocess.TimeoutExpired:
        results[name] = {"status": "timeout", "secs": cap, "rows": None}
        print(f"TIMEOUT {name} (> {cap}s oracle replay cap)", flush=True)
    # A filtered re-run (after an oracle fix) MERGES into the existing
    # results instead of clobbering the full sweep with its subset — the
    # persisted artifact stays one complete registry pass with the fixed
    # rows updated in place. A full (unfiltered) run still replaces
    # everything it swept.
    persist(results)

results = persist(results)
n_ok = sum(1 for r in results.values() if r["status"] == "ok")
n_to = sum(1 for r in results.values() if r["status"] == "timeout")
n_f = sum(1 for r in results.values()
          if r["status"] in ("fail", "error"))
print(f"SWEEP: {n_ok} ok / {n_f} fail / {n_to} timeout "
      f"of {len(results)} (this run: {len(names)})", flush=True)
sys.exit(1 if fails else 0)
