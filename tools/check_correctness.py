#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: run DuckDB oracle SQL against
the testdata tables and compare with the parquet dumped by graft.Verify.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    # driver sorts columns by name before hashing values
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = duckdb.connect().execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            failures += 1
            continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {str(e)[:200]}")
            failures += 1
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            failures += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            failures += 1
            continue
        mismatch = []
        for c in g.columns:
            a, b = g[c], e[c]
            try:
                eq = (a.values == b.values) | (a.isna().values & b.isna().values)
            except Exception:
                eq = a.astype(str).values == b.astype(str).values
            if not eq.all():
                bad = (~eq).nonzero()[0][:3]
                mismatch.append(
                    (c, [(int(i), a.iloc[i], b.iloc[i]) for i in bad]))
        # dtype check (schema-ish)
        dt = [(c, str(g[c].dtype), str(e[c].dtype)) for c in g.columns
              if str(g[c].dtype) != str(e[c].dtype)]
        if mismatch:
            print(f"FAIL {name}: value mismatch {mismatch}")
            failures += 1
        elif dt:
            print(f"WARN {name}: dtype diff {dt} (values match)")
            print(f"PASS {name} ({len(g)} rows)")
        else:
            print(f"PASS {name} ({len(g)} rows)")
    print(f"\n{len(oracle) - failures}/{len(oracle)} oracle queries pass")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
