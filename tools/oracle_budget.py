#!/usr/bin/env python3
"""Oracle-pass budget guard: time every DuckDB oracle in a Verify out
dir against an SF dir and FAIL if the total exceeds the budget.

Why this exists: the r11/r12 driver correctness artifacts came back
EMPTY because the driver-side DuckDB oracle pass silently blew its
budget (21 minutes at sf0.01 — two guarded-ER oracles were 90% of
it; VERDICT r12/r13 trail). The r13 rewrite cut the pass to ~109 s,
and r13's q233 reach-closure mirror was still 57.5 s of that — one
more expensive mirror could re-empty the artifact. This guard makes
the budget a CHECKED invariant of the round-close ritual instead of
a hope: run it after the sf0.01 sweep, before accepting the round.

Usage:
  python3 tools/oracle_budget.py <sf_dir> <verify_out_dir> [budget_s]

Exit 0 if total <= budget (default 90 s), 1 otherwise. Always prints
the slowest oracles so regressions surface even under budget.
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    budget = float(sys.argv[3]) if len(sys.argv) > 3 else 90.0
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS FROM read_parquet('{sf_dir}/{t}.parquet')")
    times = {}
    t_all = time.time()
    for name, sql in sorted(oracles.items()):
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
        except Exception as ex:  # a broken oracle is its own failure
            print(f"ERROR {name}: {ex}")
            return 1
        times[name] = time.time() - t0
    total = time.time() - t_all
    print(f"total {total:.1f}s over {len(times)} oracles "
          f"(budget {budget:.0f}s)")
    for name, t in sorted(times.items(), key=lambda kv: -kv[1])[:10]:
        print(f"  {t:6.2f}s  {name}")
    if total > budget:
        print(f"FAIL: oracle pass {total:.1f}s exceeds {budget:.0f}s — "
              "shrink the offending mirror (MATERIALIZED CTEs, O(1) "
              "recursion state, bounded universe) before round close; "
              "this is the r11/r12 empty-artifact failure class")
        return 1
    print("PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
