#!/usr/bin/env python3
"""DuckDB side of the amortized-scale bench (BASELINE.md).

Times the headline queries' oracle SQL in DuckDB over the same parquet
files graft.Bench reads, warm best-of-N, and prints one JSON line in the
Bench format so the two engines' numbers line up column-for-column.

Usage: python3 tools/duck_bench.py <sfDir> <oracle_sql.json> [runs=3]

<sfDir> may hold single-file fixtures (t.parquet) or directory fixtures
written by graft.InflateFixtures (t.parquet/*.parquet) — both register.
"""
import json
import os
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    with open(oracle_path) as f:
        oracles = json.load(f)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet({src})")

    # time exactly the oracle set the caller passed (graft.Bench filters
    # it to ITS headline list) — a second hardcoded list here silently
    # desynced once (q26 vs q26b), dropping a query from the DuckDB total
    queries, total = {}, 0.0
    for name in sorted(oracles):
        sql = oracles[name]
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        queries[name] = round(best, 4)
        total += best
    print(json.dumps({"metric": "duckdb_total", "value": round(total, 3),
                      "unit": "sec", "runs": runs, "agg": "min",
                      "queries": queries, "sf": sf_dir}))


if __name__ == "__main__":
    main()
