#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`: loads each query's
parquet result, runs its oracle SQL in DuckDB over the same fixture tables,
sorts columns by name and rows by all columns, and compares values EXACTLY —
no float tolerance, deliberately mirroring the driver's hash compare (a
rounding-boundary miss here would also miss there). Queries without an
oracle pass as "rows-only" only when they return rows: the driver's gate is
rows > 0, so an empty rows-only result fails the exit code.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]
"""
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if bool(pd.isna(a)) != bool(pd.isna(b)):
            return False
    except (TypeError, ValueError):
        pass
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        return list(a) == list(b)
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sf_dir}/{t}.parquet'")

    results = {}
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    # a declared oracle without a result dir means the query never ran
    # (stale compile / runtime failure) — surface it instead of silently
    # checking a smaller set
    for missing in sorted(set(oracles) - set(names)):
        if not only or missing in only:
            results[missing] = "MISSING-RESULT (query did not run)"
    for name in names:
        if only and name not in only:
            continue
        try:
            spark_df = pd.read_parquet(os.path.join(out_dir, name))
        except Exception as e:
            results[name] = f"SPARK-READ-FAIL {e}"
            continue
        if name not in oracles:
            results[name] = f"rows-only ({len(spark_df)} rows)" + \
                (" EMPTY!" if len(spark_df) == 0 else "")
            continue
        try:
            duck_df = con.execute(oracles[name]).df()
        except Exception as e:
            results[name] = f"ORACLE-FAIL {str(e)[:200]}"
            continue
        s, d = norm(spark_df), norm(duck_df)
        if list(s.columns) != list(d.columns):
            results[name] = f"COLS spark={list(s.columns)} duck={list(d.columns)}"
            continue
        if len(s) != len(d):
            results[name] = f"ROWS spark={len(s)} duck={len(d)}"
            continue
        # exact cell compare
        bad = []
        for ci, c in enumerate(s.columns):
            sv, dv = s[c].tolist(), d[c].tolist()
            for ri in range(len(sv)):
                if not cells_equal(sv[ri], dv[ri]):
                    bad.append((c, ri, sv[ri], dv[ri]))
                    if len(bad) >= 3:
                        break
            if len(bad) >= 3:
                break
        if bad:
            results[name] = "DIFF " + "; ".join(
                f"{c}[{ri}]: spark={sv!r} duck={dv!r}"
                for c, ri, sv, dv in bad)
        else:
            results[name] = f"OK ({len(s)} rows)"

    width = max(len(n) for n in results) if results else 10
    n_ok = sum(1 for v in results.values()
               if v.startswith("OK")
               or (v.startswith("rows-only") and "EMPTY" not in v))
    for name in sorted(results):
        print(f"{name:<{width}}  {results[name]}")
    print(f"\n{n_ok}/{len(results)} passing")
    sys.exit(0 if n_ok == len(results) else 1)


if __name__ == "__main__":
    main()
