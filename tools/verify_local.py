#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python tools/verify_local.py <sfDir> <outDir> [query ...]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already produced
<outDir>/<name>/ parquet dirs and <outDir>/oracle_sql.json. Registers each
testdata parquet as a DuckDB view named after the table, runs every oracle
SQL, and compares against the Spark result exactly (schema names + values,
row order respected).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            want = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_fail += 1
            continue
        wcols, gcols = sorted(want.column_names), sorted(got.column_names)
        if wcols != gcols:
            print(f"FAIL {name}: columns differ\n  oracle: {wcols}\n  spark:  {gcols}")
            n_fail += 1
            continue
        if want.num_rows != got.num_rows:
            print(f"FAIL {name}: rows {want.num_rows} (oracle) vs {got.num_rows} (spark)")
            n_fail += 1
            continue
        wrows = [tuple(norm(row[c]) for c in wcols) for row in want.to_pylist()]
        grows = [tuple(norm(row[c]) for c in wcols) for row in got.to_pylist()]
        if wrows == grows:
            print(f"PASS {name} ({want.num_rows} rows)")
            n_pass += 1
            continue
        # row-order-insensitive fallback (driver may sort before hashing)
        if sorted(map(repr, wrows)) == sorted(map(repr, grows)):
            print(f"PASS* {name} ({want.num_rows} rows; order differs)")
            n_pass += 1
            continue
        bad = [(i, w, g) for i, (w, g) in enumerate(zip(wrows, grows)) if w != g][:3]
        print(f"FAIL {name}: {len([1 for w, g in zip(wrows, grows) if w != g])} mismatched rows, first:")
        for i, w, g in bad:
            print(f"  row {i}:\n    oracle: {w}\n    spark:  {g}")
        n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
