#!/usr/bin/env python3
"""Local pre-check mimicking the driver's correctness gate:
run graft.Verify (done separately via sbt), then compare each query's
parquet dump against the DuckDB oracle SQL over the same sf dir.

Usage: python3 scripts/check.py <sfDir> <outDir> [query ...]
Set CHECK_JSON=<path> to also write a CORRECTNESS-style per-query JSON.
"""
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = s.astype("datetime64[us]")
        if pd.api.types.is_integer_dtype(s):
            s = s.astype("float64") if s.isna().any() else s.astype("int64")
        out[c] = s
    return pd.DataFrame(out)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata ships single files; ScaleGen writes Spark-style
        # directories — glob the parts in that case
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    results = {}

    def record(name, rows_match, schema_match, hash_match,
               spark_rows, oracle_rows, err):
        results[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": spark_rows,
            "oracle_rows": oracle_rows, "err": err}

    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            expected = norm(con.sql(sql).df())
            actual = norm(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: load error: {e}")
            record(name, None, None, None, None, None, f"load error: {e}")
            n_fail += 1
            continue
        if list(expected.columns) != list(actual.columns):
            print(f"FAIL {name}: columns {list(actual.columns)} != "
                  f"{list(expected.columns)}")
            record(name, len(expected) == len(actual), False, False,
                   len(actual), len(expected), "schema mismatch")
            n_fail += 1
            continue
        if len(expected) != len(actual):
            print(f"FAIL {name}: rows {len(actual)} != {len(expected)}")
            record(name, False, True, False,
                   len(actual), len(expected), "row count mismatch")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(
                actual.reset_index(drop=True),
                expected.reset_index(drop=True),
                check_dtype=True, check_exact=True)
            print(f"PASS {name} ({len(actual)} rows)")
            record(name, True, True, True, len(actual), len(expected), None)
            n_pass += 1
        except AssertionError as e:
            print(f"FAIL {name}: {str(e).splitlines()[-1][:300]}")
            record(name, True, True, False,
                   len(actual), len(expected), "value mismatch")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail "
          f"({len(oracle)} oracled of {len(oracle)} checked)")
    json_out = os.environ.get("CHECK_JSON")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=2, sort_keys=True)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
