#!/usr/bin/env python3
"""Local pre-check mimicking the driver's correctness gate:
run graft.Verify (done separately via sbt), then compare each query's
parquet dump against the DuckDB oracle SQL over the same sf dir.

Usage: python3 scripts/check.py <sfDir> <outDir> [query ...]
Env knobs (all optional; defaults match the driver's sequential gate):
  CHECK_JSON=<path>      also write a CORRECTNESS-style per-query JSON
  CHECK_TIMEOUT_SEC=<n>  kill an oracle that runs longer (recorded as
                         err="oracle_timeout" instead of blocking the
                         whole gate — some oracles are brute-force by
                         design and quadratic at large SF)
  CHECK_WORKERS=<k>      run k oracle subprocesses concurrently
"""
import json
import multiprocessing as mp
import os
import sys

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


def connect(sf_dir):
    import duckdb
    import tempfile
    con = duckdb.connect()
    # unique spill dir per connection: concurrent workers sharing cwd's
    # .tmp corrupt each other's duckdb_temp_storage files
    con.execute(
        f"SET temp_directory='{tempfile.mkdtemp(prefix='graft_duckck_')}'")
    mem = os.environ.get("CHECK_DUCKDB_MEM")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
    thr = os.environ.get("CHECK_DUCKDB_THREADS")
    if thr:
        con.execute(f"SET threads TO {thr}")
    for t in TABLES:
        # driver testdata ships single files; ScaleGen writes Spark-style
        # directories — glob the parts in that case
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        sel = "*"
        if t == "events":
            # driver testdata stores ts as TIMESTAMP(NANOS) (DuckDB casts
            # natively); ScaleGen-written sf1 stores the same values as
            # BIGINT nanos (Spark reads NANOS as long) — mirror
            # Tables.events' `timestamp_micros(ts DIV 1000)` here
            cols = con.execute(f"DESCRIBE SELECT * FROM '{p}'").fetchall()
            ts_type = next(c[1] for c in cols if c[0] == "ts")
            if ts_type == "BIGINT":
                sel = "* REPLACE (make_timestamp(ts // 1000) AS ts)"
        con.execute(f"CREATE VIEW {t} AS SELECT {sel} FROM '{p}'")
    return con


def check_one(sf_dir, out_dir, name, sql):
    """One query's compare; returns (record_dict, log_line)."""
    def rec(rows_match, schema_match, hash_match, spark_rows, oracle_rows,
            err):
        return {"rows_match": rows_match, "schema_match": schema_match,
                "hash_match": hash_match, "spark_rows": spark_rows,
                "oracle_rows": oracle_rows, "err": err}
    try:
        con = connect(sf_dir)  # keep alive: .df() materializes lazily
        expected = norm(con.sql(sql).df())
        actual = norm(pd.read_parquet(f"{out_dir}/{name}"))
    except Exception as e:
        return (rec(None, None, None, None, None, f"load error: {e}"),
                f"FAIL {name}: load error: {e}")
    if list(expected.columns) != list(actual.columns):
        return (rec(len(expected) == len(actual), False, False,
                    len(actual), len(expected), "schema mismatch"),
                f"FAIL {name}: columns {list(actual.columns)} != "
                f"{list(expected.columns)}")
    if len(expected) != len(actual):
        return (rec(False, True, False, len(actual), len(expected),
                    "row count mismatch"),
                f"FAIL {name}: rows {len(actual)} != {len(expected)}")
    try:
        pd.testing.assert_frame_equal(
            actual.reset_index(drop=True),
            expected.reset_index(drop=True),
            check_dtype=True, check_exact=True)
        return (rec(True, True, True, len(actual), len(expected), None),
                f"PASS {name} ({len(actual)} rows)")
    except AssertionError as e:
        return (rec(True, True, False, len(actual), len(expected),
                    "value mismatch"),
                f"FAIL {name}: {str(e).splitlines()[-1][:300]}")


def _worker(q, sf_dir, out_dir, name, sql):
    q.put((name,) + check_one(sf_dir, out_dir, name, sql))


def run_subprocess(jobs, timeout, workers):
    """Each query in its own process: a runaway oracle is terminated at
    `timeout` seconds and recorded, instead of wedging the gate."""
    results = {}
    pending = list(jobs)
    running = []  # (proc, queue, name, deadline)
    import time
    while pending or running:
        while pending and len(running) < workers:
            name, sql, sf_dir, out_dir = pending.pop(0)
            q = mp.Queue()
            p = mp.Process(target=_worker,
                           args=(q, sf_dir, out_dir, name, sql))
            p.start()
            running.append((p, q, name,
                            time.monotonic() + timeout if timeout else None))
        time.sleep(0.2)
        still = []
        for p, q, name, deadline in running:
            if not p.is_alive():
                try:
                    got_name, record, line = q.get_nowait()
                    results[got_name] = record
                    print(line, flush=True)
                except Exception:
                    results[name] = {
                        "rows_match": None, "schema_match": None,
                        "hash_match": None, "spark_rows": None,
                        "oracle_rows": None, "err": "worker died"}
                    print(f"FAIL {name}: worker died", flush=True)
                p.join()
            elif deadline and time.monotonic() > deadline:
                p.terminate()
                p.join()
                results[name] = {
                    "rows_match": None, "schema_match": None,
                    "hash_match": None, "spark_rows": None,
                    "oracle_rows": None, "err": "oracle_timeout"}
                print(f"TIMEOUT {name} (> {timeout}s)", flush=True)
            else:
                still.append((p, q, name, deadline))
        running = still
    return results


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    todo = [(n, s) for n, s in sorted(oracle.items())
            if not only or n in only]
    timeout = int(os.environ.get("CHECK_TIMEOUT_SEC", "0"))
    workers = int(os.environ.get("CHECK_WORKERS", "1"))
    if timeout or workers > 1:
        results = run_subprocess(
            [(n, s, sf_dir, out_dir) for n, s in todo], timeout, workers)
    else:
        # the driver's sequential in-process path, byte-identical output
        results = {}
        for name, sql in todo:
            record, line = check_one(sf_dir, out_dir, name, sql)
            results[name] = record
            print(line, flush=True)
    n_pass = sum(1 for r in results.values() if r["hash_match"])
    n_fail = len(results) - n_pass
    print(f"\n{n_pass} pass, {n_fail} fail "
          f"({len(oracle)} oracled of {len(oracle)} checked)")
    json_out = os.environ.get("CHECK_JSON")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=2, sort_keys=True)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
