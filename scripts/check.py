#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 scripts/check.py <verify_out_dir> <sf_dir> [query_names...]

Driver-faithful emulation (learned from CORRECTNESS_r03 failures):
  - the SPARK side is read with pandas.read_parquet (pyarrow), the ORACLE
    side with duckdb ... .df() — so DTYPES matter. DuckDB count_if /
    sum(INTEGER) return HUGEINT which pandas renders as float64, and the
    driver then hashes "290.0" vs Spark's int64 "290" → mismatch even
    though the values are equal. Oracle SQL must CAST those to BIGINT.
  - rows are sorted with DataFrame.sort_values over all columns; a
    numpy.ndarray cell (any array-typed output column) is UNHASHABLE there
    and crashes the compare. Never emit arrays in oracle-checked queries.
  - floats appear to be rounded (to ~4) before hashing; ints are hashed
    as ints (no float widening), hence the dtype sensitivity above.
  - DATE vs midnight-TIMESTAMP compare equal (date_trunc differences).

This script reproduces those semantics: any FLAG it prints would also fail
(or crash) on the driver; a clean pass here has matched the driver so far.
"""
import datetime
import math
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def cell(v):
    """Normalize one cell the way the driver's hash effectively does."""
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, (np.ndarray, list, tuple)):
        raise TypeError("array-typed cell (driver crashes on these): %r" % (v,))
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, datetime.datetime) and v.time() == datetime.time(0, 0):
        v = v.date()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        v = round(v, 4)
        if v == 0:
            v = 0.0
    return repr(v)


def frame_rows(df):
    cols = sorted(df.columns)
    rows = []
    for r in df[cols].itertuples(index=False, name=None):
        rows.append(tuple(cell(v) for v in r))
    rows.sort()
    return cols, rows


def main():
    import json
    import os
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            print("usage: check.py <outDir> <sfDir> [--json FILE] [name...]")
            sys.exit(2)
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    if len(args) < 2 or args[0].startswith("-") or args[1].startswith("-"):
        print("usage: check.py <outDir> <sfDir> [--json FILE] [name...]")
        sys.exit(2)
    out_dir, sf_dir = args[0], args[1]
    con = duckdb.connect()
    for t in TABLES:
        # driver-generated SFs are single files; graft.tools.ScaleUp slices
        # are Spark directory layouts — glob those
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        if t == "events":
            # driver SFs carry parquet TIMESTAMP(NANOS) (DuckDB reads µs
            # TIMESTAMP); ScaleUp slices carry the raw ns BIGINT — normalize
            # to the same µs TIMESTAMP the Spark side (Tables.ts) produces
            row = con.execute("SELECT typeof(ts) FROM events LIMIT 1").fetchone()
            if row is None:
                sys.exit(f"events table at {p} is EMPTY — broken/partial slice?")
            if row[0] == "BIGINT":
                con.execute("DROP VIEW events")
                con.execute(
                    f"CREATE VIEW events AS SELECT * REPLACE"
                    f" (make_timestamp(ts // 1000) AS ts)"
                    f" FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    only = set(args[2:])
    # a typo'd or rows-only name must not silently produce "0 ok, 0 bad"
    unknown = only - set(oracle)
    if unknown:
        print(f"UNKNOWN filter names (not in oracle_sql.json): {sorted(unknown)}")
        sys.exit(2)
    n_ok = n_bad = 0
    results = {}

    def rec(name, rows_m, schema_m, hash_m, s_rows, o_rows, err):
        results[name] = {"rows_match": rows_m, "schema_match": schema_m,
                         "hash_match": hash_m, "spark_rows": s_rows,
                         "oracle_rows": o_rows, "err": err}

    import time
    for name in sorted(oracle):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            s_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"MISSING {name}: {e}")
            rec(name, False, False, False, None, None, f"spark output missing: {e}")
            n_bad += 1
            continue
        try:
            o_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"ORAERR  {name}: {e}")
            rec(name, False, False, False, len(s_df), None, f"oracle error: {e}")
            n_bad += 1
            continue
        try:
            sc, sr = frame_rows(s_df)
        except TypeError as e:
            print(f"ARRAY   {name} (spark side): {e}")
            rec(name, False, False, False, len(s_df), len(o_df), f"array cell spark side: {e}")
            n_bad += 1
            continue
        try:
            oc, orows = frame_rows(o_df)
        except TypeError as e:
            print(f"ARRAY   {name} (oracle side): {e}")
            rec(name, False, False, False, len(s_df), len(o_df), f"array cell oracle side: {e}")
            n_bad += 1
            continue
        if sc != oc:
            print(f"SCHEMA  {name}: spark={sc} oracle={oc}")
            rec(name, len(sr) == len(orows), False, False, len(sr), len(orows), None)
            n_bad += 1
        elif len(sr) != len(orows):
            print(f"ROWS    {name}: spark={len(sr)} oracle={len(orows)}")
            rec(name, False, True, False, len(sr), len(orows), None)
            n_bad += 1
        elif sr != orows:
            diff = next(i for i in range(len(sr)) if sr[i] != orows[i])
            print(f"HASH    {name}: first diff row {diff}:")
            print(f"        spark : {sr[diff]}")
            print(f"        oracle: {orows[diff]}")
            rec(name, True, True, False, len(sr), len(orows), None)
            n_bad += 1
        else:
            rec(name, True, True, True, len(sr), len(orows), None)
            n_ok += 1
        dt = time.time() - t0
        if dt > 30:
            print(f"SLOW    {name}: oracle+compare took {dt:.0f}s")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=2, sort_keys=True)
        print(f"wrote {json_out} ({len(results)} queries)")
    checked = len(only) if only else len(oracle)
    print(f"\n{n_ok} ok, {n_bad} bad ({checked} compared; "
          f"{len(oracle)} oracle-checked queries total)")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
