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
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    import json
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    only = set(sys.argv[3:])
    # a typo'd or rows-only name must not silently produce "0 ok, 0 bad"
    unknown = only - set(oracle)
    if unknown:
        print(f"UNKNOWN filter names (not in oracle_sql.json): {sorted(unknown)}")
        sys.exit(2)
    n_ok = n_bad = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        try:
            s_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"MISSING {name}: {e}")
            n_bad += 1
            continue
        try:
            o_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"ORAERR  {name}: {e}")
            n_bad += 1
            continue
        try:
            sc, sr = frame_rows(s_df)
        except TypeError as e:
            print(f"ARRAY   {name} (spark side): {e}")
            n_bad += 1
            continue
        try:
            oc, orows = frame_rows(o_df)
        except TypeError as e:
            print(f"ARRAY   {name} (oracle side): {e}")
            n_bad += 1
            continue
        if sc != oc:
            print(f"SCHEMA  {name}: spark={sc} oracle={oc}")
            n_bad += 1
        elif len(sr) != len(orows):
            print(f"ROWS    {name}: spark={len(sr)} oracle={len(orows)}")
            n_bad += 1
        elif sr != orows:
            diff = next(i for i in range(len(sr)) if sr[i] != orows[i])
            print(f"HASH    {name}: first diff row {diff}:")
            print(f"        spark : {sr[diff]}")
            print(f"        oracle: {orows[diff]}")
            n_bad += 1
        else:
            n_ok += 1
    checked = len(only) if only else len(oracle)
    print(f"\n{n_ok} ok, {n_bad} bad ({checked} compared; "
          f"{len(oracle)} oracle-checked queries total)")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
