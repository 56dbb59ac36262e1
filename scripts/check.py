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


INT_TYPES = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT", "UHUGEINT"}
FLOAT_TYPES = {"FLOAT", "DOUBLE"}


def _digest_cast(col, s_t, o_t):
    """Per-side cast pair making (spark_type, oracle_type) hash-comparable.

    Digest mode hashes a canonical VARCHAR row image computed by DuckDB on
    BOTH sides, so the only normalization needed is across *declared* type
    pairs (Spark parquet physical type vs the oracle query's result type) —
    the VALUE formatting is one engine's and cancels out. Pairs outside
    this table are a schema mismatch, reported as such.
    """
    def both(t):
        return (f'CAST("{col}" AS {t})',) * 2
    if s_t == o_t:
        return (f'"{col}"', f'"{col}"')
    if s_t in INT_TYPES and o_t in INT_TYPES:
        return both("HUGEINT")
    if s_t in FLOAT_TYPES and o_t in FLOAT_TYPES:
        return both("DOUBLE")
    ts_family = lambda t: t == "DATE" or t.startswith("TIMESTAMP")
    if ts_family(s_t) and ts_family(o_t):
        return both("TIMESTAMP")
    if s_t.startswith("DECIMAL") and (o_t.startswith("DECIMAL") or o_t in INT_TYPES) \
            or o_t.startswith("DECIMAL") and s_t in INT_TYPES:
        import re
        scales = [int(m.group(1)) for t in (s_t, o_t)
                  for m in [re.search(r",(\d+)\)", t)] if m]
        return both(f"DECIMAL(38,{max(scales) if scales else 0})")
    return None


def digest_compare(con, out_dir, name, oracle_sql):
    """Order-independent full-content compare for outputs beyond the pandas
    row-compare envelope: count(*) + sum(hash(canonical row string)), both
    sides computed BY DUCKDB (the Spark side from its parquet dump, the
    oracle side from the oracle query), so no cross-engine value-formatting
    surface is introduced. A single differing/extra/missing row flips the
    sum with probability 1 - 2^-64. Returns the rec(...) tuple fields."""
    spark_src = f"read_parquet('{out_dir}/{name}/*.parquet')"
    s_desc = con.execute(f"DESCRIBE SELECT * FROM {spark_src}").fetchall()
    o_desc = con.execute(f"DESCRIBE ({oracle_sql})").fetchall()
    s_types = {r[0]: r[1] for r in s_desc}
    o_types = {r[0]: r[1] for r in o_desc}
    if sorted(s_types) != sorted(o_types):
        print(f"SCHEMA  {name}: spark={sorted(s_types)} oracle={sorted(o_types)}")
        return (None, False, False, None, None, None)
    s_exprs, o_exprs = [], []
    for col in sorted(s_types):
        pair = _digest_cast(col, s_types[col], o_types[col])
        if pair is None:
            print(f"SCHEMA  {name}: column '{col}' type mismatch "
                  f"spark={s_types[col]} oracle={o_types[col]} "
                  f"(no digest promotion rule)")
            return (None, False, False, None, None, None)
        s_exprs.append(pair[0])
        o_exprs.append(pair[1])

    def digest(src, exprs):
        # each cell is SELF-DELIMITING (ADVICE r10): under the old plain
        # concat_ws(chr(31), ...) image, a value containing the separator
        # could realign the row — ('a\x1f','b') hashed identically to
        # ('a','\x1fb') — so a spark/oracle diff on text columns could in
        # principle hash-cancel. 'N' marks NULL (distinct from any value,
        # including a literal chr(30)); values carry a length prefix, so
        # no character of the payload can act as a delimiter.
        cells = ", ".join(
            f"CASE WHEN CAST({e} AS VARCHAR) IS NULL THEN 'N' "
            f"ELSE concat('V', CAST(length(CAST({e} AS VARCHAR)) AS VARCHAR),"
            f" ':', CAST({e} AS VARCHAR)) END"
            for e in exprs)
        row = con.execute(
            f"SELECT CAST(count(*) AS HUGEINT),"
            f" CAST(coalesce(sum(hash(concat_ws(chr(31), {cells}))), 0) AS HUGEINT)"
            f" FROM (SELECT * FROM {src})").fetchone()
        return int(row[0]), int(row[1])

    s_n, s_h = digest(spark_src, s_exprs)
    o_n, o_h = digest(f"({oracle_sql})", o_exprs)
    rows_m, hash_m = s_n == o_n, (s_n, s_h) == (o_n, o_h)
    if not rows_m:
        print(f"ROWS    {name}: spark={s_n} oracle={o_n} (digest mode)")
    elif not hash_m:
        print(f"HASH    {name}: digest mismatch over {s_n} rows "
              f"(spark {s_h} vs oracle {o_h})")
    return (rows_m, True, hash_m, s_n, o_n, None)


def main():
    import json
    import os
    args = sys.argv[1:]
    json_out = None
    digest_names = set()
    if "--digest" in args:
        i = args.index("--digest")
        if i + 1 >= len(args):
            print("usage: check.py <outDir> <sfDir> [--json FILE] "
                  "[--digest n1,n2] [name...]")
            sys.exit(2)
        digest_names = set(args[i + 1].split(","))
        args = args[:i] + args[i + 2:]
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
    unknown = (only | digest_names) - set(oracle)
    if unknown:
        print(f"UNKNOWN filter names (not in oracle_sql.json): {sorted(unknown)}")
        sys.exit(2)
    n_ok = n_bad = 0
    results = {}

    def rec(name, rows_m, schema_m, hash_m, s_rows, o_rows, err, mode="rows"):
        results[name] = {"rows_match": rows_m, "schema_match": schema_m,
                         "hash_match": hash_m, "spark_rows": s_rows,
                         "oracle_rows": o_rows, "err": err, "mode": mode}

    import time
    for name in sorted(oracle):
        if only and name not in only:
            continue
        t0 = time.time()
        if name in digest_names:
            try:
                rows_m, schema_m, hash_m, s_n, o_n, err = \
                    digest_compare(con, out_dir, name, oracle[name])
            except Exception as e:
                print(f"DIGERR  {name}: {e}")
                rec(name, False, False, False, None, None,
                    f"digest error: {e}", mode="digest")
                n_bad += 1
                continue
            rec(name, rows_m, schema_m, hash_m, s_n, o_n, err, mode="digest")
            if hash_m:
                n_ok += 1
            else:
                n_bad += 1
            dt = time.time() - t0
            if dt > 30:
                print(f"SLOW    {name}: digest compare took {dt:.0f}s")
            continue
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
