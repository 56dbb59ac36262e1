#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 scripts/check.py <verify_out_dir> <sf_dir>

Reads each <out>/<name>/ parquet dumped by graft.Verify, runs the matching
oracle SQL from <out>/oracle_sql.json in DuckDB over the sf parquet tables,
normalizes both sides (columns sorted by name, float columns rounded to 4,
rows sorted by all columns) and reports match/mismatch per query.
"""
import datetime
import duckdb
import glob
import json
import math
import sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if (isinstance(v, datetime.datetime)
                    and v.time() == datetime.time(0, 0)):
                # DuckDB date_trunc('day') yields DATE, Spark TIMESTAMP;
                # the driver's compare treats these as equal
                v = v.date()
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 4)
                    if v == 0:
                        v = 0.0  # -0.0 == 0.0
            vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    only = set(sys.argv[3:])
    n_ok = n_bad = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING {name}: no spark output")
            n_bad += 1
            continue
        try:
            sq = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            s_cols = [d[0] for d in sq.description]
            s_rows = sq.fetchall()
            oq = con.execute(oracle[name])
            o_cols = [d[0] for d in oq.description]
            o_rows = oq.fetchall()
        except Exception as e:
            print(f"ERROR   {name}: {e}")
            n_bad += 1
            continue
        sc, sr = normalize(s_rows, s_cols)
        oc, orows = normalize(o_rows, o_cols)
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
    print(f"\n{n_ok} ok, {n_bad} bad, "
          f"{len(oracle)} oracle-checked queries")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
