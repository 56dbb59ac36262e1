#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare (dev tool only; the
shipped engine is pure Scala/Spark — this is for pre-verifying the
correctness gate while iterating).

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    # Driver sorts columns by name before hashing values.
    df = df[sorted(df.columns)]
    # Canonical rendering: timestamps to UTC-naive ISO strings, floats kept
    # as repr (both engines computed in double and rounded already).
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = s.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        out[c] = s
    return pd.DataFrame(out)


def render(df: pd.DataFrame) -> str:
    return "\n".join(
        "|".join("\\N" if pd.isna(v) else str(v) for v in row)
        for row in df.itertuples(index=False)
    )


def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output missing ({e})")
            n_fail += 1
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        g, x = norm(got), norm(exp)
        if list(g.columns) != list(x.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(x.columns)}")
            n_fail += 1
            continue
        if len(g) != len(x):
            print(f"FAIL {name}: rows {len(g)} != {len(x)}")
            n_fail += 1
            continue
        rg, rx = render(g), render(x)
        if rg != rx:
            n_fail += 1
            # show first differing line
            for i, (a, b) in enumerate(zip(rg.split("\n"), rx.split("\n"))):
                if a != b:
                    print(f"FAIL {name}: first diff row {i}:\n  spark: {a}\n  duck : {b}")
                    break
            continue
        # dtype check (schema-match component of the gate)
        dg = [str(got[c].dtype) for c in sorted(got.columns)]
        dx = [str(exp[c].dtype) for c in sorted(exp.columns)]
        flag = "" if dg == dx else f"  [dtype diff: {list(zip(sorted(got.columns), dg, dx))}]"
        print(f"PASS {name} ({len(g)} rows){flag}")
        n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
