#!/usr/bin/env python3
"""Local simulation of the driver's t2 correctness gate.

Runs DuckDB oracle SQL (from Verify's oracle_sql.json) against the same
parquet tables and compares with the Spark results Verify dumped.
Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import glob
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) == 0:
        return df.reset_index(drop=True)
    # stringify for stable sort across dtypes
    key = df.astype(str).apply(lambda r: "\x00".join(r), axis=1)
    df = df.iloc[key.argsort(kind="mergesort")].reset_index(drop=True)
    return df


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) != pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb):
                return True
            return fa == fb  # EXACT — we want bit-parity
        except (TypeError, ValueError):
            return False
    return str(a) == str(b)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        sql = oracle[name]
        spark_path = f"{out_dir}/{name}"
        if not glob.glob(f"{spark_path}/*.parquet"):
            print(f"[MISS] {name}: no spark output")
            n_bad += 1
            continue
        try:
            got = canon(con.execute(
                f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").df())
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"[ERR ] {name}: {str(e).splitlines()[0][:200]}")
            n_bad += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"[COLS] {name}: spark={list(got.columns)} oracle={list(want.columns)}")
            n_bad += 1
            continue
        if len(got) != len(want):
            print(f"[ROWS] {name}: spark={len(got)} oracle={len(want)}")
            n_bad += 1
            continue
        bad = None
        for c in got.columns:
            for i, (x, y) in enumerate(zip(got[c], want[c])):
                if not values_equal(x, y):
                    bad = (c, i, x, y)
                    break
            if bad:
                break
        if bad:
            c, i, x, y = bad
            print(f"[VAL ] {name}: col={c} row={i} spark={x!r} oracle={y!r}")
            n_bad += 1
        else:
            print(f"[ OK ] {name}: {len(got)} rows")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
