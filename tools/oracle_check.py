#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare.

Usage: oracle_check.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: load Spark's parquet result, run the
matching oracle SQL from oracle_sql.json in DuckDB (tables = views over the
sfDir parquet), sort columns by name, compare row-by-row. Floats compare BIT-EXACT
(struct.pack('<d', ...) byte patterns) to mimic the driver's hash — the r9
round proved a tolerance/repr compare here passes queries the driver fails
(q_deming, q_classifier_eval differed in the last ulp of a round(x,6) double).
Pass --tolerant to restore the old 1e-9-relative compare for debugging.
"""
import json
import math
import struct
import sys

BIT_EXACT = "--tolerant" not in sys.argv

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            df[c] = s.map(lambda v: str(v) if v is not None else None)
        elif "datetime" in str(s.dtype):
            df[c] = s.astype("datetime64[us]").map(lambda v: str(v))
        elif "float" in str(s.dtype):
            df[c] = s.map(lambda v: None if pd.isna(v) else float(v))
        else:
            try:
                df[c] = s.astype("Int64")
            except (TypeError, ValueError):
                pass
    return df.reset_index(drop=True)


def eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        if BIT_EXACT:
            # Driver-faithful: the driver hashes the raw value, so two doubles
            # that differ in the last ulp (or -0.0 vs 0.0) are a FAIL.
            return struct.pack("<d", a) == struct.pack("<d", b)
        return a == b or abs(a - b) < 1e-9 * max(1.0, abs(a), abs(b))
    if (a is None) != (b is None):
        return False
    if pd.isna(a) and pd.isna(b):
        return True
    return a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    import os

    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        spark_df = norm(pd.read_parquet(qdir))
        if name not in oracles:
            print(f"{name}: NO-ORACLE rows={len(spark_df)}")
            continue
        try:
            duck_df = norm(con.execute(oracles[name]).fetchdf())
        except Exception as e:
            print(f"{name}: ORACLE-SQL-ERROR {e}")
            n_fail += 1
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"{name}: SCHEMA-MISMATCH spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
            n_fail += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"{name}: ROWCOUNT-MISMATCH spark={len(spark_df)} duck={len(duck_df)}")
            n_fail += 1
            continue
        bad = None
        for i in range(len(spark_df)):
            for c in spark_df.columns:
                a, b = spark_df.at[i, c], duck_df.at[i, c]
                if not eq(a, b):
                    bad = (i, c, a, b)
                    break
            if bad:
                break
        if bad:
            print(f"{name}: VALUE-MISMATCH row={bad[0]} col={bad[1]} spark={bad[2]!r} duck={bad[3]!r}")
            n_fail += 1
        else:
            print(f"{name}: OK rows={len(spark_df)}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--tolerant"]
    sys.exit(main(args[0], args[1]))
