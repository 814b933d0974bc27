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

A float-dtype-vs-integer-dtype mismatch between the Spark and oracle frames
is a FAIL even when the numeric values agree: the driver hashes the fetched
values, so DuckDB rendering a HUGEINT column as float64 (0.0) against
Spark's BIGINT (0) hash-mismatches — exactly the q_classifier_eval r10
break that the old numeric == compare waved through.
"""
import argparse
import json
import math
import struct
import sys

import duckdb
import pandas as pd

_parser = argparse.ArgumentParser(description=__doc__)
_parser.add_argument("sf_dir")
_parser.add_argument("out_dir")
_parser.add_argument("--tolerant", action="store_true",
                     help="1e-9-relative float compare instead of bit-exact")
_ARGS = _parser.parse_args() if __name__ == "__main__" else None
BIT_EXACT = not (_ARGS and _ARGS.tolerant)

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            df[c] = s.map(lambda v: str(v) if v is not None else None)
        elif "datetime" in str(s.dtype):
            df[c] = s.astype("datetime64[us]").map(lambda v: str(v))
        elif "float" in str(s.dtype).lower():
            # Nullable-int canonicalization (r12, ADVICE): pandas and duckdb
            # promote BIGINT-with-NULLs to float64 OR nullable Int64
            # depending on version/backend — an asymmetric promotion would
            # trip the dtype gate spuriously and push NULLs into NaN
            # bit-pattern comparison. A float column that has at least one
            # null and is integral at every non-null value is canonicalized
            # to Int64-with-mask on BOTH sides. The rule is purely
            # content-determined, so it can only classify the two sides
            # differently when their values already differ (one side
            # non-integral) — which is a genuine mismatch regardless.
            nn = s.dropna()
            integral = len(nn) == 0 or (
                nn.map(lambda v: float(v).is_integer()).all()
                and float(nn.abs().max()) < 2.0**63)
            if len(nn) < len(s) and integral:
                df[c] = s.astype("Int64")
            else:
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
    # positional null compare: None (object cols), pd.NA (Int64 cols) and
    # NaN (float cols, handled above for float/float) all count as null —
    # a null only ever equals a null, never a value
    a_na = a is None or (not isinstance(a, str) and pd.isna(a))
    b_na = b is None or (not isinstance(b, str) and pd.isna(b))
    if a_na or b_na:
        return a_na and b_na
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
        # Driver-faithful dtype gate: one side float, the other integer →
        # the driver's hash of the fetched values differs even when the
        # numbers agree (HUGEINT→float64 coercion class).
        dtype_bad = None
        for c in spark_df.columns:
            sk, dk = str(spark_df[c].dtype).lower(), str(duck_df[c].dtype).lower()
            s_num = "float" in sk or "int" in sk
            d_num = "float" in dk or "int" in dk
            if s_num and d_num and ("float" in sk) != ("float" in dk):
                dtype_bad = (c, sk, dk)
                break
        if dtype_bad:
            print(f"{name}: DTYPE-MISMATCH col={dtype_bad[0]} "
                  f"spark={dtype_bad[1]} duck={dtype_bad[2]}")
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
    sys.exit(main(_ARGS.sf_dir, _ARGS.out_dir))
