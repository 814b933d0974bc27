#!/usr/bin/env python3
"""Static HUGEINT / float-vs-int readout audit over every oracle (VERDICT r10 task 3).

Binds (does not execute) each oracle in oracle_sql.json against DuckDB views
over the sfDir parquet and inspects the relation's bound output types:

  * any HUGEINT column is flagged — the driver's DuckDB fetch renders
    HUGEINT as float64, which hash-mismatches Spark's BIGINT even when the
    values agree (the q_classifier_eval r10 break);
  * if the matching Spark result dump exists under verifyOutDir, a
    float-on-one-side / integer-on-the-other column is flagged the same way.

Usage: type_sweep.py <sfDir> <oracle_sql.json> [verifyOutDir]
Exit 1 if anything is flagged.
"""
import json
import os
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

INT_TYPES = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT",
             "USMALLINT", "UINTEGER", "UBIGINT"}
FLOAT_TYPES = {"FLOAT", "DOUBLE"}


def spark_dtypes(qdir):
    try:
        import pyarrow.parquet as pq
    except ImportError:
        return None
    files = [f for f in os.listdir(qdir) if f.endswith(".parquet")]
    if not files:
        return None
    schema = pq.read_schema(os.path.join(qdir, files[0]))
    return {schema.field(i).name: str(schema.field(i).type) for i in range(len(schema))}


def main(sf_dir, oracle_json, out_dir=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(oracle_json))
    flagged = 0
    for name in sorted(oracles):
        sql = oracles[name].replace("__SF_DIR__", os.path.abspath(sf_dir))
        try:
            rel = con.sql(sql)
            cols = list(zip(rel.columns, [str(t).upper() for t in rel.types]))
        except Exception as e:
            print(f"{name}: BIND-ERROR {str(e).splitlines()[0]}")
            flagged += 1
            continue
        huge = [c for c, t in cols if t == "HUGEINT"]
        if huge:
            print(f"{name}: HUGEINT cols={huge}")
            flagged += 1
            continue
        if out_dir:
            qdir = os.path.join(out_dir, name)
            if os.path.isdir(qdir):
                sp = spark_dtypes(qdir)
                if sp:
                    bad = []
                    for c, t in cols:
                        st = sp.get(c, "").lower()
                        s_f, s_i = "float" in st or st == "double", "int" in st
                        d_f, d_i = t in FLOAT_TYPES, t in INT_TYPES
                        if (s_f and d_i) or (s_i and d_f):
                            bad.append((c, st, t))
                    if bad:
                        print(f"{name}: FLOAT-INT-MISMATCH {bad}")
                        flagged += 1
                        continue
        print(f"{name}: ok")
    print(f"\n{flagged} flagged / {len(oracles)} oracles")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
