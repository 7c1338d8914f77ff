#!/usr/bin/env python3
"""Dev-loop mimic of the driver's DuckDB correctness compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>

For each query dir in verifyOutDir: load the Spark parquet result, run the
oracle SQL from oracle_sql.json in DuckDB (tables = parquet views named after
the files in sfDir), sort columns by name, sort rows, compare values.
"""
import sys, json, glob, os
import duckdb

def norm(rows):
    # stringify everything so 1 == 1.0 mismatches still show, but bytes/dates
    # compare stably; round is NOT applied — we want exactness.
    return [tuple(repr(v) for v in r) for r in rows]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for q in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, q)
        if not os.path.isdir(qdir):
            continue
        spark_rel = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
        cols = sorted(spark_rel.columns)
        spark_rows = con.execute(
            f"SELECT {', '.join(cols)} FROM '{qdir}/*.parquet'").fetchall()
        if q not in oracle:
            print(f"  ~ {q}: rows-only ({len(spark_rows)} rows)")
            continue
        try:
            duck_rel = con.sql(oracle[q])
            dcols = sorted(duck_rel.columns)
            duck_rows = con.execute(
                f"SELECT {', '.join(dcols)} FROM ({oracle[q]}) oq").fetchall()
        except Exception as e:
            print(f"  X {q}: ORACLE SQL ERROR: {e}")
            n_bad += 1
            continue
        if [c.lower() for c in cols] != [c.lower() for c in dcols]:
            print(f"  X {q}: column mismatch spark={cols} duck={dcols}")
            n_bad += 1
            continue
        a, b = sorted(norm(spark_rows)), sorted(norm(duck_rows))
        if a == b:
            # a 0-row match is vacuous — it proves nothing about the operator
            flag = " [SUSPECT: 0 rows — vacuous match]" if not a else ""
            print(f"  + {q}: MATCH ({len(a)} rows){flag}")
            n_ok += 1
        else:
            n_bad += 1
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"  X {q}: VALUE MISMATCH rows {len(a)} vs {len(b)}; first diffs: {diff}")
    print(f"== {n_ok} match, {n_bad} mismatch")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
