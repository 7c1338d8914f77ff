#!/usr/bin/env python3
"""check_oracle.py with a per-query wall-clock bound, for large-SF soaks.

The DuckDB oracles are written for cross-engine EXACTNESS at sf0.01, not
speed; a few (recursive-CTE connected components, per-position digest
chains, BPE unrolling) are superlinear in DuckDB and unusable at sf1.
Queries whose oracle exceeds the bound are reported TIMEOUT (the Spark
side already produced rows, and those queries stay hash-verified at
sf0.01/sf0.1) rather than blocking the whole soak.

Usage: check_oracle_bounded.py <sfDir> <verifyOutDir> [timeout_sec]
"""
import sys, json, glob, os, threading, time
import duckdb

def norm(rows):
    return [tuple(repr(v) for v in r) for r in rows]

def main(sf_dir, out_dir, timeout):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = n_to = 0
    for q in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, q)
        if not os.path.isdir(qdir):
            continue
        cols = sorted(con.sql(f"SELECT * FROM '{qdir}/*.parquet'").columns)
        spark_rows = con.execute(
            f"SELECT {', '.join(cols)} FROM '{qdir}/*.parquet'").fetchall()
        if q not in oracle:
            print(f"  ~ {q}: rows-only ({len(spark_rows)} rows)", flush=True)
            continue
        result = {}
        def run():
            try:
                rel = con.sql(oracle[q])
                dcols = sorted(rel.columns)
                result["rows"] = con.execute(
                    f"SELECT {', '.join(dcols)} FROM ({oracle[q]}) oq").fetchall()
                result["cols"] = dcols
            except Exception as e:
                result["err"] = str(e)
        t = threading.Thread(target=run, daemon=True)
        t0 = time.time()
        t.start(); t.join(timeout)
        if t.is_alive():
            con.interrupt()
            t.join(60)
            n_to += 1
            print(f"  T {q}: ORACLE TIMEOUT after {timeout}s "
                  f"(spark rows: {len(spark_rows)})", flush=True)
            continue
        if "err" in result:
            if "INTERRUPT" in result["err"].upper():
                n_to += 1
                print(f"  T {q}: ORACLE TIMEOUT after {timeout}s", flush=True)
            else:
                n_bad += 1
                print(f"  X {q}: ORACLE SQL ERROR: {result['err']}", flush=True)
            continue
        if [c.lower() for c in cols] != [c.lower() for c in result["cols"]]:
            n_bad += 1
            print(f"  X {q}: column mismatch", flush=True)
            continue
        a, b = sorted(norm(spark_rows)), sorted(norm(result["rows"]))
        if a == b:
            n_ok += 1
            print(f"  + {q}: MATCH ({len(a)} rows) [{time.time()-t0:.1f}s]",
                  flush=True)
        else:
            n_bad += 1
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"  X {q}: VALUE MISMATCH rows {len(a)} vs {len(b)}; "
                  f"first diffs: {diff}", flush=True)
    print(f"== {n_ok} match, {n_bad} mismatch, {n_to} oracle-timeout")
    return 1 if n_bad else 0

if __name__ == "__main__":
    to = int(sys.argv[3]) if len(sys.argv) > 3 else 300
    sys.exit(main(sys.argv[1], sys.argv[2], to))
