#!/usr/bin/env python3
"""Dev-loop mimic of the driver's DuckDB correctness compare — the ONE
checker (absorbs the former check_oracle_bounded.py and check_cc_exact.py).

Usage: check_oracle.py <sfDir> <verifyOutDir> [timeout_sec]

For each query dir in verifyOutDir: load the Spark parquet result, run the
oracle SQL from oracle_sql.json in DuckDB (tables = parquet views named
after the files in sfDir), sort columns by name, sort rows, compare values.

Modes:
  - No timeout (default): every oracle runs to completion (sf0.01 dev loop).
  - With timeout_sec (large-SF soaks): each oracle gets a wall-clock bound.
    The DuckDB oracles are written for cross-engine EXACTNESS, not speed; a
    few (recursive-CTE connected components, per-position digest chains,
    BPE unrolling) are superlinear in DuckDB and unusable at sf1. A
    timed-out query reports TIMEOUT — EXCEPT the connected-components pair
    (d06/d09), which automatically falls back to an exact union-find
    checker: it reuses the d06 oracle's own non-recursive prefix (simhash
    -> banding -> capped buckets -> edges) verbatim in DuckDB, substitutes
    union-find for the transitive closure, and compares exactly. So one
    command soaks the whole battery with zero known timeouts.
"""
import sys, json, glob, os, threading, time
import duckdb


def norm(rows):
    # stringify everything so 1 == 1.0 mismatches still show, but bytes/
    # dates compare stably; round is NOT applied — we want exactness.
    return [tuple(repr(v) for v in r) for r in rows]


# ---------------------------------------------------------------- cc exact

def _components(edges):
    parent = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    nodes = set()
    for a, b in edges:
        nodes.add(a)
        nodes.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min so the root IS the canonical min id
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in nodes}


def _cc_members(con, oracle):
    """Derive exact clusters from the d06 oracle's non-recursive prefix."""
    sql = oracle["d06_dedup_clusters"]
    cut = sql.find("reach(id, r) AS (")
    assert cut > 0, "d06 oracle no longer has the reach CTE; update this checker"
    prefix = sql[:cut].rstrip().rstrip(",")
    edges = con.execute(prefix + " SELECT a, b FROM edges WHERE a < b").fetchall()
    root = _components(edges)
    members = {}
    for doc, r in root.items():
        members.setdefault(r, []).append(doc)
    return members


def _cc_exact(con, oracle, out_dir, q):
    """Exact check for d06/d09 via union-find. Returns (ok, detail)."""
    members = _cc_members(con, oracle)
    if q == "d06_dedup_clusters":
        expect = set()
        for r, docs in members.items():
            for d in docs:
                expect.add((d, r, len(docs), d == r))
        got = set(map(tuple, con.execute(
            f"SELECT doc_id, cluster_id, cluster_size, is_canonical "
            f"FROM '{out_dir}/d06_dedup_clusters/*.parquet'").fetchall()))
        detail = (f"{len(got)} rows, {len(members)} clusters, max size "
                  f"{max((len(d) for d in members.values()), default=0)}")
        return got == expect, detail
    if q == "d09_keep_best":
        all_docs = [d for docs in members.values() for d in docs]
        con.execute("CREATE TEMP TABLE IF NOT EXISTS member_ids(doc_id BIGINT)")
        con.execute("DELETE FROM member_ids")
        con.executemany("INSERT INTO member_ids VALUES (?)",
                        [(d,) for d in all_docs])
        ntok = dict(con.execute(
            "SELECT d.doc_id, LEN(string_split(d.text, ' ')) FROM documents d "
            "JOIN member_ids m USING (doc_id)").fetchall())
        expect = set()
        for r, docs in members.items():
            best = min(docs, key=lambda d: (-ntok[d], d))
            expect.add((r, best, ntok[best], len(docs) - 1))
        got = set(map(tuple, con.execute(
            f"SELECT cluster_id, kept_doc_id, kept_tokens, n_dropped "
            f"FROM '{out_dir}/d09_keep_best/*.parquet'").fetchall()))
        return got == expect, f"{len(got)} rows"
    raise ValueError(q)


CC_QUERIES = ("d06_dedup_clusters", "d09_keep_best")


# ------------------------------------------------------------------- main

def main(sf_dir, out_dir, timeout=None):
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

        t0 = time.time()
        if timeout is None:
            run()
            timed_out = False
        else:
            t = threading.Thread(target=run, daemon=True)
            t.start()
            t.join(timeout)
            timed_out = t.is_alive()
            if timed_out:
                con.interrupt()
                t.join(60)
            elif "err" in result and "INTERRUPT" in result["err"].upper():
                timed_out = True

        if timed_out:
            if q in CC_QUERIES:
                ok, detail = _cc_exact(con, oracle, out_dir, q)
                if ok:
                    n_ok += 1
                    print(f"  + {q}: EXACT MATCH via union-find ({detail}) "
                          f"[{time.time()-t0:.1f}s]", flush=True)
                else:
                    n_bad += 1
                    print(f"  X {q}: UNION-FIND MISMATCH ({detail})", flush=True)
            else:
                n_to += 1
                print(f"  T {q}: ORACLE TIMEOUT after {timeout}s "
                      f"(spark rows: {len(spark_rows)})", flush=True)
            continue
        if "err" in result:
            n_bad += 1
            print(f"  X {q}: ORACLE SQL ERROR: {result['err']}", flush=True)
            continue
        if [c.lower() for c in cols] != [c.lower() for c in result["cols"]]:
            print(f"  X {q}: column mismatch spark={cols} duck={result['cols']}",
                  flush=True)
            n_bad += 1
            continue
        a, b = sorted(norm(spark_rows)), sorted(norm(result["rows"]))
        if a == b:
            # a 0-row match is vacuous — it proves nothing about the operator
            flag = " [SUSPECT: 0 rows — vacuous match]" if not a else ""
            print(f"  + {q}: MATCH ({len(a)} rows){flag}", flush=True)
            n_ok += 1
        else:
            n_bad += 1
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"  X {q}: VALUE MISMATCH rows {len(a)} vs {len(b)}; "
                  f"first diffs: {diff}", flush=True)
    if timeout is None:
        print(f"== {n_ok} match, {n_bad} mismatch")
    else:
        print(f"== {n_ok} match, {n_bad} mismatch, {n_to} oracle-timeout")
    return 1 if n_bad else 0


if __name__ == "__main__":
    to = int(sys.argv[3]) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], to))
