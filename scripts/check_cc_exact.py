#!/usr/bin/env python3
"""Exact oracle check for the connected-components queries (d06, d09) at
soak scale.

The battery oracles for d06/d09 compute components with a recursive
transitive-closure CTE, which is O(|component|^2) in DuckDB and unusable
once replication produces a mega-cluster (sf1 has a 33,680-member one).
This checker keeps the oracle EXACT by reusing the oracle SQL's own
non-recursive prefix (simhash -> banding -> capped buckets -> edges)
verbatim in DuckDB, then substituting union-find (linear-ish) for the
transitive closure, and compares the derived labels/sizes/keep-best rows
against the Spark parquet output byte-for-value.

Usage: check_cc_exact.py <sfDir> <verifyOutDir>
"""
import sys, json, os
import duckdb


def components(edges):
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


def main(sf_dir, out_dir):
    con = duckdb.connect()
    import glob
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

    # Reuse the d06 oracle's own prefix: everything up to (not including)
    # the recursive `reach` CTE, closed with a plain select of the edges.
    sql = oracle["d06_dedup_clusters"]
    cut = sql.find("reach(id, r) AS (")
    assert cut > 0, "d06 oracle no longer has the reach CTE; update this checker"
    prefix = sql[:cut].rstrip().rstrip(",")
    edges = con.execute(prefix + " SELECT a, b FROM edges WHERE a < b").fetchall()
    print(f"edges (undirected, from oracle prefix): {len(edges)}", flush=True)

    root = components(edges)
    members = {}
    for doc, r in root.items():
        members.setdefault(r, []).append(doc)

    failures = 0

    # ---- d06: (doc_id, cluster_id, cluster_size, is_canonical) ----
    expect = set()
    for r, docs in members.items():
        for d in docs:
            expect.add((d, r, len(docs), d == r))
    got = set(
        map(tuple, con.execute(
            f"SELECT doc_id, cluster_id, cluster_size, is_canonical "
            f"FROM '{out_dir}/d06_dedup_clusters/*.parquet'").fetchall()))
    if got == expect:
        print(f"  + d06_dedup_clusters: EXACT MATCH ({len(got)} rows, "
              f"{len(members)} clusters, max size "
              f"{max(len(d) for d in members.values())})")
    else:
        failures += 1
        print(f"  - d06 MISMATCH: spark {len(got)} rows vs derived {len(expect)}; "
              f"spark-only {list(got - expect)[:3]} derived-only {list(expect - got)[:3]}")

    # ---- d09: keep-best = argmax(n_tokens, tie -> min doc_id) per cluster ----
    all_docs = [d for docs in members.values() for d in docs]
    con.execute("CREATE TEMP TABLE member_ids(doc_id BIGINT)")
    con.executemany("INSERT INTO member_ids VALUES (?)", [(d,) for d in all_docs])
    ntok = dict(con.execute(
        "SELECT d.doc_id, LEN(string_split(d.text, ' ')) FROM documents d "
        "JOIN member_ids m USING (doc_id)").fetchall())
    expect9 = set()
    for r, docs in members.items():
        best = min(docs, key=lambda d: (-ntok[d], d))
        expect9.add((r, best, ntok[best], len(docs) - 1))
    got9 = set(
        map(tuple, con.execute(
            f"SELECT cluster_id, kept_doc_id, kept_tokens, n_dropped "
            f"FROM '{out_dir}/d09_keep_best/*.parquet'").fetchall()))
    if got9 == expect9:
        print(f"  + d09_keep_best: EXACT MATCH ({len(got9)} rows)")
    else:
        failures += 1
        print(f"  - d09 MISMATCH: spark-only {list(got9 - expect9)[:3]} "
              f"derived-only {list(expect9 - got9)[:3]}")

    print(f"== {2 - failures} exact-match, {failures} mismatch")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
