#!/usr/bin/env python3
"""Audit q55_dedup_clusters and q95_canonical_docs at large SF.

Both committed oracles compute connected components with a RECURSIVE
CTE that enumerates every (node, reachable-node) pair — on the sf1
synthetic corpus the 0.65-Jaccard graph has near-clique components,
so the walk's intermediate is quadratic in component size and DuckDB
exhausts RAM + a 60 GB spill budget. The gate-scale (sf0.01) runs are
unaffected.

This audit keeps DuckDB for the tractable part — the exact pairwise
Jaccard edge list (the same `pairs` CTE both oracles embed) — and
replaces only the recursion with a driver-side union-find, labeling
each component by its MINIMUM node id exactly as the oracles' MIN(r)
does. q95's canonical pick (max n_chars, tie → min doc_id, singletons
self-canonical) is then recomputed from the same labels.

Usage: python3 scripts/audit_cc_sf1.py <sfdir> <verify_outdir>
Exit 0 iff both Spark parquets equal the recomputed truths.
"""
import glob
import sys

import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

sfdir, outdir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
con.execute("SET temp_directory='/tmp/duckdb_audit_spill'")
con.execute("SET max_temp_directory_size='60GB'")
con.execute("SET memory_limit='48GB'")
con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sfdir}/documents.parquet'")

PAIRS_SQL = """
WITH pos AS (
 SELECT doc_id, text, UNNEST(GENERATE_SERIES(1, CAST(LEN(text) AS BIGINT) - 2)) AS i
 FROM documents WHERE doc_id % 4 = 0),
s AS (SELECT DISTINCT doc_id, SUBSTR(text, CAST(i AS INT), 3) AS sh FROM pos),
sz AS (SELECT doc_id, COUNT(*) AS n FROM s GROUP BY doc_id),
inter AS (
 SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
 FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
 GROUP BY a.doc_id, b.doc_id)
SELECT id_a, id_b
FROM inter JOIN sz x ON id_a = x.doc_id JOIN sz y ON id_b = y.doc_id
WHERE CAST(n_inter AS DOUBLE) / CAST(x.n + y.n - n_inter AS DOUBLE) >= 0.65
"""

print("computing exact 0.65-Jaccard edges in DuckDB ...")
edges = con.execute(PAIRS_SQL).fetchall()
print(f"{len(edges)} edges")

parent = {}

def find(x):
    root = x
    while parent.get(root, root) != root:
        root = parent[root]
    while parent.get(x, x) != x:
        parent[x], x = root, parent[x]
    return root

def union(a, b):
    ra, rb = find(a), find(b)
    if ra != rb:
        # min-id labeling: smaller root wins, matching the oracles' MIN(r)
        if ra < rb:
            parent[rb] = ra
        else:
            parent[ra] = rb

for a, b in edges:
    union(a, b)

nodes = {n for e in edges for n in e}
labels = {n: find(n) for n in nodes}

def read_spark(name):
    frags = [pq.read_table(p) for p in sorted(glob.glob(f"{outdir}/{name}/*.parquet"))]
    return pa.concat_tables(frags)

status = 0

# --- q55: (node, cluster) for every clustered node ---------------------
s55 = {(d["node"], d["cluster"]) for d in read_spark("q55_dedup_clusters").to_pylist()}
t55 = {(n, c) for n, c in labels.items()}
if s55 != t55:
    print(f"FAIL q55_dedup_clusters: spark {len(s55)} rows vs truth {len(t55)}; "
          f"sample diff {sorted(s55 ^ t55)[:3]}")
    status = 1
else:
    print(f"OK   q55_dedup_clusters vs union-find ({len(t55)} rows)")

# --- q191: incremental cluster maintenance must land on the SAME
# fixpoint as q55 (its whole contract) --------------------------------
import os
if os.path.isdir(f"{outdir}/q191_cluster_increment"):
    s191 = {(d["node"], d["cluster"])
            for d in read_spark("q191_cluster_increment").to_pylist()}
    if s191 != t55:
        print(f"FAIL q191_cluster_increment: spark {len(s191)} rows vs truth "
              f"{len(t55)}; sample diff {sorted(s191 ^ t55)[:3]}")
        status = 1
    else:
        print(f"OK   q191_cluster_increment vs union-find ({len(t55)} rows)")

# --- q192: linear-output incremental ASSIGNMENT must land on the SAME
# fixpoint as q55 (its whole contract — the q191 check, for the
# assignIncrement path) ------------------------------------------------
if os.path.isdir(f"{outdir}/q192_dedup_assign"):
    s192 = {(d["node"], d["cluster"])
            for d in read_spark("q192_dedup_assign").to_pylist()}
    if s192 != t55:
        print(f"FAIL q192_dedup_assign: spark {len(s192)} rows vs truth "
              f"{len(t55)}; sample diff {sorted(s192 ^ t55)[:3]}")
        status = 1
    else:
        print(f"OK   q192_dedup_assign vs union-find ({len(t55)} rows)")

# --- q190: leakage-safe split — grp = union-find root (self for
# singletons), n_members over the %4 universe, split = bucket(grp) ----
if os.path.isdir(f"{outdir}/q190_leakage_safe_split"):
    universe = [d for (d,) in con.execute(
        "SELECT doc_id FROM documents WHERE doc_id % 4 = 0").fetchall()]
    grp = {d: labels.get(d, d) for d in universe}
    sizes = {}
    for g in grp.values():
        sizes[g] = sizes.get(g, 0) + 1

    def bucket(x):
        return (x * 2654435761 + 104729) % 100

    def name(b):
        return "train" if b < 80 else ("val" if b < 90 else "test")

    t190 = {(d, grp[d], sizes[grp[d]], name(bucket(grp[d])), name(bucket(d)))
            for d in universe}
    s190 = {(d["doc_id"], d["grp"], d["n_members"], d["split"],
             d["naive_split"])
            for d in read_spark("q190_leakage_safe_split").to_pylist()}
    if s190 != t190:
        print(f"FAIL q190_leakage_safe_split: spark {len(s190)} rows vs "
              f"truth {len(t190)}; sample diff {sorted(s190 ^ t190)[:3]}")
        status = 1
    else:
        print(f"OK   q190_leakage_safe_split vs union-find ({len(t190)} rows)")

# --- q95: every doc → canonical (cluster max-n_chars, tie min id) -------
nchars = dict(con.execute(
    "SELECT doc_id, n_chars FROM documents").fetchall())
by_cluster = {}
for n, c in labels.items():
    by_cluster.setdefault(c, []).append(n)
canon = {}
for c, members in by_cluster.items():
    best = min(members, key=lambda n: (-nchars[n], n))
    for n in members:
        canon[n] = best
t95 = {(d, canon.get(d, d), 1 if canon.get(d, d) == d else 0) for d in nchars}
s95 = {(d["doc_id"], d["canonical_id"], d["is_kept"])
       for d in read_spark("q95_canonical_docs").to_pylist()}
if s95 != t95:
    print(f"FAIL q95_canonical_docs: spark {len(s95)} rows vs truth {len(t95)}; "
          f"sample diff {sorted(s95 ^ t95)[:3]}")
    status = 1
else:
    print(f"OK   q95_canonical_docs vs union-find ({len(t95)} rows)")

sys.exit(status)
