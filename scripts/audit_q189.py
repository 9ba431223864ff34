#!/usr/bin/env python3
"""q189_semdedup oracle audit — the stronger-than-rows-only gate.

The driver's DuckDB oracle cannot check q189 directly: the seeded
k-means fit is not SQL-expressible, and the driver's oracle SQL runs
only over the testdata tables (it cannot reference the Spark dump). But
GIVEN the (vec_id -> cell) assignment the rest of SemDeDup is pure
algebra over the embeddings table, and since round 13 the centroid is
the cell's EXACT member mean — so everything downstream of the fit IS
recomputable in DuckDB from the dumped assignment:

  1. csim_micro  = floor(1e6 * cos(v, mean of v's cell members))
     — recomputed within +-1 micro (double-accumulation-order slack,
     the documented q51-class risk; floor boundary flips are what the
     slack absorbs).
  2. kept        = NOT EXISTS clustermate u with (csim_u, id_u) <
     (csim_v, id_v) and cos(u, v) >= threshold — recomputed EXACTLY,
     using the dump's own csim labels for the dominance order (so the
     +-1 slack above cannot leak into the prune check).

Usage: python3 scripts/audit_q189.py [sfdir] [verify_outdir]
Run graft.Verify first (it writes <outdir>/q189_semdedup). Exit 0 = the
dumped output equals the recomputation.
"""
import sys

import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
T = 0.35  # DedupQueries.CosT — q189's threshold

con = duckdb.connect()
con.execute("SET temp_directory='/tmp/duckdb_q189_spill'")
con.execute("SET memory_limit='32GB'")
con.execute(f"""CREATE VIEW emb AS
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM '{sf}/embeddings.parquet'""")
con.execute(f"""CREATE VIEW dump AS
  SELECT vec_id, cell, csim_micro, kept
  FROM '{out}/q189_semdedup/*.parquet'""")

fails = 0

# 0. coverage: one output row per corpus vector
n_emb, n_dump, n_join = con.execute("""
  SELECT (SELECT COUNT(*) FROM emb), (SELECT COUNT(*) FROM dump),
         (SELECT COUNT(*) FROM dump JOIN emb USING (vec_id))""").fetchone()
if not (n_emb == n_dump == n_join):
    print(f"FAIL coverage: emb={n_emb} dump={n_dump} joined={n_join}")
    fails += 1
else:
    print(f"OK   coverage ({n_dump} rows)")

# 1. csim_micro recompute from the exact cell member mean
bad_csim = con.execute("""
  WITH cm AS (
    SELECT d.cell, pos, AVG(e.v[pos]) AS m
    FROM dump d JOIN emb e USING (vec_id),
         UNNEST(GENERATE_SERIES(1, LEN(e.v))) AS g(pos)
    GROUP BY 1, 2),
  ctr AS (SELECT cell, LIST(m ORDER BY pos) AS c FROM cm GROUP BY cell),
  re AS (
    SELECT d.vec_id, d.csim_micro,
      CAST(FLOOR(1e6 * LIST_DOT_PRODUCT(e.v, ctr.c) /
        (SQRT(LIST_DOT_PRODUCT(e.v, e.v)) *
         SQRT(LIST_DOT_PRODUCT(ctr.c, ctr.c)))) AS BIGINT) AS want
    FROM dump d JOIN emb e USING (vec_id) JOIN ctr ON ctr.cell = d.cell)
  SELECT COUNT(*) FROM re WHERE ABS(csim_micro - want) > 1""").fetchone()[0]
if bad_csim:
    print(f"FAIL csim: {bad_csim} rows off the member-mean by > 1 micro")
    fails += 1
else:
    print("OK   csim_micro equals the exact cell member mean (+-1 micro)")

# 2. kept recompute: dominance prune from the dump's own (cell, csim)
#    labels + exact cosines — byte-exact, no tolerance
bad_kept = con.execute(f"""
  WITH dom AS (
    SELECT DISTINCT b.vec_id
    FROM dump a JOIN dump b ON a.cell = b.cell
      AND (a.csim_micro < b.csim_micro OR
           (a.csim_micro = b.csim_micro AND a.vec_id < b.vec_id))
    JOIN emb ea ON ea.vec_id = a.vec_id
    JOIN emb eb ON eb.vec_id = b.vec_id
    WHERE LIST_DOT_PRODUCT(ea.v, eb.v) /
      (SQRT(LIST_DOT_PRODUCT(ea.v, ea.v)) *
       SQRT(LIST_DOT_PRODUCT(eb.v, eb.v))) >= {T})
  SELECT COUNT(*) FROM dump d
  WHERE d.kept = (d.vec_id IN (SELECT vec_id FROM dom))""").fetchone()[0]
n_dropped = con.execute("SELECT COUNT(*) FROM dump WHERE NOT kept").fetchone()[0]
if bad_kept:
    print(f"FAIL kept: {bad_kept} rows disagree with the dominance recompute")
    fails += 1
else:
    print(f"OK   kept equals the dominance recompute ({n_dropped} pruned)")
if n_dropped == 0:
    print("WARN nothing pruned — the fixture should exercise the prune")

print(f"\n{'AUDIT FAIL' if fails else 'AUDIT OK'}")
sys.exit(1 if fails else 0)
