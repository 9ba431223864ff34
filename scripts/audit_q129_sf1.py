#!/usr/bin/env python3
"""Audit q129_dim_chain at large SF with an ASOF-join oracle.

q129's committed ANSI oracle (equi-key + BETWEEN on tiling SCD2
intervals) is what the driver's gate runs at sf0.01, where it is
cheap. At sf1 the same SQL is ~1e10 pair evaluations in DuckDB
(account_num has 50 values, client_id 20 — the hash join fans out
len/50-sized probe groups before the BETWEEN filter prunes), so this
script checks the SAME semantics through DuckDB's native ASOF JOIN:
on intervals that tile a key's timeline (LEAD(ts)-1µs end, 9999
sentinel tail), "latest interval start <= ts per key" IS the
BETWEEN match — facts before a key's first interval drop on both
formulations.

Usage: python3 scripts/audit_q129_sf1.py <sfdir> <verify_outdir>
Exit 0 iff the Spark parquet equals the ASOF oracle (same canon as
scripts/selfcheck.py).
"""
import glob
import sys

import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

sfdir, outdir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
con.execute(f"CREATE VIEW events AS SELECT * FROM '{sfdir}/events.parquet'")

# Tie handling: the committed oracle tiles intervals with
# LEAD(ts) OVER (... ORDER BY ts, event_id) - 1us, so of two dimension
# rows sharing (key, ts) only the HIGHEST event_id has a non-empty
# interval — the other is [ts, ts-1us]. ASOF JOIN would pick an
# arbitrary row among tied c_from values, so each CTE pre-collapses
# ties to that highest-event_id row (QUALIFY), making the ASOF match
# exactly the BETWEEN match.
ASOF_SQL = """
WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events),
cards AS (
 SELECT user_id AS card_id, (user_id * 7 + LENGTH(event_type)) % 50 AS account_num,
  ts AS c_from FROM ev WHERE event_id % 3 = 0
 QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1),
accounts AS (
 SELECT user_id % 50 AS account_num, (user_id * 13 + event_id) % 20 AS client_id,
  ts AS a_from FROM ev WHERE event_id % 3 = 1
 QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id % 50, ts ORDER BY event_id DESC) = 1),
clients AS (
 SELECT user_id % 20 AS client_id, event_type AS segment,
  ts AS l_from FROM ev WHERE event_id % 3 = 2
 QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id % 20, ts ORDER BY event_id DESC) = 1)
SELECT f.event_id, f.user_id AS card_id, c.account_num, a.client_id, l.segment
FROM ev f
ASOF JOIN cards c ON f.user_id = c.card_id AND f.ts >= c.c_from
ASOF JOIN accounts a ON c.account_num = a.account_num AND f.ts >= a.a_from
ASOF JOIN clients l ON a.client_id = l.client_id AND f.ts >= l.l_from
"""

otbl = con.execute(ASOF_SQL).arrow()
frags = [pq.read_table(p) for p in sorted(glob.glob(f"{outdir}/q129_dim_chain/*.parquet"))]
stbl = pa.concat_tables(frags)

def canon(tbl):
    cols = sorted(tbl.column_names)
    rows = [tuple(str(d[c]) for c in cols) for d in tbl.to_pylist()]
    return sorted(rows)

cs, co = canon(stbl), canon(otbl)
if len(cs) != len(co):
    print(f"FAIL q129_dim_chain: rows spark={len(cs)} asof-oracle={len(co)}")
    sys.exit(1)
bad = [(a, b) for a, b in zip(cs, co) if a != b]
if bad:
    print(f"FAIL q129_dim_chain: {len(bad)}/{len(cs)} rows differ; first {bad[0]}")
    sys.exit(1)
print(f"OK   q129_dim_chain vs ASOF oracle ({len(cs)} rows)")
