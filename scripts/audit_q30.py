#!/usr/bin/env python3
"""q30_fingerprint oracle audit — the stronger-than-rows-only gate.

q30 is rows-only at the driver because the fingerprint is a custom
Catalyst expression (graft.functions.RollingHashExpr), not SQL the
DuckDB oracle can run. But the fingerprint IS pure public algebra:
64-bit FNV-1a over the document's raw UTF-8 bytes (offset
0xCBF29CE484222325, prime 0x100000001B3), surfaced as a signed long.
This script recomputes every fingerprint from documents.parquet in
plain Python — a fully independent implementation sharing zero code
with the engine — and compares byte-exact.

Usage: python3 scripts/audit_q30.py [sfdir] [verify_outdir]
Run graft.Verify first (it writes <outdir>/q30_fingerprint). Exit 0 =
the dumped output equals the recomputation on every row.
"""
import sys

import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

OFFSET = 0xCBF29CE484222325  # unsigned of RollingHash.Offset
PRIME = 0x100000001B3        # RollingHash.Prime
MASK = (1 << 64) - 1


def fnv1a(b: bytes) -> int:
    h = OFFSET
    for x in b:
        h = ((h ^ x) * PRIME) & MASK
    return h - (1 << 64) if h >= (1 << 63) else h


con = duckdb.connect()
docs = con.execute(
    f"SELECT doc_id, text FROM '{sf}/documents.parquet'").fetchall()
dump = dict(con.execute(
    f"SELECT doc_id, fingerprint FROM '{out}/q30_fingerprint/*.parquet'"
).fetchall())

fails = 0
if len(dump) != len(docs):
    print(f"FAIL coverage: {len(docs)} docs but {len(dump)} dumped rows")
    fails += 1
else:
    print(f"OK   coverage ({len(dump)} rows)")

bad = 0
for doc_id, text in docs:
    want = fnv1a((text or "").encode("utf-8"))
    got = dump.get(doc_id)
    if got != want:
        if bad < 5:
            print(f"FAIL doc {doc_id}: dumped {got}, recomputed {want}")
        bad += 1
if bad:
    print(f"FAIL fingerprint: {bad} rows off the independent FNV-1a recompute")
    fails += 1
else:
    print("OK   fingerprint equals the independent FNV-1a recompute (byte-exact)")

print(f"\n{'AUDIT FAIL' if fails else 'AUDIT OK'}")
sys.exit(1 if fails else 0)
