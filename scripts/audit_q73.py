#!/usr/bin/env python3
"""q73_dedup_embedding_lsh oracle audit — the stronger-than-rows-only gate.

q73 is rows-only at the driver because its 16 hyperplane LSH tables are
seeded-random draws not expressible in SQL — but the whole query IS a
pure deterministic function of (embeddings table, seed): table t's 4
planes are Gaussian draws from scala.util.Random(42 + t) (java.util.
Random's 48-bit LCG + Marsaglia polar, reimplemented here from scratch —
the audit_q26 RNG), a vector's table-t signature is the 4-bit sign
pattern of its projections, candidates are pairs sharing any (table,
signature), and the output is the candidates whose EXACT cosine clears
the 0.35 threshold, one row per pair (id_a < id_b; the engine's
first-agreeing-table filter only dedups the multiset).

Float posture (the audit_q26 contract): the LCG matches Java bit-for-
bit, but numpy's summation order differs from the engine's sequential
fold, so projections/cosines can differ at ~1e-15 relative. A pair-set
mismatch is accepted ONLY when a boundary explains it — some projection
of either endpoint within TOL of 0 (bucket flip) or the pair's cosine
within TOL of the threshold — and is reported separately.

Usage: python3 scripts/audit_q73.py [sfdir] [verify_outdir]
Run graft.Verify first (it writes <outdir>/q73_dedup_embedding_lsh).
Exit 0 = the dumped pair set equals the independent recompute up to
boundary rows.
"""
import math
import sys

import duckdb
import numpy as np

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

N_BITS, N_TABLES, DIM, SEED, THRESHOLD = 4, 16, 64, 42, 0.35
TOL = 1e-9


class JavaRandom:
    """java.util.Random: 48-bit LCG + Marsaglia polar nextGaussian."""

    def __init__(self, seed):
        self.seed = (seed ^ 0x5DEECE66D) & ((1 << 48) - 1)
        self.have = False
        self.nxt = 0.0

    def _next(self, bits):
        self.seed = (self.seed * 0x5DEECE66D + 0xB) & ((1 << 48) - 1)
        return self.seed >> (48 - bits)

    def next_double(self):
        return ((self._next(26) << 27) + self._next(27)) * (2.0 ** -53)

    def next_gaussian(self):
        if self.have:
            self.have = False
            return self.nxt
        while True:
            v1 = 2 * self.next_double() - 1
            v2 = 2 * self.next_double() - 1
            s = v1 * v1 + v2 * v2
            if 0 < s < 1:
                break
        m = math.sqrt(-2 * math.log(s) / s)
        self.nxt = v2 * m
        self.have = True
        return v1 * m


# table t's planes draw from Random(SEED + t), plane-major (Seq.fill)
planes = np.empty((N_TABLES, N_BITS, DIM))
for t in range(N_TABLES):
    rng = JavaRandom(SEED + t)
    for b in range(N_BITS):
        planes[t, b] = [rng.next_gaussian() for _ in range(DIM)]

con = duckdb.connect()
rows = con.execute(f"""SELECT vec_id, CAST(embedding AS DOUBLE[])
  FROM '{sf}/embeddings.parquet' ORDER BY vec_id""").fetchall()
ids = np.array([r[0] for r in rows], dtype=np.int64)
V = np.array([r[1] for r in rows])
dump = set(tuple(r) for r in con.execute(
    f"SELECT id_a, id_b FROM '{out}/q73_dedup_embedding_lsh/*.parquet'"
).fetchall())

n = len(ids)
# projections: (n, tables, bits); signature = sign-pattern int per table
proj = np.einsum("nd,tbd->ntb", V, planes)
sigs = ((proj >= 0).astype(np.int64) << np.arange(N_BITS)).sum(axis=2)

norms = np.sqrt((V * V).sum(axis=1))

# candidates: pairs sharing any (table, signature)
cand = set()
for t in range(N_TABLES):
    buckets = {}
    for i in range(n):
        buckets.setdefault(sigs[i, t], []).append(i)
    for members in buckets.values():
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                a, b = members[x], members[y]
                cand.add((a, b) if ids[a] < ids[b] else (b, a))

want = set()
cos_of = {}
for a, b in cand:
    c = float(V[a] @ V[b]) / (norms[a] * norms[b])
    pair = (int(ids[a]), int(ids[b]))
    cos_of[pair] = c
    if c >= THRESHOLD:
        want.add(pair)

idx_of = {int(v): i for i, v in enumerate(ids)}


def boundary(pair):
    """A pair-set mismatch is excusable only at a decision boundary:
    a near-zero projection of either endpoint (bucket flip) or a
    cosine within TOL of the threshold."""
    a, b = idx_of[pair[0]], idx_of[pair[1]]
    if min(np.abs(proj[a]).min(), np.abs(proj[b]).min()) < TOL:
        return True
    c = cos_of.get(pair)
    if c is None:
        c = float(V[a] @ V[b]) / (norms[a] * norms[b])
    return abs(c - THRESHOLD) < TOL


fails = 0
hard_miss = [p for p in (want - dump) if not boundary(p)]
hard_extra = [p for p in (dump - want) if not boundary(p)]
n_boundary = len(want - dump) + len(dump - want) - len(hard_miss) - len(hard_extra)
if hard_miss or hard_extra:
    for p in hard_miss[:5]:
        print(f"FAIL pair {p}: in recompute, not dumped (no boundary excuse)")
    for p in hard_extra[:5]:
        print(f"FAIL pair {p}: dumped, not recomputed (no boundary excuse)")
    print(f"FAIL pairs: {len(hard_miss)} missing, {len(hard_extra)} extra "
          f"(recompute {len(want)}, dump {len(dump)}, boundary {n_boundary})")
    fails += 1
else:
    print(f"OK   pair set matches ({len(want)} pairs from {len(cand)} "
          f"candidates over {n} vectors; {n_boundary} boundary rows excused)")

print(f"\n{'AUDIT FAIL' if fails else 'AUDIT OK'}")
sys.exit(1 if fails else 0)
