#!/usr/bin/env python3
"""q26_ann_lsh oracle audit — the stronger-than-rows-only gate.

q26 is rows-only at the driver because the hyperplane LSH bucketing is
seeded-random and not SQL-expressible. But the whole query IS a pure
deterministic function of (embeddings table, seed): the 4 hyperplanes
are Gaussian draws from scala.util.Random(42) (= java.util.Random —
a 48-bit LCG plus the Marsaglia polar method, both public algorithms
reimplemented here from scratch), the bucket is the sign pattern of the
projections, and the result is the exact-cosine top-10 per probe within
the probe's bucket (ties broken by neighbor_id; probes are vec_id < 50;
probe itself excluded). This script regenerates the planes with its own
LCG, recomputes buckets and rankings in numpy, and compares.

Float posture: the Python LCG matches Java's bit-for-bit, but
math.log vs StrictMath.log can differ by 1 ulp, and numpy's summation
order differs from the engine's sequential fold — so projections and
cosines can differ at ~1e-15 relative. Sign/rank decisions only flip
when a value sits within that slack of a boundary, so mismatches are
accepted ONLY when the recomputed value is within 1e-9 of the decision
boundary (and counted as boundary rows, reported separately).

Usage: python3 scripts/audit_q26.py [sfdir] [verify_outdir]
Run graft.Verify first (it writes <outdir>/q26_ann_lsh). Exit 0 = every
dumped (probe, neighbor, rank) matches the independent recompute.
"""
import math
import sys

import duckdb
import numpy as np

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

N_BITS, DIM, SEED, K, N_PROBES = 4, 64, 42, 10, 50
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


rng = JavaRandom(SEED)
planes = np.array([[rng.next_gaussian() for _ in range(DIM)]
                   for _ in range(N_BITS)])  # Seq.fill order: plane-major

con = duckdb.connect()
rows = con.execute(f"""SELECT vec_id, CAST(embedding AS DOUBLE[])
  FROM '{sf}/embeddings.parquet' ORDER BY vec_id""").fetchall()
ids = np.array([r[0] for r in rows], dtype=np.int64)
V = np.array([r[1] for r in rows])
dump = con.execute(f"""SELECT probe_id, neighbor_id, rank
  FROM '{out}/q26_ann_lsh/*.parquet' ORDER BY probe_id, rank""").fetchall()

proj = V @ planes.T                       # (n, N_BITS)
near_zero = int((np.abs(proj) < TOL).sum())
buckets = (proj >= 0) @ (1 << np.arange(N_BITS))
norms = np.sqrt((V * V).sum(axis=1))

got = {}
for p, n, r in dump:
    got.setdefault(p, []).append((r, n))

fails = 0
boundary = 0
checked = 0
probe_rows = np.nonzero(ids < N_PROBES)[0]
for pi in probe_rows:
    pid = int(ids[pi])
    mask = (buckets == buckets[pi]) & (ids != pid)
    cand = np.nonzero(mask)[0]
    cos = (V[cand] @ V[pi]) / (norms[cand] * norms[pi])
    order = sorted(range(len(cand)), key=lambda i: (-cos[i], ids[cand[i]]))
    want = [(int(ids[cand[i]]), float(cos[i])) for i in order[:K]]
    have = sorted(got.get(pid, []))
    if [w for w, _ in want] == [n for _, n in have]:
        checked += len(want)
        continue
    # tolerant re-check: every disagreement must sit at the kth-cos
    # boundary (a float-summation-order tie), never deeper
    kth = want[-1][1] if want else 1.0
    cos_by_id = {int(ids[c]): float(x) for c, x in zip(cand, cos)}
    w_ids = {w for w, _ in want}
    h_ids = {n for _, n in have}
    for d in w_ids.symmetric_difference(h_ids):
        c = cos_by_id.get(d)
        if c is None or abs(c - kth) > TOL:
            print(f"FAIL probe {pid}: neighbor {d} disagrees beyond the "
                  f"boundary slack (cos={c}, kth={kth})")
            fails += 1
        else:
            boundary += 1
    checked += len(want)

n_expected_probes = len(probe_rows)
if set(got.keys()) != {int(ids[i]) for i in probe_rows}:
    print(f"FAIL probes: dump has {len(got)} probes, corpus defines "
          f"{n_expected_probes}")
    fails += 1
else:
    print(f"OK   probes ({n_expected_probes} probes, {checked} ranked rows)")
if near_zero:
    print(f"WARN {near_zero} projections within {TOL} of the sign boundary")
if fails == 0:
    msg = "" if boundary == 0 else f" ({boundary} kth-cos boundary ties)"
    print(f"OK   bucket membership + exact-cosine top-{K} equal the "
          f"independent recompute{msg}")

print(f"\n{'AUDIT FAIL' if fails else 'AUDIT OK'}")
sys.exit(1 if fails else 0)
