#!/usr/bin/env python3
"""q22_dedup_minhash oracle audit — the stronger-than-rows-only gate.

q22 is rows-only at the driver because MinHash banding rides Spark's
xxhash64, which DuckDB cannot reproduce in SQL. But the whole query IS a
pure deterministic integer function of the documents table: shingles are
every 3-char substring of the raw text (docs shorter than 3 chars drop),
minhash element i is min over shingles s of XXH64(utf8(s), seed =
XXH64_int(i, 42)) — Spark's xxhash64(lit(i), shingle) chains each
argument's hash as the next seed, starting at 42 — the band bucket is
the chained XXH64_long fold of the band's 4 signature slots, and the
output is every unordered doc pair sharing at least one (band, bucket),
id_a < id_b. (The engine's first-agreeing-band filter only dedups the
multiset; the SET of pairs is exactly "shares any band".) This script
reimplements XXH64 (the public xxHash spec, same primes) from scratch,
recomputes signatures, buckets and the pair set, and compares EXACTLY —
no float tolerance anywhere, it is all 64-bit integer algebra.

Usage: python3 scripts/audit_q22.py [sfdir] [verify_outdir]
Run graft.Verify first (it writes <outdir>/q22_dedup_minhash). Exit 0 =
the dumped pair set equals the recomputation exactly.
"""
import sys
from collections import defaultdict

import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

K, NUM_PERM, BANDS = 3, 16, 4
ROWS_PER_BAND = NUM_PERM // BANDS
SEED = 42

M64 = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & M64


def _fmix(h):
    h ^= h >> 33
    h = (h * P2) & M64
    h ^= h >> 29
    h = (h * P3) & M64
    h ^= h >> 32
    return h


def xxh64_int(i, seed):
    """Spark XXH64.hashInt: a 4-byte primitive, not the byte stream."""
    h = (seed + P5 + 4) & M64
    h ^= ((i & 0xFFFFFFFF) * P1) & M64
    h = (_rotl(h, 23) * P2 + P3) & M64
    return _fmix(h)


def xxh64_long(v, seed):
    h = (seed + P5 + 8) & M64
    h ^= (_rotl((v * P2) & M64, 31) * P1) & M64
    h = (_rotl(h, 27) * P1 + P4) & M64
    return _fmix(h)


def xxh64_bytes(b, seed):
    """Canonical XXH64 over a byte string (little-endian words)."""
    n = len(b)
    i = 0
    if n >= 32:
        acc = [(seed + P1 + P2) & M64, (seed + P2) & M64,
               seed & M64, (seed - P1) & M64]
        while i + 32 <= n:
            for lane in range(4):
                w = int.from_bytes(b[i + 8 * lane:i + 8 * lane + 8], "little")
                acc[lane] = (_rotl((acc[lane] + w * P2) & M64, 31) * P1) & M64
            i += 32
        h = (_rotl(acc[0], 1) + _rotl(acc[1], 7) +
             _rotl(acc[2], 12) + _rotl(acc[3], 18)) & M64
        for v in acc:
            h ^= (_rotl((v * P2) & M64, 31) * P1) & M64
            h = (h * P1 + P4) & M64
    else:
        h = (seed + P5) & M64
    h = (h + n) & M64
    while i + 8 <= n:
        w = int.from_bytes(b[i:i + 8], "little")
        h ^= (_rotl((w * P2) & M64, 31) * P1) & M64
        h = (_rotl(h, 27) * P1 + P4) & M64
        i += 8
    if i + 4 <= n:
        w = int.from_bytes(b[i:i + 4], "little")
        h ^= (w * P1) & M64
        h = (_rotl(h, 23) * P2 + P3) & M64
        i += 4
    while i < n:
        h ^= (b[i] * P5) & M64
        h = (_rotl(h, 11) * P1) & M64
        i += 1
    return _fmix(h)


# per-permutation seeds: xxhash64(lit(i), shingle) chains hashInt(i, 42)
# into the string hash's seed
PERM_SEEDS = [xxh64_int(i, SEED) for i in range(NUM_PERM)]

con = duckdb.connect()
docs = con.execute(
    f"SELECT doc_id, text FROM '{sf}/documents.parquet'").fetchall()
dump = set(tuple(r) for r in con.execute(
    f"SELECT id_a, id_b FROM '{out}/q22_dedup_minhash/*.parquet'"
).fetchall())

# memoized per-shingle hash vectors: the 3-char shingle vocabulary is
# closed-charset-small, so hashing each distinct shingle once makes the
# recompute linear in corpus size
shingle_hashes = {}


def _signed(v):
    return v - (1 << 64) if v >= (1 << 63) else v


def hashes_of(sh):
    """SIGNED hash values: Spark's min() over LongType is a signed
    comparison, so the minhash element must be the signed minimum."""
    v = shingle_hashes.get(sh)
    if v is None:
        b = sh.encode("utf-8")
        v = [_signed(xxh64_bytes(b, s)) for s in PERM_SEEDS]
        shingle_hashes[sh] = v
    return v


buckets = defaultdict(list)  # (band, bucket) -> [doc_id]
n_sig = 0
for doc_id, text in docs:
    t = text or ""
    if len(t) < K:
        continue  # the engine filters length >= k before shingling
    sig = [(1 << 63) - 1] * NUM_PERM  # signed Long.MaxValue
    seen = set()
    for p in range(len(t) - K + 1):
        sh = t[p:p + K]
        if sh in seen:
            continue  # min is duplicate-idempotent
        seen.add(sh)
        hv = hashes_of(sh)
        for j in range(NUM_PERM):
            if hv[j] < sig[j]:
                sig[j] = hv[j]
    n_sig += 1
    for band in range(BANDS):
        h = SEED
        for r in range(ROWS_PER_BAND):
            h = xxh64_long(sig[band * ROWS_PER_BAND + r], h)
        buckets[(band, h)].append(doc_id)

want = set()
for members in buckets.values():
    if len(members) > 1:
        ms = sorted(members)
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                want.add((ms[x], ms[y]))

fails = 0
missing = want - dump
extra = dump - want
if missing or extra:
    for p in list(missing)[:5]:
        print(f"FAIL pair {p}: in recompute, not dumped")
    for p in list(extra)[:5]:
        print(f"FAIL pair {p}: dumped, not in recompute")
    print(f"FAIL pairs: {len(missing)} missing, {len(extra)} extra "
          f"(recompute {len(want)}, dump {len(dump)})")
    fails += 1
else:
    print(f"OK   pair set exact ({len(want)} pairs over {n_sig} signed docs, "
          f"{len(shingle_hashes)} distinct shingles) — integer-exact, no tolerance")

print(f"\n{'AUDIT FAIL' if fails else 'AUDIT OK'}")
sys.exit(1 if fails else 0)
