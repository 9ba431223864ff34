package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group sampling as a mergeable summary — the scale path
  * for stratified "k docs per stratum" sampling (reference
  * analysis.sql's per-segment sampling intent; the window formulation
  * is q63). The keep-k-smallest-random-keys scheme is the classic
  * bottom-k / order sample (Rosén 1997 "On sampling with probability
  * proportional to size"; Cohen & Kaplan, "Summarizing data using
  * bottom-k sketches", PODC 2007): with uniform keys it draws a
  * uniform sample without replacement, and because the k smallest of a
  * multiset are invariant to partitioning it is a mergeable summary in
  * the Agarwal et al. PODS 2012 sense.
  *
  * The window formulation (`row_number() OVER (PARTITION BY stratum
  * ORDER BY scrambled_key)` then `<= k`) is exact but pays a full
  * shuffle + per-stratum SORT of the corpus: at 100 TB with a handful
  * of strata, every row moves and each stratum's partition sorts
  * billions of rows to keep twenty. This Aggregator inverts that: each
  * input partition folds rows into an O(k) buffer holding the k
  * smallest (key, id) pairs, partials merge associatively (k-way
  * sorted-merge + truncate — the k smallest of a multiset do not
  * depend on arrival or merge order), and only |strata| × k pairs ever
  * ship. One corpus scan, map-side combine, no sort.
  *
  * With a DETERMINISTIC scramble key (e.g. the MINSTD permutation
  * `(id·48271 + 12821) mod 1000003`, id-tiebroken) the result is
  * byte-identical to the window formulation — a uniform-ish,
  * reproducible-across-engines sample that an exact SQL oracle can
  * check (q102 shares q63's oracle). With `xxhash64(id)` as the key it
  * is a true uniform random sample, reproducible across runs and
  * partitionings.
  *
  * Pair order is lexicographic SIGNED (key, id) — feed non-negative
  * keys (any `pmod` scramble) or accept Long order on hashes.
  */
object GroupSample {

  /** Sample result: ids ascending by (key, id) — i.e. in rank order. */
  case class Sample(ids: Seq[Long])

  /** Mutable buffer: parallel arrays of the `size` smallest pairs,
    * ascending by (key, id), multiset semantics (duplicate pairs kept,
    * matching `row_number`'s treatment of duplicate input rows). Lives
    * deserialized per partition run like [[HeavyHitters.MGBuf]];
    * Kryo-encoded when partials ship.
    */
  final class SampleBuf(val k: Int, var size: Int,
                        val keys: Array[Long], val ids: Array[Long])
    extends Serializable

  /** Index of the first slot whose pair is strictly greater than
    * (key, id) — insertion keeps equal pairs' relative order (multiset).
    */
  private def upperBound(b: SampleBuf, key: Long, id: Long): Int = {
    var lo = 0; var hi = b.size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val c = java.lang.Long.compare(b.keys(mid), key) match {
        case 0 => java.lang.Long.compare(b.ids(mid), id)
        case x => x
      }
      if (c <= 0) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Top-k result carrying BOTH halves of each kept pair, ascending by
    * (key, id). [[Sample]] drops the keys because a sample only needs
    * ids; a top-k-by-measure consumer (q119's whale audit) needs the
    * measure back to aggregate it.
    */
  case class Pairs(keys: Seq[Long], ids: Seq[Long])

  /** Keep the k smallest (key, id) pairs seen. Input is the pre-computed
    * (scrambleKey, id) tuple so the key arithmetic runs codegen'd in the
    * scan projection, not per-row in the aggregator.
    */
  class GroupSampleAgg(k: Int) extends Aggregator[(Long, Long), SampleBuf, Sample] {
    require(k > 0, s"GroupSample needs k > 0, got $k")

    def zero: SampleBuf =
      new SampleBuf(k, 0, new Array[Long](k), new Array[Long](k))

    def reduce(b: SampleBuf, in: (Long, Long)): SampleBuf = {
      val (key, id) = in
      val pos = upperBound(b, key, id)
      if (pos < b.k) {
        val move = math.min(b.size, b.k - 1) - pos
        if (move > 0) {
          System.arraycopy(b.keys, pos, b.keys, pos + 1, move)
          System.arraycopy(b.ids, pos, b.ids, pos + 1, move)
        }
        b.keys(pos) = key
        b.ids(pos) = id
        if (b.size < b.k) b.size += 1
      }
      b
    }

    def merge(a: SampleBuf, b: SampleBuf): SampleBuf = {
      if (b.size == 0) return a
      if (a.size == 0) {
        System.arraycopy(b.keys, 0, a.keys, 0, b.size)
        System.arraycopy(b.ids, 0, a.ids, 0, b.size)
        a.size = b.size
        return a
      }
      val n = math.min(a.k, a.size + b.size)
      val ok = new Array[Long](n); val oi = new Array[Long](n)
      var i = 0; var j = 0; var m = 0
      while (m < n) {
        val takeA =
          if (j >= b.size) true
          else if (i >= a.size) false
          else {
            val c = java.lang.Long.compare(a.keys(i), b.keys(j)) match {
              case 0 => java.lang.Long.compare(a.ids(i), b.ids(j))
              case x => x
            }
            c <= 0
          }
        if (takeA) { ok(m) = a.keys(i); oi(m) = a.ids(i); i += 1 }
        else { ok(m) = b.keys(j); oi(m) = b.ids(j); j += 1 }
        m += 1
      }
      System.arraycopy(ok, 0, a.keys, 0, n)
      System.arraycopy(oi, 0, a.ids, 0, n)
      a.size = n
      a
    }

    def finish(r: SampleBuf): Sample = Sample(r.ids.take(r.size).toVector)

    def bufferEncoder: Encoder[SampleBuf] = Encoders.kryo[SampleBuf]
    def outputEncoder: Encoder[Sample] = Encoders.product[Sample]
  }

  /** k smallest (key, id) pairs, keys included in the output — the
    * bounded replacement for `row_number() OVER (PARTITION BY g ORDER BY
    * measure DESC, id ASC) <= k` when the ranked frame itself is
    * corpus-sized (q119: per-user aggregates at 100 TB are ~10⁸-10⁹
    * rows landing in a handful of type partitions; this folds each
    * input partition to ≤ k pairs and ships |groups|·k rows). For a
    * DESCENDING measure feed `key = -measure`: the k smallest negated
    * keys are the k largest measures, ties broken by id ascending —
    * byte-identical to the window formulation (CurationSpec asserts it).
    */
  class TopPairsAgg(k: Int) extends Aggregator[(Long, Long), SampleBuf, Pairs] {
    private val inner = new GroupSampleAgg(k)
    def zero: SampleBuf = inner.zero
    def reduce(b: SampleBuf, in: (Long, Long)): SampleBuf = inner.reduce(b, in)
    def merge(a: SampleBuf, b: SampleBuf): SampleBuf = inner.merge(a, b)
    def finish(r: SampleBuf): Pairs =
      Pairs(r.keys.take(r.size).toVector, r.ids.take(r.size).toVector)
    def bufferEncoder: Encoder[SampleBuf] = Encoders.kryo[SampleBuf]
    def outputEncoder: Encoder[Pairs] = Encoders.product[Pairs]
  }
}
