package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-set sketch — the mergeable summary
  * for DISTINCT-cardinality set algebra across dataset slices: union,
  * intersection, and Jaccard of distinct-key sets estimated from
  * O(k) state per slice (Bar-Yossef et al., "Counting distinct elements
  * in a data stream", RANDOM 2002; Beyer et al., SIGMOD 2007 for the
  * unbiased estimator and set operations).
  *
  * The sketch keeps the k smallest 64-bit hash values (unsigned order,
  * set semantics). Two regimes:
  *
  *  - BELOW CAPACITY (fewer than k distinct hashes seen): the sketch
  *    holds EVERY distinct hash — cardinalities and intersections are
  *    exact (modulo 64-bit hash collisions, ~n²/2⁶⁴). This is what makes
  *    sketch outputs oracle-checkable at test scale.
  *  - AT CAPACITY: distinct ≈ (k-1)/u_k where u_k is the k-th smallest
  *    hash normalized to [0,1) — relative error ~1/sqrt(k-2).
  *    Intersections use the standard combined-sketch estimate: from the
  *    k smallest of the UNION, the fraction present in both sides scales
  *    the union estimate.
  *
  * Merge is k-way sorted-merge + truncate — associative and
  * order-independent (the k smallest of a set do not depend on arrival
  * or merge order), so the Aggregator is safe under Spark's partial
  * aggregation. Inputs are PRE-HASHED longs: feed `xxhash64(col)` so
  * hashing runs codegen'd in the scan projection, not per-row in the
  * aggregator.
  */
object KmvSketch {

  /** Sketch result: capacity + the ascending (unsigned) minima. */
  case class KmvSummary(k: Int, mins: Seq[Long]) {

    private def unsignedFrac(h: Long): Double = {
      val d = if (h >= 0) h.toDouble else h.toDouble + 1.8446744073709552e19
      d / 1.8446744073709552e19
    }

    /** Distinct-count estimate — exact below capacity. */
    def distinct: Double =
      if (mins.size < k) mins.size.toDouble
      else (k - 1).toDouble / unsignedFrac(mins.last)

    /** Set algebra against another sketch with the same k: returns
      * (unionEstimate, intersectionEstimate). Below joint capacity both
      * are exact set counts.
      */
    def setOps(other: KmvSummary): (Double, Double) = {
      require(k == other.k, s"KMV sketches must share k: $k vs ${other.k}")
      val a = mins.toSet
      val b = other.mins.toSet
      val merged = (a ++ b).toSeq.sortBy(h => unsignedFrac(h))
      if (merged.size < k) {
        // both sides complete → exact
        (merged.size.toDouble, (a & b).size.toDouble)
      } else {
        val x = merged.take(k)
        val uK = unsignedFrac(x.last)
        val unionEst = (k - 1).toDouble / uK
        val inBoth = x.count(h => a.contains(h) && b.contains(h))
        (unionEst, inBoth.toDouble / k * unionEst)
      }
    }
  }

  /** Mutable buffer: `arr` holds `size` hashes in ascending UNSIGNED
    * order (set semantics — no duplicates). Capacity-bounded inserts are
    * binary-search + memmove, O(log k + k) worst case on k ≤ a few
    * thousand — trivial against scan cost. Kryo-encoded; lives
    * deserialized per partition like [[HeavyHitters.MGBuf]].
    */
  final class KmvBuf(val k: Int, var size: Int, val arr: Array[Long])
    extends Serializable

  private def uLt(a: Long, b: Long): Boolean =
    java.lang.Long.compareUnsigned(a, b) < 0

  /** Index of first element >= h (unsigned), within [0, size). */
  private def lowerBound(arr: Array[Long], size: Int, h: Long): Int = {
    var lo = 0; var hi = size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (uLt(arr(mid), h)) lo = mid + 1 else hi = mid
    }
    lo
  }

  class KmvAgg(k: Int) extends Aggregator[Long, KmvBuf, KmvSummary] {
    require(k >= 2, s"KMV needs k >= 2, got $k")

    def zero: KmvBuf = new KmvBuf(k, 0, new Array[Long](k))

    def reduce(b: KmvBuf, h: Long): KmvBuf = {
      val pos = lowerBound(b.arr, b.size, h)
      if (pos < b.size && b.arr(pos) == h) return b // already present
      if (b.size < b.k) {
        System.arraycopy(b.arr, pos, b.arr, pos + 1, b.size - pos)
        b.arr(pos) = h
        b.size += 1
      } else if (pos < b.k) {
        // h is smaller than the current k-th minimum — displace it
        System.arraycopy(b.arr, pos, b.arr, pos + 1, b.k - pos - 1)
        b.arr(pos) = h
      }
      b
    }

    def merge(a: KmvBuf, b: KmvBuf): KmvBuf = {
      if (b.size == 0) return a
      if (a.size == 0) { System.arraycopy(b.arr, 0, a.arr, 0, b.size); a.size = b.size; return a }
      val out = new Array[Long](a.k)
      var i = 0; var j = 0; var n = 0
      while (n < a.k && (i < a.size || j < b.size)) {
        val takeA =
          if (j >= b.size) true
          else if (i >= a.size) false
          else uLt(a.arr(i), b.arr(j)) || a.arr(i) == b.arr(j)
        val h = if (takeA) a.arr(i) else b.arr(j)
        if (takeA) { if (i < a.size && j < b.size && a.arr(i) == b.arr(j)) j += 1; i += 1 }
        else j += 1
        if (n == 0 || out(n - 1) != h) { out(n) = h; n += 1 }
      }
      System.arraycopy(out, 0, a.arr, 0, n)
      a.size = n
      a
    }

    def finish(r: KmvBuf): KmvSummary =
      KmvSummary(r.k, r.arr.take(r.size).toVector)

    def bufferEncoder: Encoder[KmvBuf] = Encoders.kryo[KmvBuf]
    def outputEncoder: Encoder[KmvSummary] = Encoders.product[KmvSummary]
  }

  /** Column-level distinct estimator over a KmvSummary struct column —
    * the same two-regime arithmetic as [[KmvSummary.distinct]], but as a
    * codegen-friendly expression so grouped/windowed sketch aggregations
    * can surface cardinalities without leaving the plan (e.g. the
    * streaming sliding-distinct scale path).
    */
  def distinctCol(sk: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val last = element_at(sk.getField("mins"), -1)
    val frac = (last.cast("double") / lit(1.8446744073709552e19)) +
      when(last < 0, lit(1.0)).otherwise(lit(0.0))
    when(size(sk.getField("mins")) < k,
      size(sk.getField("mins")).cast("double"))
      .otherwise(lit((k - 1).toDouble) / frac)
  }
}
