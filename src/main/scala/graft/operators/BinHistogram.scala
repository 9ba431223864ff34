package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Fixed-width bin histogram as a mergeable summary — the smallest
  * member of the summary family (KmvSketch / HeavyHitters /
  * QuantileSummary): per-group state is exactly `nBins` longs with an
  * elementwise-add merge, so the shuffle carries O(bins) per group
  * regardless of group volume, and the result is EXACT (binning is a
  * pure function of the value — no estimation regime at all).
  *
  * This is the state machine q112's drift monitor needs as a stream:
  * the per-(window, type) streaming aggregation state is one histogram,
  * not the window's value set. See StreamingFraud.driftStream.
  */
object BinHistogram {

  /** n = total count folded in; bins = per-bin counts (Σ bins = n). */
  case class HistSummary(n: Long, bins: Seq[Long])

  /** Input: the PRE-COMPUTED bin index of a value (binning stays in the
    * codegen'd projection outside the udaf; the aggregator only counts).
    * Out-of-range indices clamp to the edge bins, mirroring q112's
    * `least(floor(value/width), nBins-1)` edge semantics.
    */
  class HistAgg(nBins: Int) extends Aggregator[Long, Array[Long], HistSummary] {
    require(nBins >= 2 && nBins <= 65536,
      s"bin count must be in [2, 65536], got $nBins — per-group state is nBins longs")

    def zero: Array[Long] = new Array[Long](nBins)

    def reduce(b: Array[Long], bin: Long): Array[Long] = {
      val i = if (bin < 0L) 0 else if (bin >= nBins) nBins - 1 else bin.toInt
      b(i) += 1L
      b
    }

    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < nBins) { a(i) += b(i); i += 1 }
      a
    }

    def finish(r: Array[Long]): HistSummary = HistSummary(r.sum, r.toIndexedSeq)

    def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
    def outputEncoder: Encoder[HistSummary] = Encoders.product[HistSummary]
  }
}
