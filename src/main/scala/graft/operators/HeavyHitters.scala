package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Misra-Gries frequent-items sketch as a typed [[Aggregator]] — the
  * mergeable-summary path to heavy hitters at 100 TB.
  *
  * The naive heavy-hitter query (`GROUP BY token HAVING count >= s·n`)
  * shuffles EVERY distinct token — at open-vocabulary corpus scale the
  * shuffle carries billions of singleton keys to find a handful of hot
  * ones. The sketch inverts that: each partition maintains at most
  * `width` counters, partials merge associatively (Agarwal et al.,
  * "Mergeable Summaries", PODS 2012), and only the O(width) summary ever
  * moves. One corpus scan, shuffle traffic = width entries per partition.
  *
  * Guarantee (classic Misra-Gries): after summarizing n tokens, every
  * item with true frequency > n/(width+1) is present in the summary, and
  * each stored count underestimates the true count by at most
  * n/(width+1). So for a share threshold s, width >= 1/s - 1 makes the
  * candidate set a guaranteed SUPERSET of the true heavy hitters — an
  * exact recount of just the candidates (broadcast-pruned second pass)
  * then yields the EXACT answer. That two-pass shape is
  * [[HeavyHitters.exact]], and is oracle-checkable against plain
  * GROUP BY / HAVING (q100).
  *
  * The summary also carries `n` (total tokens seen) so the threshold
  * `floor(s·n)` costs no extra corpus pass.
  */
object HeavyHitters {

  /** Sketch result: total stream length + candidate lower-bound counts
    * (at most `width` entries).
    */
  case class MGSummary(n: Long, counts: Map[String, Long])

  /** Mutable aggregation state. Typed-aggregator buffers live
    * DESERIALIZED for a partition's whole run (serialization happens
    * only when partials ship), so in-place mutation is the intended
    * pattern — an immutable buffer would rebuild an O(width) map per
    * token. Kryo-encoded: the partial that ships is one small object.
    */
  final class MGBuf(var n: Long, val counts: mutable.Map[String, Long])
    extends Serializable

  /** The Misra-Gries update/merge as a typed Aggregator over a token
    * Dataset. `reduce` is the textbook decrement-on-overflow update,
    * `merge` the pointwise sum followed by subtracting the
    * (width+1)-largest count — both keep the n/(width+1) error bound
    * additive across partials (PODS 2012, Thm 1).
    */
  class MisraGries(width: Int) extends Aggregator[String, MGBuf, MGSummary] {
    require(width > 0, s"MisraGries width must be positive, got $width")

    def zero: MGBuf = new MGBuf(0L, mutable.Map.empty)

    def reduce(b: MGBuf, tok: String): MGBuf = {
      // null tokens are IGNORED (not counted toward n): a null map key
      // would NPE the sorted candidate pass and fail Catalyst's map
      // encoder ("Cannot use null as map key") in streaming output
      if (tok == null) return b
      val m = b.counts
      m.get(tok) match {
        case Some(c) => m(tok) = c + 1
        case None if m.size < width => m(tok) = 1L
        case None =>
          // decrement-all: amortized O(1) per token — each decrement
          // "spends" width+1 previously-counted tokens
          m.mapValuesInPlace((_, c) => c - 1)
          m.filterInPlace((_, c) => c > 0)
      }
      b.n += 1
      b
    }

    def merge(a: MGBuf, b: MGBuf): MGBuf = {
      val m = a.counts
      b.counts.foreach { case (t, c) => m(t) = m.getOrElse(t, 0L) + c }
      if (m.size > width) {
        // subtract the (width+1)-th largest count from everything and
        // drop the non-positive rest — the merged summary keeps at most
        // `width` counters and the error bounds add
        val d = m.values.toIndexedSeq.sorted(Ordering[Long].reverse)(width)
        m.mapValuesInPlace((_, c) => c - d)
        m.filterInPlace((_, c) => c > 0)
      }
      a.n += b.n
      a
    }

    def finish(r: MGBuf): MGSummary = MGSummary(r.n, r.counts.toMap)

    def bufferEncoder: Encoder[MGBuf] = Encoders.kryo[MGBuf]
    def outputEncoder: Encoder[MGSummary] = Encoders.product[MGSummary]
  }

  /** EXACT heavy hitters (tokens with count >= floor(share·n)) via the
    * two-pass sketch-then-recount plan:
    *
    *  1. one scan folds the token column into a width-bounded
    *     [[MisraGries]] summary (no token-keyed shuffle at all — the
    *     only aggregation state is the O(width) map);
    *  2. the candidate set (driver-side, <= width strings — metadata
    *     sized) prunes the recount scan with `isInCollection`, so the
    *     exact GROUP BY shuffles only candidate tokens.
    *
    * Requires share > 1/(width+1), otherwise the superset guarantee
    * fails and the recount could MISS a true heavy hitter — enforced
    * loudly.
    *
    * `tokens` must be a single string column. Output: (tok, cnt), the
    * exact count of every token at or above the threshold — identical to
    * the full GROUP BY / HAVING regardless of how the sketch's
    * partition-dependent candidate set varies, because that set is
    * always a superset of the answer.
    */
  def exact(tokens: DataFrame, share: Double, width: Int = 1999): DataFrame = {
    require(share > 1.0 / (width + 1),
      s"share=$share <= 1/(width+1)=${1.0 / (width + 1)}: the Misra-Gries " +
        "candidate set would not be a superset of the true heavy hitters; " +
        "raise width or the share threshold")
    val colName = tokens.schema.fields match {
      case Array(f) => f.name
      case other => throw new IllegalArgumentException(
        s"HeavyHitters.exact expects a single token column, got ${other.map(_.name).mkString(",")}")
    }
    import tokens.sparkSession.implicits._
    // null tokens are ignored in both passes (and by MisraGries.reduce)
    val nonNull = tokens.filter(col(colName).isNotNull)
    val ds = nonNull.select(col(colName).cast("string")).as[String]
    val summary = ds.select(new MisraGries(width).toColumn).head()
    val threshold = math.max(1L, math.floor(share * summary.n).toLong)
    // the REAL-valued guard above is necessary but not sufficient:
    // floor can land the integer threshold exactly ON n/(width+1),
    // where Misra-Gries no longer guarantees candidate membership
    // (e.g. width=1, share=0.51, n=4: floor(2.04)=2 = 4/2). Enforce
    // the superset condition on the integer threshold itself.
    require(threshold.toDouble * (width + 1) > summary.n.toDouble,
      s"threshold=$threshold (floor($share * ${summary.n})) is not strictly " +
        s"above n/(width+1)=${summary.n.toDouble / (width + 1)}: the candidate " +
        "set may miss a true heavy hitter; raise width or share")
    val cands = summary.counts.keys.toSeq.sorted
    nonNull.filter(col(colName).isInCollection(cands))
      .groupBy(col(colName).as("tok"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
      .select(col("tok"), col("cnt"))
  }
}
