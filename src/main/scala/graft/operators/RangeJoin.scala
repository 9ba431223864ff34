package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval/range join expressed in the only shape that scales: turn the
  * range predicate into an equi-join on a coarse time bucket, then apply
  * the precise `BETWEEN` as a post-join filter.
  *
  * A naive `points JOIN intervals ON ts BETWEEN start AND end` has no
  * equi-key, so Spark plans a broadcast-nested-loop (driver-limited) or a
  * cartesian product (O(n·m) at 100 TB). Bucketing makes the candidate
  * set per point proportional to the number of intervals overlapping its
  * bucket — for narrow intervals this is the inverted-index trick LSH
  * uses, applied to time.
  *
  * The reference's range predicates (trans_date BETWEEN effective_from
  * AND effective_to, trsh_rep_fraud_sync.sql:11-16) always come WITH an
  * equi-key (the client) — that case is [[Scd.asOfJoin]]. This operator
  * covers the keyless case (calendar windows, maintenance periods,
  * promo campaigns).
  */
object RangeJoin {

  /** Join `points` to every interval of `intervals` whose
    * [startCol, endCol] range contains `pointTs`.
    *
    * @param bucket a DATE_TRUNC unit ("week", "month", ...) — choose so
    *               a typical interval spans O(1) buckets; each interval
    *               row is exploded into one row per spanned bucket
    *               (metadata-sized for narrow intervals), while the big
    *               fact side maps each point to exactly ONE bucket.
    */
  def pointInInterval(points: DataFrame, pointTs: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucket: String): DataFrame = {
    // helper column must not clobber caller data silently
    val b = "__graft_bucket"
    require(!points.columns.contains(b) && !intervals.columns.contains(b),
      s"input already has a $b column")
    // Degenerate intervals (end < start) matched nothing in the naive
    // formulation but would make sequence() THROW — clamp the stop to
    // the start (one spurious bucket row) and let the exact BETWEEN
    // post-filter reject any match, preserving empty-result semantics.
    val exploded = intervals.withColumn(b,
      explode(sequence(
        date_trunc(bucket, col(startCol)),
        greatest(date_trunc(bucket, col(endCol)), date_trunc(bucket, col(startCol))),
        expr(s"INTERVAL 1 $bucket"))))
    points
      .withColumn(b, date_trunc(bucket, col(pointTs)))
      .join(exploded, Seq(b))
      .filter(col(pointTs) >= col(startCol) && col(pointTs) <= col(endCol))
      .drop(b)
  }
}
