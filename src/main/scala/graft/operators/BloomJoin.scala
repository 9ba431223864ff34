package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BloomFunctions

/** Bloom-prefiltered semi-join — the hand-rolled runtime filter.
  *
  * The reference expresses membership checks as SQL EXISTS against a dim
  * table (trsh_rep_fraud_sync.sql:14-22); at 100 TB the cost of that
  * semi-join is dominated by shuffling every fact row that will NOT
  * match. This operator builds a [[org.apache.spark.util.sketch
  * .BloomFilter]] over the dim keys (one distributed aggregation over
  * the SMALL side, `df.stat.bloomFilter`), pre-filters the fact table
  * map-side with a codegen'd probe ([[BloomFunctions.mightContainLong]])
  * so non-matching rows die before any exchange, then removes the
  * bloom's false positives with the exact semi-join — whose input is now
  * only `|matches| + fpp·|facts|` rows. The result is row-for-row equal
  * to the plain semi-join (false negatives are impossible), which
  * q83's oracle and JoinSpec both assert.
  *
  * Spark injects a similar filter itself only when
  * `spark.sql.optimizer.runtime.bloomFilter.enabled` finds a selective
  * build side under a shuffle join; this operator makes the pattern an
  * explicit, always-on primitive with a caller-chosen fpp.
  */
object BloomJoin {

  /** `facts` rows whose `factKey` appears in `dim.dimKey` — equal to
    * `facts.join(dim, factKey === dimKey, "left_semi")`, but with the
    * bloom prefilter ahead of the exchange.
    *
    * @param expectedDimKeys sizes the filter (n·ln(1/fpp)/ln²2 bits);
    *        overshooting wastes a few KB, undershooting raises fpp —
    *        never correctness.
    */
  def semiJoin(facts: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
               expectedDimKeys: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val bloom = dim.stat.bloomFilter(dimKey, expectedDimKeys, fpp)
    facts
      .filter(BloomFunctions.mightContainLong(col(factKey), bloom))
      .join(dim.select(col(dimKey).as(factKey)), Seq(factKey), "left_semi")
      // a using-column join surfaces the key first; callers get the
      // fact table's own column order back
      .select(facts.columns.map(col).toIndexedSeq: _*)
  }

  /** The prefilter alone (bloom hits including false positives) —
    * exposed for JoinSpec to assert the filter actually prunes.
    */
  def bloomHits(facts: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
                expectedDimKeys: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val bloom = dim.stat.bloomFilter(dimKey, expectedDimKeys, fpp)
    facts.filter(BloomFunctions.mightContainLong(col(factKey), bloom))
  }
}
