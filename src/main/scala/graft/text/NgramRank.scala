package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic global top-k over an n-gram count frame, with the
  * SURVEY §5 large-alphabet shard dial (`ngramRankShards`).
  *
  * The q177 rank runs `row_number` over a global (n DESC, gram ASC)
  * order on a frame bounded by |alphabet|ⁿ distinct grams — Catalyst
  * rewrites `rank <= k` into TakeOrderedAndProject (per-partition
  * top-k + a k-row merge), so for ASCII-scale alphabets the single
  * task only ever merges k rows. Past ~10⁴-char alphabets (CJK), the
  * bigram frame can reach ~10⁸ rows, and even per-partition top-k
  * wants its input pre-pruned: `shards > 1` first takes the top-k
  * WITHIN each first-char hash shard (a partitioned window — fully
  * parallel, no global order), then ranks the ≤ shards·k survivors
  * globally. The result is shard-count independent: every global
  * top-k gram is by definition within its own shard's top-k, so the
  * pre-prune can never drop a winner (NgramRankPropertySpec proves it
  * on a synthetic multi-thousand-char alphabet).
  *
  * `shards = 1` (the default) is byte-for-byte the current q177 plan.
  */
object NgramRank {

  /** Rank `grams` (any frame with a gram column and a count column) by
    * (count DESC, gram ASC) and keep the top `k`, appending a `rnk`
    * column. `shards` is the ngramRankShards dial described above.
    */
  def topK(grams: DataFrame, gramCol: String, nCol: String, k: Int,
           shards: Int = 1): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val pruned =
      if (shards == 1) grams
      else {
        // shard by the FIRST CHARACTER's hash: cheap, stable, and
        // balanced enough for natural-language gram distributions; the
        // partitioned window sorts each shard independently
        val shardOf: Column =
          pmod(hash(substring(col(gramCol), 1, 1)), lit(shards))
        val w = Window.partitionBy(shardOf)
          .orderBy(col(nCol).desc, col(gramCol))
        grams.withColumn("__shard_rnk", row_number().over(w))
          .filter(col("__shard_rnk") <= k)
          .drop("__shard_rnk")
      }
    pruned
      .withColumn("rnk",
        row_number().over(Window.orderBy(col(nCol).desc, col(gramCol)))
          .cast("long"))
      .filter(col("rnk") <= k)
  }
}
