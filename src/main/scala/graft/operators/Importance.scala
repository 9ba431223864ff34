package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance scoring for domain-targeted data selection
  * (Xie et al. 2023, "Data Selection for Language Models via
  * Importance Resampling"): score every document by how much more
  * likely its bigram features are under a TARGET domain than under the
  * raw corpus, Σ_feat [ln p_target(f) − ln p_corpus(f)], add-1
  * smoothed over a bounded feature vocabulary.
  *
  * Scale shape: the (feat, ct, cr) model is a ≤ vocabSize frame built
  * from one bigram-count shuffle (the vocab cut is TakeOrdered — ties
  * broken lexicographically, a total order — and target counts join
  * the vocab frame), broadcast with its scalar totals back over the
  * bigram stream; scoring is map-side plus one per-doc aggregation.
  * The corpus is scanned twice (model, then score) and never joined to
  * itself — at 100 TB caching the corpus-sized bigram stream is the
  * wrong trade, two scans is the answer.
  *
  * Compare surface: FLOOR fixed-point micro-units (LN pipeline, the
  * q114 contract). Documents containing no vocab bigram carry no
  * evidence and are ABSENT from the output — the caller decides their
  * fate (q158 reports scored docs; the curation gate drops them).
  */
object Importance {

  /** (idCol, n_feats, score_micro) for every document with ≥ 1 vocab
    * bigram. `isTarget` marks the target-domain rows of `docs`.
    */
  def dsirScore(docs: DataFrame, idCol: String, textCol: String,
                isTarget: Column, vocabSize: Int): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    val bg = graft.functions.TextFunctions.wordBigrams(docs, idCol, textCol)
      .withColumn("feat", concat_ws(" ", col("tok_a"), col("tok_b")))
      .select(idCol, "feat")
    val cr = bg.groupBy("feat").agg(count(lit(1)).as("cr"))
    val vocab = cr.orderBy(col("cr").desc, col("feat").asc).limit(vocabSize)
    val tgtIds = docs.filter(isTarget).select(idCol)
    val ct = bg.join(tgtIds, idCol).groupBy("feat").agg(count(lit(1)).as("ct"))
    val model = vocab.join(ct, Seq("feat"), "left")
      .select(col("feat"), col("cr"), coalesce(col("ct"), lit(0L)).as("ct"))
    val totals = model.agg(sum("cr").as("nr"), sum("ct").as("nt"))
    bg.join(broadcast(model), "feat")
      .crossJoin(broadcast(totals))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_feats"),
        floor(lit(1e6) * sum(
          expr(s"LN((ct + 1) / (nt + $vocabSize)) - LN((cr + 1) / (nr + $vocabSize))")))
          .cast("long").as("score_micro"))
  }
}
