package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-data step that flags corpus
  * documents sharing word n-grams with an evaluation set, so eval
  * examples (and their near-duplicates) can be excluded from training.
  *
  * Scale shape: eval sets are tiny against a 100 TB corpus, so the
  * eval-side n-gram dictionary is distinct-ed and BROADCAST; the corpus
  * side streams through one explode + broadcast hash join + per-doc
  * aggregation (map-side combinable). The corpus is never shuffled on
  * n-grams — the only wide op is the final groupBy(doc).
  */
object Decontaminate {

  /** One row per (id, ngram): whitespace word n-grams, lowercased.
    * Documents shorter than n words emit nothing (the sequence guard —
    * sequence(start > stop) DESCENDS in Spark and would emit junk).
    */
  def wordNgrams(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 1, "ngram size must be positive")
    val toks: Column = split(lower(trim(col(textCol))), "\\s+")
    df.select(col(idCol), toks.as("w"))
      .filter(size(col("w")) >= n)
      .select(col(idCol), explode(sequence(lit(1), size(col("w")) - (n - 1))).as("pos"),
        col("w"))
      .select(col(idCol), concat_ws(" ", slice(col("w"), col("pos"), lit(n))).as("ngram"))
  }

  /** Corpus documents contaminated by the eval set: for each corpus doc
    * sharing at least one word n-gram with ANY eval doc, the number of
    * distinct overlapping n-grams. Join the result back (left_semi /
    * left_anti on the id) to quarantine or drop flagged documents.
    */
  def overlapFlags(corpus: DataFrame, evalDocs: DataFrame, idCol: String,
                   textCol: String, n: Int): DataFrame = {
    val evalGrams = wordNgrams(evalDocs, idCol, textCol, n)
      .select("ngram").distinct()
    wordNgrams(corpus, idCol, textCol, n)
      .join(broadcast(evalGrams), Seq("ngram"))
      .groupBy(col(idCol))
      .agg(countDistinct(col("ngram")).as("n_contaminated"))
  }
}
