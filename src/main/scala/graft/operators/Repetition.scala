package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Intra-document repetition signals (Gopher-style quality rules):
  * repeated word n-grams inside a single document are the classic
  * symptom of boilerplate / generated spam, and "fraction of n-gram
  * occurrences that are repeats" plus "mass of the single most common
  * n-gram" are the standard curation thresholds.
  *
  * Scale shape: one explode over the corpus, a partial-aggregable
  * groupBy (doc, ngram), then a per-doc agg. No broadcast, no cross
  * join, no driver state — linear in corpus size, the map-side combine
  * absorbs the explode fan-out before the shuffle.
  */
object Repetition {

  /** Per-document n-gram repetition stats: total n-gram occurrences,
    * distinct n-grams, `dup_frac` = fraction of occurrences that are
    * repeats (1 - distinct/total), `top_frac` = mass of the most
    * frequent n-gram. Documents shorter than n words emit nothing
    * (they have no n-grams to judge).
    */
  def ngramStats(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    Decontaminate.wordNgrams(df, idCol, textCol, n)
      .groupBy(col(idCol), col("ngram"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(
        sum("c").as("n_grams"),
        count(lit(1)).as("n_distinct"),
        max("c").as("top_count"))
      .select(col(idCol), col("n_grams"), col("n_distinct"), col("top_count"),
        ((col("n_grams") - col("n_distinct")).cast("double") /
          col("n_grams").cast("double")).as("dup_frac"),
        (col("top_count").cast("double") /
          col("n_grams").cast("double")).as("top_frac"))
}
