package graft.ml

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** MLlib fraud classifier (BASELINE.json: "DataFrame ops + MLlib
  * classification").
  *
  * Features are cheap event-level signals (amount, hour-of-day, location
  * id, error flag); labels come from the rule-based mart — the classic
  * bootstrap: rules label history, the model generalizes. Training is
  * seeded and single-pass deterministic.
  */
object FraudScorer {

  def featurize(events: DataFrame): DataFrame =
    events
      // null-safe: missing props.$.k / null value must not crash the
      // assembler (handleInvalid="error") on data with gaps
      .withColumn("value", coalesce(col("value").cast("double"), lit(0.0)))
      .withColumn("k", coalesce(get_json_object(col("props"), "$.k").cast("double"), lit(0.0)))
      .withColumn("hour", coalesce(hour(col("ts")).cast("double"), lit(0.0)))
      .withColumn("is_error", when(col("event_type") === "error", 1.0).otherwise(0.0))
      .withColumn("is_purchase", when(col("event_type") === "purchase", 1.0).otherwise(0.0))

  /** Train on rule-labeled events, emit per-event fraud probability.
    *
    * The labeled+assembled training set is cached once: the label join
    * replays the 4-rule mart plan (4 window shuffles), and both lr.fit's
    * iterative passes and the final transform would otherwise recompute
    * it from the parquet scan each time.
    *
    * TRAINING is capped at `trainSampleCap` rows via a seeded uniform
    * sample (same reasoning as the IVF quantizer fit): lr's maxIter
    * passes need a representative sample, not 100 TB of facts, and only
    * the capped sample is cached — the full-corpus work stays a single
    * streaming transform pass. Below the cap nothing changes.
    */
  def score(s: SparkSession, dir: String,
            trainSampleCap: Long = 1000000L): DataFrame = {
    val ev = featurize(Tables.events(s, dir))
    val labels = graft.pipeline.FraudMart.report(s, dir)
      .select(col("event_id")).distinct().withColumn("label", lit(1.0))
    val data = ev.join(labels, Seq("event_id"), "left")
      .withColumn("label", coalesce(col("label"), lit(0.0)))
    val assembler = new VectorAssembler()
      .setInputCols(Array("value", "k", "hour", "is_error", "is_purchase"))
      .setOutputCol("features")
    val assembled = assembler.transform(data)
      .select(col("event_id"), col("user_id"), col("label"), col("features"))
    // cached, not unpersisted here: the returned DataFrame is lazy and
    // still reads the cache when the caller executes it; Spark evicts
    // LRU under memory pressure.
    // Cardinality comes from the raw parquet count (footer-cheap) — the
    // left join against distinct labels preserves it — so sizing the
    // sample never replays the 4-window mart plan. Below the cap, train
    // IS assembled, so caching it gives the final transform a cache hit
    // on the same plan (the pre-cap behavior, unchanged).
    val n = Tables.events(s, dir).count()
    val train = (if (n <= trainSampleCap) assembled
                 else assembled.sample(withReplacement = false,
                   trainSampleCap.toDouble / n, seed = 42L)).cache()
    val lr = new LogisticRegression()
      .setMaxIter(10).setRegParam(0.01).setStandardization(true)
    val model = lr.fit(train)
    model.transform(assembled)
      .select(col("event_id"), col("user_id"), col("label"),
        col("prediction"),
        round(element_at(vector_to_array(col("probability")), 2), 6).as("fraud_prob"))
  }
}
