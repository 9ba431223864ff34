package graft

import org.apache.spark.sql.functions._

/** FraudScorer invariants — q33 is rows-only at the driver gate, so the
  * model contract is asserted here: full coverage, valid probabilities,
  * and better-than-chance separation on the rule-derived labels it was
  * trained on.
  */
class MlSpec extends SparkSpec {

  private lazy val scored = graft.ml.FraudScorer.score(spark, sf).cache()

  test("every event is scored exactly once") {
    val n = graft.sources.Tables.events(spark, sf).count()
    assert(scored.count() === n)
    assert(scored.select("event_id").distinct().count() === n)
  }

  test("probabilities are valid and labels binary") {
    assert(scored.filter(col("fraud_prob") < 0.0 || col("fraud_prob") > 1.0).isEmpty)
    assert(scored.filter(!col("label").isin(0.0, 1.0)).isEmpty)
    assert(scored.filter(!col("prediction").isin(0.0, 1.0)).isEmpty)
  }

  test("scores separate the training labels better than chance") {
    val byLabel = scored.groupBy("label")
      .agg(avg(col("fraud_prob")).as("mean_prob"))
      .collect().map(r => r.getAs[Double]("label") -> r.getAs[Double]("mean_prob"))
      .toMap
    assert(byLabel.keySet === Set(0.0, 1.0),
      s"both label classes must be present, got ${byLabel.keySet}")
    assert(byLabel(1.0) > byLabel(0.0),
      s"labeled-fraud mean prob ${byLabel(1.0)} must exceed clean ${byLabel(0.0)}")
  }
}
