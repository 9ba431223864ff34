package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the two slowest bench queries (q55, q33). */
object Q55Bench {
  def timed[T](tag: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    // --- q55 phases ---
    import graft.sources.Tables
    for (i <- 1 to 2) {
      val docs = Tables.documents(spark, sfDir).filter(col("doc_id") % 4 === 0)
      val pairs = graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.85)
      val nPairs = timed(s"q55.pairs run$i")(pairs.count())
      println(s"  pairs=$nPairs")
      val cached = pairs.cache(); cached.count()
      timed(s"q55.cluster(cached pairs) run$i") {
        graft.operators.Dedup.dedupClusters(cached, "id_a", "id_b").count()
      }
      cached.unpersist(blocking = true)
    }

    // --- q33 phases ---
    for (i <- 1 to 2) {
      val ev = graft.ml.FraudScorer.featurize(Tables.events(spark, sfDir))
      timed(s"q33.labels(report) run$i") {
        graft.pipeline.FraudMart.report(spark, sfDir).select("event_id").distinct().count()
      }
      val labels = graft.pipeline.FraudMart.report(spark, sfDir)
        .select(col("event_id")).distinct().withColumn("label", lit(1.0))
      val data = ev.join(labels, Seq("event_id"), "left")
        .withColumn("label", coalesce(col("label"), lit(0.0)))
      val assembler = new org.apache.spark.ml.feature.VectorAssembler()
        .setInputCols(Array("value", "k", "hour", "is_error", "is_purchase"))
        .setOutputCol("features")
      val assembled = assembler.transform(data)
        .select(col("event_id"), col("user_id"), col("label"), col("features"))
        .cache()
      timed(s"q33.assemble+cache run$i")(assembled.count())
      val lr = new org.apache.spark.ml.classification.LogisticRegression()
        .setMaxIter(10).setRegParam(0.01).setStandardization(true)
      val model = timed(s"q33.fit run$i")(lr.fit(assembled))
      timed(s"q33.transform run$i")(model.transform(assembled).count())
      assembled.unpersist(blocking = true)
    }
    spark.stop()
  }
}
