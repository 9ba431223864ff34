package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: print q120's optimized logical plan under the PlanLintSpec
  * session shape (4 shuffle partitions, sf0.001, fresh cache) to see
  * where the lint's Aggregate/InMemoryRelation probe looks.
  */
object ProbeQ120Plan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.catalog.clearCache()
    val df = graft.SparkEntry.queries("q120_mad_outliers")(spark, "/root/testdata/sf0.001")
    println(df.queryExecution.optimizedPlan.treeString)
    spark.stop()
  }
}
