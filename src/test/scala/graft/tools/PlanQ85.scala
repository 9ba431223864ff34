package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: print the FINAL adaptive plans of q72 and q85 after
  * execution at the given SF, to diff their verify-join strategies.
  */
object PlanQ85 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("q72_dedup_lsh_verified", "q85_dedup_increment").foreach { q =>
      val df = graft.queries.DedupQueries.queries(q)(spark, sfDir)
      df.count()
      println(s"===== $q FINAL PLAN =====")
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") ||
          l.contains("Aggregate") || l.contains("InMemory") || l.contains("AQE"))
        .mkString("\n"))
    }
    spark.stop()
  }
}
