package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Does the dedupIncrement verify ship its broadcast once or twice? */
object ProbeReuse {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.queries.DedupQueries.queries("q85_dedup_increment")(spark, dir)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    println("BroadcastExchange: " + "BroadcastExchange".r.findAllIn(plan).size)
    println("ReusedExchange: " + "ReusedExchange".r.findAllIn(plan).size)
    spark.stop()
  }
}
