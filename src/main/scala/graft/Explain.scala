package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan of one query (or all)
  * — used to confirm filter/projection pushdown, broadcast joins, and
  * whole-stage codegen coverage per SURVEY.md §5.
  *
  * Usage: runMain graft.Explain [queryName] [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("all")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val targets =
      if (name == "all") SparkEntry.queries.toSeq.sortBy(_._1)
      else SparkEntry.queries.filter(_._1 == name).toSeq
    targets.foreach { case (n, fn) =>
      println(s"\n===== $n =====")
      try fn(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
