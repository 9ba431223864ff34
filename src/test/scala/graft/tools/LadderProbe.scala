package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object LadderProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.documents(spark, dir)
    val sh = graft.functions.TextFunctions.wordNgrams(docs, "doc_id", "text", 4)
    val dfFreq = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    val rungs = Seq(64L, 256L, 1024L, 4096L, 16384L, 65536L, 262144L, 1048576L)
    val aggs = rungs.map(c => sum(when(col("df") <= c, expr("(df*(df-1)) DIV 2")).otherwise(0L)).as(s"m$c")) ++
      rungs.map(c => max(when(col("df") <= c, col("df"))).as(s"x$c")) :+
      count(lit(1)).as("n_shingles") :+ sum(col("df")).as("postings")
    val row = dfFreq.agg(aggs.head, aggs.tail: _*).head()
    // empty corpus: sum aggregates return null (the product code's
    // isNullAt guard, mirrored here)
    def lng(i: Int): Long = if (row.isNullAt(i)) 0L else row.getLong(i)
    rungs.zipWithIndex.foreach { case (c, i) =>
      println(s"LADDER cap=$c mass=${lng(i)} admittedMax=${lng(rungs.length + i)}") }
    println(s"SHINGLES ${lng(2 * rungs.length)} POSTINGS ${lng(2 * rungs.length + 1)}")
    spark.stop()
  }
}
