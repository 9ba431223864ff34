package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Sink/round-trip helpers covering the formats the engine reads and
  * writes. At 100 TB the parquet writers matter most: partitioned layout
  * for pruning, bucketed layout for shuffle-free joins on the bucket
  * key.
  */
object Sinks {

  def writeParquet(df: DataFrame, path: String,
                   partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** Bucketed + sorted table: joins/aggregations on `bucketCols` against
    * another table bucketed the same way need no shuffle at all —
    * the co-located join layout for repeated fact⋈fact work.
    * (Bucketing requires saveAsTable — a metastore table, not a path.)
    */
  def writeBucketedTable(df: DataFrame, table: String, buckets: Int,
                         bucketCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  def writeCsv(df: DataFrame, path: String, sep: String = ";"): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("sep", sep).option("header", "true").csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readBack(spark: SparkSession, path: String, format: String): DataFrame =
    format match {
      case "csv" => spark.read.option("sep", ";").option("header", "true")
        .option("inferSchema", "true").csv(path)
      case other => spark.read.format(other).load(path)
    }
}
