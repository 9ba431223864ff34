package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed loaders for the driver-generated parquet tables.
  *
  * Mirrors the reference's source surface (PostgreSQL tables + flat
  * files, see /root/reference/main.py:8-14) re-expressed as parquet
  * scans so Catalyst can push filters/projections into the scan.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS). Spark's
    * vectorized reader has no nanos TimestampType; the legacy conf
    * `spark.sql.legacy.parquet.nanosAsLong` (set once at session build in
    * Verify/Bench/Explain/SparkSpec — NOT mutated here, so concurrent
    * query construction and unrelated parquet reads are unaffected) reads
    * the raw int64 nanos, which we convert to a microsecond timestamp
    * (all driver-generated values are microsecond-aligned, so this is
    * lossless and matches DuckDB's view of the same file).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      // integer division — `/` on longs is double division and loses
      // precision at 10^18 nanoseconds (1µs drift)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
}
