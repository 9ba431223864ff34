package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured-Streaming face of the engine: the same transforms that run
  * in batch (q32's windowed activity, the fraud rules) applied to a
  * `readStream` source with watermarking.
  *
  * The transform is *shared* between batch and stream — one definition,
  * two execution modes — which is the Spark-native answer to the
  * reference's "daily batch that should have been a stream".
  */
object StreamingFraud {

  /** Schema of the events stream (ts already µs). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Tumbling-window activity rollup — valid on both batch and streaming
    * DataFrames (append mode once a watermark is set).
    */
  def windowedActivity(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Streaming source over a directory of parquet event files, watermarked
    * for state cleanup (10 min lateness — at scale this bounds the window
    * state store regardless of input volume).
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(eventSchema)
      .parquet(dir)
      .withWatermark("ts", "10 minutes")

  /** Per-user stateful velocity flagging via flatMapGroupsWithState:
    * emits (user_id, ts, k, prv_k) whenever consecutive events land in
    * different locations within an hour — the streaming twin of
    * FraudMart.r3Velocity.
    */
  case class Flag(user_id: Long, ts: java.sql.Timestamp, k: Int, prv_k: Int)
  case class St(ts: Long, k: Int)

  def velocityStream(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val flagEnc = Encoders.product[Flag]
    val stEnc = Encoders.product[St]
    val withK = events
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .select(col("user_id"), col("ts"), col("k"), col("event_id"))
    withK.as[(Long, java.sql.Timestamp, Int, Long)](
        Encoders.tuple(Encoders.scalaLong, Encoders.TIMESTAMP, Encoders.scalaInt,
          Encoders.scalaLong))
      .groupByKey(_._1)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Int, Long)],
         state: GroupState[St]) => {
          // sort by (ts, event_id) — the SAME total order as the batch
          // twin's Window.orderBy(ts, event_id), so timestamp ties cannot
          // make the two paths diverge
          val sorted = rows.toSeq.sortBy(r => (r._2.getTime, r._4))
          val out = scala.collection.mutable.ArrayBuffer[Flag]()
          var prev = state.getOption
          sorted.foreach { case (_, ts, k, _) =>
            prev.foreach { p =>
              if (p.k != k && ts.getTime < p.ts + 3600L * 1000L)
                out += Flag(user, ts, k, p.k)
            }
            prev = Some(St(ts.getTime, k))
          }
          prev.foreach(state.update)
          out.iterator
        })(stEnc, flagEnc)
      .toDF()
  }
}
