package graft

import org.apache.spark.sql.functions._
import graft.streaming.StreamingFraud

class StreamingSpec extends SparkSpec {

  test("streaming windowed activity matches the batch result") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    // stage the events as a stream source (µs timestamps, stream-readable)
    val batchEvents = graft.sources.Tables.events(spark, sf).cache()
    batchEvents.write.mode("overwrite").parquet(dir)

    val stream = StreamingFraud.readEventStream(spark, dir)
    val q = StreamingFraud.windowedActivity(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_out")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("win_out")
      val batch = StreamingFraud.windowedActivity(batchEvents)
      assert(streamed.count() == batch.count())
      assert(streamed.exceptAll(batch).count() == 0)
    } finally q.stop()
  }

  test("streaming sessionization matches batch q37 on closed sessions") {
    val batchEvents = graft.sources.Tables.events(spark, sf)
    val streamed = StreamingFraud.sessionStream(batchEvents, gapMinutes = 30)
      .select(col("user_id"), col("session_start"), col("n_events")).cache()
    // batch sessions, excluding each user's final (still-open) session
    val batch = graft.queries.OlapQueries.q37(spark, sf)
    val lastSeq = batch.groupBy(col("user_id").as("u"))
      .agg(max("session_seq").as("last_seq"))
    val closed = batch.join(lastSeq,
        batch("user_id") === col("u") && batch("session_seq") === col("last_seq"),
        "left_anti")
      .select(col("user_id"), col("session_start"), col("n_events"))
    assert(streamed.count() == closed.count())
    assert(streamed.exceptAll(closed).count() == 0)
  }

  test("streaming dedup covers exactly the distinct key set") {
    val batchEvents = graft.sources.Tables.events(spark, sf)
    val streamed = StreamingFraud.dedupStream(batchEvents)
    val expected = batchEvents.select("user_id", "event_type").distinct().count()
    assert(streamed.count() == expected)
  }

  test("stateful velocity stream flags location changes within an hour") {
    val batchEvents = graft.sources.Tables.events(spark, sf)
    val flags = StreamingFraud.velocityStream(batchEvents).cache()
    val expected = graft.pipeline.FraudMart.r3Velocity(spark, sf).count()
    assert(flags.count() == expected,
      s"stateful path found ${flags.count()} flags, window path $expected")
  }
}
