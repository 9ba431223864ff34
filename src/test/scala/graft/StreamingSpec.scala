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

  test("stateful velocity stream flags location changes within an hour") {
    val batchEvents = graft.sources.Tables.events(spark, sf)
    val flags = StreamingFraud.velocityStream(batchEvents).cache()
    val expected = graft.pipeline.FraudMart.r3Velocity(spark, sf).count()
    assert(flags.count() == expected,
      s"stateful path found ${flags.count()} flags, window path $expected")
  }
}
