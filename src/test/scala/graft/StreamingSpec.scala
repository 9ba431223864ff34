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

  test("streaming hot-user sketch honors the Misra-Gries guarantees per window") {
    val width = 15
    val dir = java.nio.file.Files.createTempDirectory("graft_hh").toString
    graft.sources.Tables.events(spark, sf).write.mode("overwrite").parquet(dir)

    val stream = StreamingFraud.readEventStream(spark, dir)
    val q = StreamingFraud.hotUsersSketch(stream, width)
      .writeStream.outputMode("complete")
      .format("memory").queryName("hh_out")
      .start()
    try {
      q.processAllAvailable()
      val sketch = spark.table("hh_out").cache()
      assert(sketch.count() > 0)
      // summary stays width-bounded per window
      val oversize = sketch.groupBy("window_start")
        .agg(count(lit(1)).as("m")).filter(col("m") > width)
      assert(oversize.isEmpty)
      // exact per-(window,user) counts from the batch side
      val exact = graft.sources.Tables.events(spark, sf)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("user_id"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("w.start").as("window_start"),
          col("user_id").cast("string").as("user_id"), col("cnt"))
        .cache()
      // superset guarantee: every key with cnt > n_events/(width+1) is
      // present in the streamed sketch for its window
      val bounds = sketch.groupBy("window_start").agg(max("n_events").as("n"))
      val mustHave = exact.join(bounds, Seq("window_start"))
        .filter(col("cnt") > col("n") / (width + 1))
      val missing = mustHave.join(sketch.select("window_start", "user_id"),
        Seq("window_start", "user_id"), "left_anti")
      assert(missing.isEmpty, "a guaranteed heavy hitter is missing from the sketch")
      // count bounds: lb_count <= exact, and within n/(width+1) of exact
      val joined = sketch.join(exact, Seq("window_start", "user_id"))
      assert(joined.filter(col("lb_count") > col("cnt")).isEmpty,
        "sketch count must be a lower bound")
      assert(joined.filter(col("lb_count") < col("cnt") - col("n_events") / (width + 1)).isEmpty,
        "sketch count must be within n/(width+1) of exact")
      sketch.unpersist(blocking = false); exact.unpersist(blocking = false)
    } finally q.stop()
  }

  test("sliding-distinct sketch twin equals exact q98 below capacity") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sdsk").toString
    graft.sources.Tables.events(spark, sf).write.mode("overwrite").parquet(dir)
    val stream = StreamingFraud.readEventStream(spark, dir)
    val q = StreamingFraud.slidingDistinctSketch(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("sdsk_out")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sdsk_out")
      val batch = graft.queries.CorpusQueries.q98(spark, sf)
      assert(streamed.count() == batch.count())
      assert(streamed.exceptAll(batch).count() == 0,
        "below sketch capacity the estimate must BE the exact count")
    } finally q.stop()
  }

  test("streaming windowed quantile sketch equals batch and exact ranks below capacity") {
    val dir = java.nio.file.Files.createTempDirectory("graft_qsk").toString
    val batchEvents = graft.sources.Tables.events(spark, sf)
    batchEvents.write.mode("overwrite").parquet(dir)
    val stream = StreamingFraud.readEventStream(spark, dir)
    val q = StreamingFraud.valueQuantilesStream(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("qsk_out")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("qsk_out").cache()
      val batch = StreamingFraud.valueQuantilesStream(batchEvents)
      assert(streamed.count() > 0 && streamed.count() == batch.count())
      assert(streamed.exceptAll(batch).count() == 0,
        "below capacity the summary is merge-order independent — stream must equal batch")
      // ...and both must BE the exact type-1 order statistics
      val exact = batchEvents.filter(col("value").isNotNull)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(sort_array(collect_list(col("value"))).as("vs"),
          count(lit(1)).as("n"))
        .select(col("w.start").as("window_start"), col("event_type"),
          element_at(col("vs"), expr("CAST((50*n + 99) DIV 100 AS INT)")).as("e50"),
          element_at(col("vs"), expr("CAST((95*n + 99) DIV 100 AS INT)")).as("e95"))
      val mismatch = streamed.join(exact, Seq("window_start", "event_type"))
        .filter(col("p50") =!= col("e50") || col("p95") =!= col("e95"))
      assert(mismatch.isEmpty, "sketch quantiles must equal exact ranks below capacity")
      streamed.unpersist(blocking = false)
    } finally q.stop()
  }

  test("streaming sliding distinct matches batch q98 row-for-row") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sdist").toString
    val batchEvents = graft.sources.Tables.events(spark, sf)
    batchEvents.write.mode("overwrite").parquet(dir)

    val stream = StreamingFraud.readEventStream(spark, dir)
    val q = StreamingFraud.slidingDistinctUsers(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("sdist_out")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sdist_out")
      val batch = graft.queries.CorpusQueries.q98(spark, sf)
      assert(streamed.count() == batch.count())
      assert(streamed.exceptAll(batch).count() == 0)
      // and the shared transform IS q98 when run in batch mode
      val asBatch = StreamingFraud.slidingDistinctUsers(batchEvents)
      assert(asBatch.exceptAll(batch).count() == 0)
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

  test("event-time timeout closes idle sessions once the watermark passes") {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val sparkStable = spark
    import sparkStable.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sess_stream").toString
    def write(rows: Seq[(Long, String, Long)]): Unit =
      rows.toDF("event_id", "ts_s", "user_id")
        .select(col("event_id"), col("ts_s").cast("timestamp").as("ts"),
          col("user_id"), lit("click").as("event_type"),
          lit(1.0).as("value"), lit("{}").as("props"))
        .coalesce(1).write.mode("append").parquet(dir)

    // user 1: two events 10:00 / 10:05 — one session, then goes idle
    write(Seq((1L, "2024-01-01 10:00:00", 1L), (2L, "2024-01-01 10:05:00", 1L)))

    val q = graft.streaming.StreamingFraud.sessionStream(
        graft.streaming.StreamingFraud.readEventStream(spark, dir),
        gapMinutes = 30, timeout = GroupStateTimeout.EventTimeTimeout)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      q.processAllAvailable()
      assert(spark.table("sess_out").isEmpty, "session still open before watermark")
      // user 2 at 12:00 pushes the watermark (10 min lateness) to 11:50,
      // far past user 1's 10:05+30min deadline; a follow-up batch fires
      // the timeout
      write(Seq((3L, "2024-01-01 12:00:00", 2L)))
      q.processAllAvailable()
      write(Seq((4L, "2024-01-01 12:01:00", 2L)))
      q.processAllAvailable()
      val closed = spark.table("sess_out").collect()
      assert(closed.exists(r => r.getAs[Long]("user_id") == 1L &&
        r.getAs[Long]("n_events") == 2L),
        s"user 1's idle session must close via timeout; got ${closed.mkString(",")}")
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch twin") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ssj").toString
    val batchEvents = graft.sources.Tables.events(spark, sf).cache()
    batchEvents.write.mode("overwrite").parquet(dir)

    // streaming self-join: the same watermarked stream on both sides
    val s1 = StreamingFraud.readEventStream(spark, dir)
    val s2 = StreamingFraud.readEventStream(spark, dir)
    val q = StreamingFraud.purchasesAfterErrors(s1, s2, lookbackMinutes = 60)
      .writeStream.outputMode("append")
      .format("memory").queryName("ssj_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ssj_out")
      val batch = StreamingFraud.purchasesAfterErrors(batchEvents, batchEvents, 60)
      assert(batch.count() > 0, "test corpus must produce join rows")
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

  test("stateful guessing stream matches batch r4 flag-for-flag") {
    val batchEvents = graft.sources.Tables.events(spark, sf)
    val streamed = StreamingFraud.guessingStream(batchEvents)
      .select(col("event_id"), col("user_id")).cache()
    val batch = graft.pipeline.FraudMart.r4Guessing(spark, sf)
      .select(col("event_id"), col("user_id"))
    assert(streamed.count() == batch.count(),
      s"stateful ${streamed.count()} vs window ${batch.count()}")
    assert(streamed.exceptAll(batch).count() == 0)
  }

  test("reactivation stream flags exactly the batch lag-gap rows") {
    val batchEvents = graft.sources.Tables.events(spark, sf)
    // 2-day threshold: sf0.001's 30-day span has no 7-day gaps — the
    // default threshold is the production dial, the tighter one is
    // what makes this data exercise the alert (16 flags)
    val gapUs = 172800000000L
    val streamed = StreamingFraud.reactivationStream(batchEvents, gapUs)
      .select("user_id", "event_id", "gap_us").cache()
    try {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("us"), col("event_id"))
      val batch = batchEvents
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
        .withColumn("gap_us", col("us") - lag("us", 1).over(w))
        .filter(col("gap_us") > gapUs)
        .select("user_id", "event_id", "gap_us")
      assert(streamed.count() > 0, "test data must exercise the alert")
      assert(streamed.count() == batch.count())
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "stream alerts must equal the batch lag-window gaps")
    } finally streamed.unpersist(blocking = false)
  }

  test("stateful pair-charge stream is set-equal to the q141 band join") {
    val batchEvents = graft.sources.Tables.events(spark, sf)
    val streamed = StreamingFraud.pairChargesStream(batchEvents)
      .select("user_id", "event_a", "event_b", "gap_us", "cents_a", "cents_b")
      .cache()
    try {
      val batch = graft.queries.ValidationQueries.q141(spark, sf)
        .select("user_id", "event_a", "event_b", "gap_us", "cents_a", "cents_b")
      assert(streamed.count() > 0, "test data must exercise the pair finder")
      assert(streamed.count() == batch.count(),
        s"stateful ${streamed.count()} vs band join ${batch.count()}")
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "stateful pairs must equal the batch band join pair set")
    } finally streamed.unpersist(blocking = false)
  }

  test("stateful conversion stream matches q123's per-user latencies") {
    val batchEvents = graft.sources.Tables.events(spark, sf)
    val streamed = StreamingFraud.conversionStream(batchEvents)
      .select(col("user_id"), col("latency_s")).cache()
    try {
      val fv = batchEvents.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("view_ts"))
      val batch = batchEvents.filter(col("event_type") === "purchase")
        .join(fv, Seq("user_id")).filter(col("ts") >= col("view_ts"))
        .groupBy("user_id")
        .agg(((unix_micros(min(col("ts"))) - unix_micros(min(col("view_ts")))) /
          lit(1e6)).as("latency_s"))
      assert(streamed.count() > 0 && streamed.count() == batch.count())
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "stateful conversions must equal the batch min-aggregate definition")
    } finally streamed.unpersist(blocking = false)
  }

  test("stateful transitions stream reproduces the q104 matrix count-for-count") {
    val batchEvents = graft.sources.Tables.events(spark, sf)
    val streamed = StreamingFraud.transitionsStream(batchEvents)
      .groupBy("prev_type", "next_type")
      .agg(count(lit(1)).as("n_trans")).cache()
    try {
      val batch = graft.queries.AnalyticsQueries.q104(spark, sf)
        .select("prev_type", "next_type", "n_trans")
      assert(streamed.count() > 0)
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "stateful pair counts must equal the batch lag-window matrix")
    } finally streamed.unpersist()
  }

  test("streaming drift monitor equals batch and a driver-side TV recomputation") {
    val dir = java.nio.file.Files.createTempDirectory("graft_drift").toString
    val batchEvents = graft.sources.Tables.events(spark, sf).cache()
    batchEvents.write.mode("overwrite").parquet(dir)
    // training baseline: the q112 "window 1" period
    val baseline = StreamingFraud.baselineHistogram(
      batchEvents.filter(col("ts") < lit("2024-01-16 00:00:00").cast("timestamp")))
    assert(baseline.nonEmpty && baseline.values.forall(_.sum > 0))

    val q = StreamingFraud.driftStream(
        StreamingFraud.readEventStream(spark, dir), baseline)
      .writeStream.outputMode("complete")
      .format("memory").queryName("drift_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("drift_out").cache()
      // exact integer drift: stream == the shared transform run in batch
      val batch = StreamingFraud.driftStream(batchEvents, baseline)
      assert(streamed.count() > 0 && streamed.count() == batch.count())
      assert(streamed.exceptAll(batch).count() == 0,
        "integer TV numerators must be bit-identical between stream and batch")
      // ...and both equal a from-scratch driver recomputation
      val events = batchEvents
        .filter(col("value").isNotNull)
        .select(unix_micros(col("ts")), col("event_type"), col("value"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      val win = 6L * 3600 * 1000000 // 6h in µs, epoch-aligned like window()
      val expect = events
        .map { case (us, t, v) =>
          ((Math.floorDiv(us, win) * win, t),
            math.min(math.floor(v / 25.0).toLong, 19L).max(0L))
        }
        .groupBy(_._1)
        .collect { case ((ws, t), rows) if baseline.contains(t) =>
          val h = new Array[Long](20)
          rows.foreach { case (_, b) => h(b.toInt) += 1 }
          val bh = baseline(t)
          val (n, nb) = (h.sum, bh.sum)
          val num = h.indices.map(i => math.abs(h(i) * nb - bh(i) * n)).sum
          (ws, t, n, nb, num)
        }.toSet
      val got = streamed.select(unix_micros(col("window_start")),
          col("event_type"), col("n_events"), col("n_base"), col("drift_num"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      assert(got === expect, "streamed drift must equal the driver recomputation")
      streamed.unpersist(blocking = false)
    } finally q.stop()
  }

  test("streaming CUSUM changepoint equals the q128 batch detector on closed windows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cusum").toString
    val batchEvents = graft.sources.Tables.events(spark, sf).cache()
    batchEvents.write.mode("overwrite").parquet(dir)
    val q = StreamingFraud.changepointStream(
        StreamingFraud.readEventStream(spark, dir))
      .writeStream.outputMode("complete")
      .format("memory").queryName("cusum_out").start()
    try {
      q.processAllAvailable()
      // the deployed monitor's per-trigger step: the shared CUSUM
      // finisher over the materialized daily frame (1-day tumbling
      // windows start at UTC midnight, so day_start IS the civil day)
      val streamed = StreamingFraud.changepointOf(
        spark.table("cusum_out")
          .select(col("event_type"), to_date(col("day_start")).as("day"),
            col("n")))
      val batch = graft.queries.CurationQueries.q128(spark, sf)
      assert(streamed.count() > 0 && streamed.count() == batch.count())
      assert(streamed.exceptAll(batch).count() == 0 &&
        batch.exceptAll(streamed).count() == 0,
        "stream-fed CUSUM must equal the batch detector exactly")
    } finally q.stop()
  }

  test("streaming burst alarm equals the q131 batch scorer on closed windows") {
    // ONE daily-count stream feeds BOTH monitors: the changepointStream
    // output table re-finished per trigger by burstsOf is the deployed
    // burst alarm, and must equal the batch q131 row-for-row.
    val dir = java.nio.file.Files.createTempDirectory("graft_burst").toString
    val batchEvents = graft.sources.Tables.events(spark, sf).cache()
    batchEvents.write.mode("overwrite").parquet(dir)
    val q = StreamingFraud.changepointStream(
        StreamingFraud.readEventStream(spark, dir))
      .writeStream.outputMode("complete")
      .format("memory").queryName("burst_out").start()
    try {
      q.processAllAvailable()
      val streamed = StreamingFraud.burstsOf(
        spark.table("burst_out")
          .select(col("event_type"), to_date(col("day_start")).as("day"),
            col("n")))
      val batch = graft.queries.SignalQueries.q131(spark, sf)
      assert(streamed.count() > 0 && streamed.count() == batch.count())
      assert(streamed.exceptAll(batch).count() == 0 &&
        batch.exceptAll(streamed).count() == 0,
        "stream-fed burst scores must equal the batch scorer exactly")
    } finally q.stop()
  }

  test("streaming EWMA anomaly monitor equals the q174 batch readout") {
    // the deployed monitor: dailyValueStream materializes the daily
    // cents frame, ewmaOf re-finishes it per trigger — must equal the
    // batch q174 row-for-row (q174 runs the SAME two halves in batch).
    val dir = java.nio.file.Files.createTempDirectory("graft_ewma").toString
    val batchEvents = graft.sources.Tables.events(spark, sf).cache()
    batchEvents.write.mode("overwrite").parquet(dir)
    val q = StreamingFraud.dailyValueStream(
        StreamingFraud.readEventStream(spark, dir))
      .writeStream.outputMode("complete")
      .format("memory").queryName("ewma_out").start()
    try {
      q.processAllAvailable()
      val streamed = StreamingFraud.ewmaOf(spark.table("ewma_out"))
      val batch = graft.queries.SeriesQueries.q174(spark, sf)
      assert(streamed.count() > 0 && streamed.count() == batch.count())
      assert(streamed.exceptAll(batch).count() == 0 &&
        batch.exceptAll(streamed).count() == 0,
        "stream-fed EWMA flags must equal the batch readout exactly")
    } finally q.stop()
  }

  test("streaming behavior-entropy monitor equals the q178 batch profile") {
    // the deployed monitor: typeCountStream materializes the running
    // (user, type) counts, entropyOf re-finishes them per trigger —
    // must equal the batch q178 row-for-row.
    val dir = java.nio.file.Files.createTempDirectory("graft_entropy").toString
    val batchEvents = graft.sources.Tables.events(spark, sf).cache()
    batchEvents.write.mode("overwrite").parquet(dir)
    val q = StreamingFraud.typeCountStream(
        StreamingFraud.readEventStream(spark, dir))
      .writeStream.outputMode("complete")
      .format("memory").queryName("entropy_out").start()
    try {
      q.processAllAvailable()
      val streamed = StreamingFraud.entropyOf(spark.table("entropy_out"))
      val batch = graft.queries.InfoQueries.q178(spark, sf)
      assert(streamed.count() > 0 && streamed.count() == batch.count())
      assert(streamed.exceptAll(batch).count() == 0 &&
        batch.exceptAll(streamed).count() == 0,
        "stream-fed entropy must equal the batch profile exactly")
    } finally q.stop()
  }

  test("full fraud report runs as one continuous stream, matching batch rules") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rep_stream").toString
    val batchEvents = graft.sources.Tables.events(spark, sf).cache()
    batchEvents.write.mode("overwrite").parquet(dir)
    val customer = graft.sources.Tables.customer(spark, sf)
    val validity = graft.pipeline.FraudMart.validityOf(batchEvents)
    val q = StreamingFraud.reportStream(
        StreamingFraud.readEventStream(spark, dir), customer, validity)
      .writeStream.outputMode("append")
      .format("memory").queryName("report_stream_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("report_stream_out")
        .select("event_id", "user_id", "rule")
      // the batch twin WITHOUT the accumulation watermark: all rules
      val batch = graft.pipeline.FraudMart.report(spark, sf,
        watermark = "1900-01-01 00:00:00").select("event_id", "user_id", "rule")
      assert(streamed.count() > 0)
      assert(streamed.exceptAll(batch).count() == 0,
        "stream emitted a flag the batch mart does not contain")
      val missing = batch.exceptAll(streamed).count()
      assert(missing == 0, s"$missing batch flags missing from the stream")
    } finally q.stop()
  }

  test("last-error stream equals q161's native as-of enrichment") {
    val batchEvents = graft.sources.Tables.events(spark, sf)
    val streamed = StreamingFraud.lastErrorStream(batchEvents)
      .select("purchase_id", "user_id", "error_id", "gap_us").cache()
    try {
      val batch = graft.queries.AnalyticsQueries.q161(spark, sf)
        .select("purchase_id", "user_id", "error_id", "gap_us")
      assert(streamed.count() > 0, "test data must exercise the enrichment")
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "stream enrichment must equal the native as-of batch result")
    } finally streamed.unpersist(blocking = false)
  }

  test("last-error stream carries its state across micro-batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lasterr").toString
    val sp = spark
    import sp.implicits._
    def write(rows: Seq[(Long, String, Long, String)]): Unit =
      rows.toDF("event_id", "ts_s", "user_id", "event_type")
        .select(col("event_id"), col("ts_s").cast("timestamp").as("ts"),
          col("user_id"), col("event_type"),
          lit(1.0).as("value"), lit("{}").as("props"))
        .coalesce(1).write.mode("append").parquet(dir)

    // batch 1: only an error — nothing may emit yet
    write(Seq((1L, "2024-01-01 10:00:00", 1L, "error")))
    val q = StreamingFraud.lastErrorStream(
        StreamingFraud.readEventStream(spark, dir))
      .writeStream.outputMode("append")
      .format("memory").queryName("lerr_out").start()
    try {
      q.processAllAvailable()
      assert(spark.table("lerr_out").isEmpty, "an error alone emits nothing")
      // batch 2: the purchase must flag the PRIOR micro-batch's error
      // (state survival), the later error updates state, and user 2's
      // error-free purchase stays silent
      write(Seq((2L, "2024-01-01 10:30:00", 1L, "purchase"),
        (3L, "2024-01-01 10:40:00", 1L, "error"),
        (4L, "2024-01-01 10:35:00", 2L, "purchase")))
      q.processAllAvailable()
      val out1 = spark.table("lerr_out").collect()
      assert(out1.length == 1 &&
        out1(0).getAs[Long]("purchase_id") == 2L &&
        out1(0).getAs[Long]("error_id") == 1L &&
        out1(0).getAs[Long]("gap_us") == 1800L * 1000000L,
        s"expected purchase 2 flagging error 1: ${out1.mkString(",")}")
      // batch 3: the refreshed state (error 3) wins for the next purchase
      write(Seq((5L, "2024-01-01 10:50:00", 1L, "purchase")))
      q.processAllAvailable()
      val out2 = spark.table("lerr_out").collect()
      assert(out2.length == 2 && out2.exists(r =>
        r.getAs[Long]("purchase_id") == 5L && r.getAs[Long]("error_id") == 3L),
        s"expected purchase 5 flagging error 3: ${out2.mkString(",")}")
    } finally q.stop()
  }

  // ---- asOfUpdateStream: the update-correct streaming as-of ----

  private def asOfFactSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("fact_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("user_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("ts",
      org.apache.spark.sql.types.TimestampType)))
  private def asOfVerSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("user_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("ts",
      org.apache.spark.sql.types.TimestampType),
    org.apache.spark.sql.types.StructField("version_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("cents",
      org.apache.spark.sql.types.LongType)))

  test("as-of update stream: a LATE version arrival still wins before the fact emits") {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val fdir = java.nio.file.Files.createTempDirectory("graft_asof_f").toString
    val vdir = java.nio.file.Files.createTempDirectory("graft_asof_v").toString
    val sp = spark
    import sp.implicits._
    def writeF(rows: Seq[(Long, Long, String)]): Unit =
      rows.toDF("fact_id", "user_id", "ts_s")
        .select(col("fact_id"), col("user_id"), col("ts_s").cast("timestamp").as("ts"))
        .coalesce(1).write.mode("append").parquet(fdir)
    def writeV(rows: Seq[(Long, String, Long, Long)]): Unit =
      rows.toDF("user_id", "ts_s", "version_id", "cents")
        .select(col("user_id"), col("ts_s").cast("timestamp").as("ts"),
          col("version_id"), col("cents"))
        .coalesce(1).write.mode("append").parquet(vdir)

    // batch 1: version A at 10:00, then the fact at 10:30 — a
    // resolve-on-arrival operator (lastErrorStream's shape) would emit
    // (fact, A) right here
    writeV(Seq((1L, "2024-01-01 10:00:00", 100L, 100L)))
    writeF(Seq((10L, 1L, "2024-01-01 10:30:00")))
    val facts = spark.readStream.schema(asOfFactSchema).parquet(fdir)
      .withWatermark("ts", "1 hour")
    val vers = spark.readStream.schema(asOfVerSchema).parquet(vdir)
      .withWatermark("ts", "1 hour")
    val q = StreamingFraud.asOfUpdateStream(facts, vers,
        timeout = GroupStateTimeout.EventTimeTimeout)
      .writeStream.outputMode("append")
      .format("memory").queryName("asof_upd_out").start()
    try {
      q.processAllAvailable()
      assert(spark.table("asof_upd_out").isEmpty,
        "the fact must BUFFER until the watermark passes it, not emit eagerly")
      // batch 2: version B arrives LATE — event time 10:20 precedes the
      // already-received fact. Far-future rows on BOTH inputs then push
      // the combined watermark past the fact (12:00 - 1h = 11:00).
      writeV(Seq((1L, "2024-01-01 10:20:00", 200L, 200L),
        (99L, "2024-01-01 12:00:00", 900L, 900L)))
      writeF(Seq((90L, 99L, "2024-01-01 12:00:00")))
      q.processAllAvailable()
      val out = spark.table("asof_upd_out").collect()
      assert(out.length == 1, s"exactly the watermark-passed fact emits: ${out.mkString(",")}")
      assert(out(0).getAs[Long]("fact_id") == 10L &&
        out(0).getAs[Long]("version_id") == 200L &&
        out(0).getAs[Long]("v_cents") == 200L,
        s"the late version (200) must win over the early one (100): ${out(0)}")
    } finally q.stop()
  }

  test("as-of update stream under real out-of-order arrival equals the batch as-of") {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    // Feed sf events in ARRIVAL order (q159's lateness model: an event
    // with timestamp ts arrives at ts + (event_id % 3) days — disorder
    // bounded by 2 days, q162's audit), one arrival-chunk per
    // micro-batch. With a 3-day watermark delay nothing is dropped, so
    // every emitted resolution must EQUAL the batch as-of — in
    // particular for facts whose admissible version arrived after them.
    val ev = graft.sources.Tables.events(spark, sf)
      .withColumn("arr", expr("timestampadd(DAY, CAST(event_id % 3 AS INT), ts)"))
      .cache()
    val fdir = java.nio.file.Files.createTempDirectory("graft_asof_of").toString
    val vdir = java.nio.file.Files.createTempDirectory("graft_asof_ov").toString
    val cuts = Seq("2024-01-11 00:00:00", "2024-01-21 00:00:00", "2099-01-01 00:00:00")
    var lo = "1900-01-01 00:00:00"
    cuts.foreach { hi =>
      val chunk = ev.filter(col("arr") >= lit(lo).cast("timestamp") &&
        col("arr") < lit(hi).cast("timestamp"))
      chunk.filter(col("event_type") === "click")
        .select(col("event_id").as("fact_id"), col("user_id"), col("ts"))
        .coalesce(1).write.mode("append").parquet(fdir)
      chunk.filter(col("event_type") === "signup" && col("value").isNotNull)
        .select(col("user_id"), col("ts"), col("event_id").as("version_id"),
          round(col("value") * 100).cast("long").as("cents"))
        .coalesce(1).write.mode("append").parquet(vdir)
      lo = hi
    }
    val facts = spark.readStream.schema(asOfFactSchema)
      .option("maxFilesPerTrigger", 1).parquet(fdir)
      .withWatermark("ts", "3 days")
    val vers = spark.readStream.schema(asOfVerSchema)
      .option("maxFilesPerTrigger", 1).parquet(vdir)
      .withWatermark("ts", "3 days")
    val q = StreamingFraud.asOfUpdateStream(facts, vers,
        timeout = GroupStateTimeout.EventTimeTimeout)
      .writeStream.outputMode("append")
      .format("memory").queryName("asof_ooo_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("asof_ooo_out")
        .select("fact_id", "user_id", "f_ts", "version_id", "v_ts", "v_cents")
      val batch = graft.queries.OpsQueries.q164(spark, sf)
      // every emission is FINAL and correct: a subset of the batch
      // as-of (wrong-version emissions — the resolve-eagerly bug —
      // would surface here), and the watermark has passed most facts
      assert(streamed.exceptAll(batch).isEmpty,
        "stream emitted a resolution the batch as-of does not contain")
      val (ns, nb) = (streamed.count(), batch.count())
      assert(ns > 0 && ns >= (nb * 8) / 10,
        s"watermark should have released most facts: emitted $ns of $nb")
      // and the un-emitted remainder is exactly the watermark tail:
      // every batch row the stream is missing sits within delay+disorder
      // (3+2 days) of the corpus end — nothing in the interior was lost
      val cutoff = ev.agg(max(col("ts"))).collect()(0).getTimestamp(0).toInstant
        .minus(java.time.Duration.ofDays(5))
      val interiorMissing = batch.exceptAll(streamed)
        .filter(col("f_ts") < lit(java.sql.Timestamp.from(cutoff)))
        .count()
      assert(interiorMissing == 0,
        s"$interiorMissing interior facts never emitted despite the watermark passing them")
    } finally { q.stop(); ev.unpersist(blocking = false) }
  }

  test("as-of update stream: drainAsOfState flushes the watermark tail after stop") {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    // Same out-of-order replay as above — the engine watermark trails
    // max event time by the delay, so the stream ENDS with the final
    // facts still pending in state. The drain must read the stopped
    // query's checkpoint and resolve exactly those, making
    // streamed ∪ drained equal the batch as-of EXACTLY.
    val ev = graft.sources.Tables.events(spark, sf)
      .withColumn("arr", expr("timestampadd(DAY, CAST(event_id % 3 AS INT), ts)"))
      .cache()
    val fdir = java.nio.file.Files.createTempDirectory("graft_asof_df").toString
    val vdir = java.nio.file.Files.createTempDirectory("graft_asof_dv").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_asof_ck").toString
    val cuts = Seq("2024-01-11 00:00:00", "2024-01-21 00:00:00", "2099-01-01 00:00:00")
    var lo = "1900-01-01 00:00:00"
    cuts.foreach { hi =>
      val chunk = ev.filter(col("arr") >= lit(lo).cast("timestamp") &&
        col("arr") < lit(hi).cast("timestamp"))
      chunk.filter(col("event_type") === "click")
        .select(col("event_id").as("fact_id"), col("user_id"), col("ts"))
        .coalesce(1).write.mode("append").parquet(fdir)
      chunk.filter(col("event_type") === "signup" && col("value").isNotNull)
        .select(col("user_id"), col("ts"), col("event_id").as("version_id"),
          round(col("value") * 100).cast("long").as("cents"))
        .coalesce(1).write.mode("append").parquet(vdir)
      lo = hi
    }
    val facts = spark.readStream.schema(asOfFactSchema)
      .option("maxFilesPerTrigger", 1).parquet(fdir)
      .withWatermark("ts", "3 days")
    val vers = spark.readStream.schema(asOfVerSchema)
      .option("maxFilesPerTrigger", 1).parquet(vdir)
      .withWatermark("ts", "3 days")
    val q = StreamingFraud.asOfUpdateStream(facts, vers,
        timeout = GroupStateTimeout.EventTimeTimeout)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("asof_drain_out").start()
    try {
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("asof_drain_out")
      .select("fact_id", "user_id", "f_ts", "version_id", "v_ts", "v_cents")
    val batch = graft.queries.OpsQueries.q164(spark, sf)
    val tail = batch.exceptAll(streamed)
    assert(tail.count() > 0,
      "the replay must END with watermark-tail facts pending, or the drain proves nothing")
    val drained = StreamingFraud.drainAsOfState(spark, ckpt)
    // drain emits EXACTLY the missing resolutions — same rule, same
    // tie-breaks, nothing the stream already emitted, nothing wrong
    assert(drained.exceptAll(tail).isEmpty,
      "drain emitted a resolution the batch as-of tail does not contain")
    assert(tail.exceptAll(drained).isEmpty,
      "drain missed pending facts the batch as-of resolves")
    val all = streamed.unionByName(drained)
    assert(all.count() === batch.count())
    assert(all.exceptAll(batch).isEmpty && batch.exceptAll(all).isEmpty,
      "streamed ∪ drained must equal the batch as-of exactly")
    ev.unpersist(blocking = false)
  }
}
