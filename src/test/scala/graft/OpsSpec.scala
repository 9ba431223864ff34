package graft

import org.apache.spark.sql.functions._

/** Round-9 pipeline-operations suite: the update-correct as-of batch
  * twin (q164), the advisor family (q165 rebuild-vs-accumulate, q167
  * broadcast-vs-shuffle, q168 watermark delay, q169 state sizing,
  * q170 dup pressure, q171 partition sizing), and the training-mixture
  * pair (q166 weights, q172 token-budget allocation).
  */
class OpsSpec extends SparkSpec {

  test("q164: batch-mode update-stream as-of equals the composed window-rank as-of") {
    import org.apache.spark.sql.expressions.Window
    val ev = graft.sources.Tables.events(spark, sf)
    val f = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("fact_id"), col("user_id").as("f_user"),
        col("ts").as("f_ts"))
    val v = ev.filter(col("event_type") === "signup" && col("value").isNotNull)
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("version_id"),
        round(col("value") * 100).cast("long").as("v_cents"))
    val composed = f.join(v,
        f("f_user") === v("v_user") && v("v_ts") <= f("f_ts"))
      .withColumn("rn", row_number().over(Window.partitionBy("fact_id")
        .orderBy(col("v_ts").desc, col("version_id").desc)))
      .filter(col("rn") === 1)
      .select(col("fact_id"), col("f_user").as("user_id"), col("f_ts"),
        col("version_id"), col("v_ts"), col("v_cents"))
    val got = graft.queries.OpsQueries.q164(spark, sf)
    assert(got.count() > 0, "test data must exercise the as-of")
    assert(got.exceptAll(composed).isEmpty && composed.exceptAll(got).isEmpty,
      "batch-mode asOfUpdateStream must equal the composed as-of exactly")
  }

  test("asOfUpdateStream batch mode: tie rules match the oracle's (ts DESC, id DESC) rank") {
    val sp = spark
    import sp.implicits._
    def ts(s: String) = s
    val facts = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00")), // same instant as versions 5 and 6
      (2L, 7L, ts("2024-01-01 09:00:00")), // before every version: must drop
      (3L, 8L, ts("2024-01-01 12:00:00"))) // version-free user via key isolation
      .toDF("fact_id", "user_id", "ts_s")
      .select(col("fact_id"), col("user_id"), col("ts_s").cast("timestamp").as("ts"))
    val versions = Seq(
      (7L, ts("2024-01-01 10:00:00"), 5L, 500L), // tie on ts with fact 1...
      (7L, ts("2024-01-01 10:00:00"), 6L, 600L), // ...higher id must win
      (7L, ts("2024-01-01 11:00:00"), 9L, 900L)) // after fact 1: inadmissible
      .toDF("user_id", "ts_s", "version_id", "cents")
      .select(col("user_id"), col("ts_s").cast("timestamp").as("ts"),
        col("version_id"), col("cents"))
    val out = graft.streaming.StreamingFraud.asOfUpdateStream(facts, versions)
      .collect().map(r => r.getAs[Long]("fact_id") ->
        (r.getAs[Long]("version_id"), r.getAs[Long]("v_cents"))).toMap
    assert(out === Map(1L -> (6L, 600L)),
      "a same-instant version IS admissible (v.ts <= f.ts), ties break to the " +
        "larger version id, version-less facts drop (inner as-of)")
  }

  test("q165: advisor costs recompute from the day profile, crossover is the model's") {
    val rows = graft.queries.OpsQueries.q165(spark, sf)
      .orderBy("day").collect()
    assert(rows.length > 5, "a month of events should span many days")
    var cum = 0L
    var prev = 0L
    rows.foreach { r =>
      val (n, lb) = (r.getAs[Long]("n_new"), r.getAs[Long]("lookback_rows"))
      cum += n
      assert(r.getAs[Long]("cum_rows") === cum)
      assert(lb === prev, "lookback must be exactly the previous day's volume")
      val acc = 3L * (n + lb)
      assert(r.getAs[Long]("acc_cost_rows") === acc)
      assert(r.getAs[Long]("rebuild_cost_rows") === cum)
      assert(r.getAs[String]("decision") ===
        (if (acc <= cum) "accumulate" else "rebuild"))
      prev = n
    }
    // the economic shape: a young mart rebuilds, a grown one accumulates
    assert(rows.head.getAs[String]("decision") === "rebuild",
      "day 1: accumulate machinery costs 3x the history it would replace")
    assert(rows.last.getAs[String]("decision") === "accumulate",
      "end of month: history dwarfs the daily increment")
  }

  test("MartAdvisor.advise: uniform volume crosses over exactly at writeAmp*(1+lookback)+ lookback window") {
    val sp = spark
    import sp.implicits._
    val daily = (1 to 10).map(d => (d.toLong, 10L)).toDF("run", "n")
    val out = graft.pipeline.MartAdvisor.advise(daily, "run", "n")
      .orderBy("run").collect()
    // run 1: acc=3*10=30 > cum=10 -> rebuild; run d>=2: acc=3*20=60 vs
    // cum=10d -> accumulate from d=6 (60 <= 60)
    val decisions = out.map(r => r.getAs[Long]("run") -> r.getAs[String]("decision")).toMap
    (1 to 5).foreach(d => assert(decisions(d.toLong) === "rebuild", s"run $d"))
    (6 to 10).foreach(d => assert(decisions(d.toLong) === "accumulate", s"run $d"))
  }

  test("MartAdvisor.advise validates its dials") {
    val sp = spark
    import sp.implicits._
    val daily = Seq((1L, 10L)).toDF("run", "n")
    intercept[IllegalArgumentException] {
      graft.pipeline.MartAdvisor.advise(daily, "run", "n", writeAmp = 0L)
    }
    intercept[IllegalArgumentException] {
      graft.pipeline.MartAdvisor.advise(daily, "run", "n", lookbackRuns = -1)
    }
  }

  test("MartAdvisor.adviseFromRunLog: per-table histories advise independently") {
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_advisor").toString
    Seq(
      // young table: two runs -> both rebuild
      ("dim_small", 1L, 100L, 0L, 0L), ("dim_small", 2L, 100L, 50L, 0L),
      // grown table: big history then a small increment -> accumulate
      ("fact_big", 1L, 100000L, 0L, 0L), ("fact_big", 2L, 10L, 5L, 3L))
      .toDF("table_name", "run_id", "rows_inserted", "rows_updated", "rows_deleted")
      .write.mode("overwrite").parquet(s"$dir/etl_run_log")
    // lookbackRuns = 0: with a lookback the bulk initial load would
    // keep pricing accumulation at 3x the whole history (the model's
    // honest answer for a rule that re-reads the previous run's
    // volume); without one, the increment alone decides
    val out = graft.pipeline.MartAdvisor
      .adviseFromRunLog(spark, dir, lookbackRuns = 0).collect()
    val byKey = out.map(r =>
      (r.getAs[String]("table_name"), r.getAs[Long]("run_id")) -> r).toMap
    assert(byKey(("dim_small", 1L)).getAs[String]("decision") === "rebuild")
    assert(byKey(("dim_small", 2L)).getAs[String]("decision") === "rebuild")
    // deletes don't count toward ingest volume: n_new = 10 + 5
    assert(byKey(("fact_big", 2L)).getAs[Long]("n_new") === 15L)
    assert(byKey(("fact_big", 2L)).getAs[String]("decision") === "accumulate")
    // cumulative history never leaks across tables
    assert(byKey(("dim_small", 2L)).getAs[Long]("cum_rows") === 250L)
    // neither table is physically on disk here (log-only warehouse), so
    // both price with the FALLBACK amp and say so
    assert(out.map(_.getAs[String]("amp_source")).toSet === Set("fallback"))
    assert(out.map(_.getAs[Long]("write_amp")).toSet === Set(3L))
  }

  test("MartAdvisor.measuredWriteAmp: amp derived from the warehouse's own records") {
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_amp").toString
    // table t physically on disk (the inventory census must corroborate)
    (1L to 200L).map(i => (i, s"v$i")).toDF("k", "v").write.parquet(s"$dir/t")
    Seq(
      // t: n_new = 100 then 100 -> cum 100, 200; snapshot-swap writes
      // Σcum = 300 physical rows for 200 ingested -> amp = ceil(3/2) = 2
      ("t", 1L, 100L, 0L, 0L), ("t", 2L, 60L, 40L, 0L),
      // ghost: in the log but with no footprint on disk -> fallback
      ("ghost", 1L, 10L, 0L, 0L))
      .toDF("table_name", "run_id", "rows_inserted", "rows_updated", "rows_deleted")
      .write.mode("overwrite").parquet(s"$dir/etl_run_log")
    val amp = graft.pipeline.MartAdvisor.measuredWriteAmp(spark, dir).collect()
      .map(r => r.getAs[String]("table_name") ->
        (r.getAs[Long]("write_amp"), r.getAs[String]("amp_source"))).toMap
    assert(amp("t") === ((2L, "measured")))
    assert(amp("ghost") === ((3L, "fallback")))
    // the advisor consumes the measured dial — and the verdict FLIPS on
    // it: t's run 2 accumulates at the measured amp 2 (2*100 <= 200)
    // where the guessed literal 3 would have said rebuild (300 > 200)
    val out = graft.pipeline.MartAdvisor
      .adviseFromRunLog(spark, dir, lookbackRuns = 0).collect()
    val byKey = out.map(r =>
      (r.getAs[String]("table_name"), r.getAs[Long]("run_id")) -> r).toMap
    assert(byKey(("t", 2L)).getAs[Long]("write_amp") === 2L)
    assert(byKey(("t", 2L)).getAs[Long]("acc_cost_rows") === 200L)
    assert(byKey(("t", 2L)).getAs[String]("decision") === "accumulate")
    val forced = graft.pipeline.MartAdvisor
      .adviseFromRunLog(spark, dir, writeAmp = Some(3L), lookbackRuns = 0).collect()
      .map(r => (r.getAs[String]("table_name"), r.getAs[Long]("run_id")) -> r).toMap
    assert(forced(("t", 2L)).getAs[String]("decision") === "rebuild")
    assert(forced(("t", 2L)).getAs[String]("amp_source") === "forced")
  }

  test("MartAdvisor.advise refuses an oversized un-partitioned frame at runtime") {
    val sp = spark
    import sp.implicits._
    val big = sp.range(200)
      .select(col("id").as("run"), lit(1L).as("n"))
    val e = intercept[Exception] {
      graft.pipeline.MartAdvisor
        .advise(big, "run", "n", maxRunsPerTask = 100L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("pre-aggregated to per-run rows")),
      s"unexpected error: $e")
    // the same volume WITH a partition column passes (bounded per task)
    val parts = sp.range(200)
      .select((col("id") % 4L).as("t"), col("id").as("run"), lit(1L).as("n"))
    assert(graft.pipeline.MartAdvisor
      .advise(parts, "run", "n", partitionCols = Seq("t"), maxRunsPerTask = 100L)
      .count() === 200L)
  }

  test("q167: join advisor sizes every dim and broadcasts the small ones") {
    val rows = graft.queries.OpsQueries.q167(spark, sf).collect()
    assert(rows.map(_.getAs[String]("table_name")).sorted ===
      Array("customer", "nation", "part", "region", "supplier"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") > 0 && r.getAs[Long]("est_bytes") > 0)
      assert(r.getAs[String]("decision") ===
        (if (r.getAs[Long]("est_bytes") <= 10L * 1024 * 1024) "broadcast"
         else "shuffle"))
    }
    // at test scale every dim fits a broadcast — the model must agree
    assert(rows.forall(_.getAs[String]("decision") == "broadcast"))
    // the estimate is at least the fixed-width floor (8 bytes/fixed col)
    val region = rows.find(_.getAs[String]("table_name") == "region").get
    assert(region.getAs[Long]("est_bytes") >= 8 * region.getAs[Long]("n_rows"))
  }

  test("q168: watermark advisor picks the smallest sufficient delay per target") {
    val rows = graft.queries.OpsQueries.q168(spark, sf)
      .orderBy("target_ppm").collect()
    assert(rows.length === 3)
    // exact-coverage target needs the model's full 2-day disorder bound
    val full = rows.find(_.getAs[Long]("target_ppm") == 1000000L).get
    assert(full.getAs[Long]("delay_days") === 2L)
    assert(full.getAs[Long]("covered_ppm") === 1000000L)
    rows.foreach { r =>
      assert(r.getAs[Long]("covered_ppm") >= r.getAs[Long]("target_ppm"),
        s"chosen delay must actually reach its target: $r")
    }
    // monotone: a stricter target never picks a smaller delay
    val delays = rows.map(_.getAs[Long]("delay_days"))
    assert(delays.sameElements(delays.sorted))
  }

  test("q169: state sizing is cumulative in the delay and consistent per user") {
    val rows = graft.queries.OpsQueries.q169(spark, sf)
      .orderBy("delay_days").collect()
    assert(rows.length === 3)
    val buf = rows.map(r => r.getAs[Long]("delay_days") -> r.getAs[Long]("buffered_rows")).toMap
    assert(buf(1L) <= buf(2L) && buf(2L) <= buf(3L),
      "a longer delay can only buffer more")
    rows.foreach(r => assert(r.getAs[Long]("max_user_buffered") <=
      r.getAs[Long]("buffered_rows")))
    // recompute buffered(3) directly: all events within 3 days of the end
    val ev = graft.sources.Tables.events(spark, sf)
      .select(unix_micros(col("ts")).as("us"))
    val mx = ev.agg(max("us")).collect()(0).getLong(0)
    val expect3 = ev.filter(col("us") > mx - 3L * 86400000000L).count()
    assert(buf(3L) === expect3)
  }

  test("q170: duplicate pressure recomputes from the raw day slices") {
    val rows = graft.queries.OpsQueries.q170(spark, sf).collect()
    assert(rows.length > 5)
    rows.foreach { r =>
      val (n, k) = (r.getAs[Long]("n_events"), r.getAs[Long]("n_keys"))
      assert(k >= 1L && k <= n)
      assert(r.getAs[Long]("dup_ppm") === (n - k) * 1000000L / n)
    }
    // cross-check one day end to end against a direct recount
    val day0 = rows.minBy(_.getAs[Long]("day"))
    val ev = graft.sources.Tables.events(spark, sf)
      .filter(expr(s"unix_micros(ts) div 86400000000 = ${day0.getAs[Long]("day")}"))
    assert(day0.getAs[Long]("n_events") === ev.count())
    assert(day0.getAs[Long]("n_keys") ===
      ev.select("user_id", "event_type").distinct().count())
  }

  test("q166: mixture weights are sqrt-tempered, normalized, and floor-exact") {
    val rows = graft.queries.OpsQueries.q166(spark, sf).collect()
    assert(rows.length > 1, "documents must span multiple sources")
    rows.foreach { r =>
      val m = r.getAs[Long]("sum_chars")
      assert(r.getAs[Long]("s_scaled") ===
        math.floor(1000.0 * math.sqrt(m.toDouble)).toLong)
    }
    val denom = rows.map(_.getAs[Long]("s_scaled")).sum
    rows.foreach { r =>
      assert(r.getAs[Long]("weight_ppm") ===
        r.getAs[Long]("s_scaled") * 1000000L / denom)
    }
    // floors lose at most 1 ppm per source
    val total = rows.map(_.getAs[Long]("weight_ppm")).sum
    assert(total <= 1000000L && total > 1000000L - rows.length,
      s"weights must sum to 1e6 minus floor loss, got $total")
    // temperature 0.5 up-weights small sources: weight ratios are
    // SQUARE-ROOT compressed relative to mass ratios
    val sorted = rows.sortBy(_.getAs[Long]("sum_chars"))
    val (lo, hi) = (sorted.head, sorted.last)
    if (lo.getAs[Long]("sum_chars") < hi.getAs[Long]("sum_chars")) {
      val massRatio = hi.getAs[Long]("sum_chars").toDouble / lo.getAs[Long]("sum_chars")
      val wRatio = hi.getAs[Long]("weight_ppm").toDouble / lo.getAs[Long]("weight_ppm")
      assert(wRatio < massRatio,
        s"sqrt temper must compress the mass ratio: w=$wRatio mass=$massRatio")
    }
  }

  test("q171: partition advisor covers the fact tables with ceil-exact sizing") {
    val rows = graft.queries.OpsQueries.q171(spark, sf).collect()
    assert(rows.map(_.getAs[String]("table_name")).sorted ===
      Array("documents", "events", "lineitem", "orders"))
    rows.foreach { r =>
      val (n, b, p) = (r.getAs[Long]("n_rows"), r.getAs[Long]("est_bytes"),
        r.getAs[Long]("parts_128mb"))
      assert(n > 0 && b > 0)
      // exact ceiling at the 128 MiB target, floored at one partition
      assert(p === math.max(1L, (b + 134217727L) / 134217728L))
      assert(r.getAs[Long]("rows_per_part") === n / p)
      assert(r.getAs[String]("decision") ===
        (if (p <= 32) "fits_default" else "raise_partitions"))
    }
    // the byte model must exceed the fixed-width floor for every table
    val li = rows.find(_.getAs[String]("table_name") == "lineitem").get
    assert(li.getAs[Long]("est_bytes") >= 9L * 8 * li.getAs[Long]("n_rows"))
  }

  test("q172: token budget respects the 4-epoch cap and never overspends") {
    val rows = graft.queries.OpsQueries.q172(spark, sf).collect()
    assert(rows.length > 1, "documents must span multiple sources")
    rows.foreach { r =>
      val (m, t, a) = (r.getAs[Long]("src_tokens"),
        r.getAs[Long]("target_tokens"), r.getAs[Long]("alloc_tokens"))
      assert(m > 0)
      assert(a === math.min(t, 4 * m), "alloc is the capped target")
      assert(r.getAs[Long]("epochs_ppm") === a * 1000000L / m)
      assert(r.getAs[Long]("epochs_ppm") <= 4000000L, "cap is 4 epochs")
      assert(r.getAs[String]("decision") ===
        (if (t > 4 * m) "capped" else "budgeted"))
    }
    // targets partition the budget: floor-exact shares never overspend it
    assert(rows.map(_.getAs[Long]("target_tokens")).sum <= 1000000000L)
    // and the tiny test corpus is cap-bound everywhere (1e9 >> 4 epochs)
    assert(rows.forall(_.getAs[String]("decision") == "capped"))
  }

  test("q181: bloom advisor recounts the textbook m/k from integer literals") {
    val rows = graft.queries.OpsQueries.q181(spark, sf).collect()
      .map(r => (r.getAs[String]("table_name"), r.getAs[Long]("fpp_ppm")) -> r).toMap
    assert(rows.size === 6, "3 dims x 2 fpp targets")
    val dims = Map(
      "supplier" -> graft.sources.Tables.supplier(spark, sf)
        .select("s_suppkey").distinct().count(),
      "customer" -> graft.sources.Tables.customer(spark, sf)
        .select("c_custkey").distinct().count(),
      "part" -> graft.sources.Tables.part(spark, sf)
        .select("p_partkey").distinct().count())
    for {
      (t, n) <- dims
      (fpp, bpk, k) <- Seq((10000L, 9585058L, 7L), (1000L, 14377587L, 10L))
    } {
      val r = rows((t, fpp))
      val mBits = (n * bpk + 999999L) / 1000000L
      assert(r.getAs[Long]("n_keys") === n)
      assert(r.getAs[Long]("m_bits") === mBits, s"$t@$fpp")
      assert(r.getAs[Long]("k_hashes") === k)
      assert(r.getAs[Long]("bloom_bytes") === (mBits + 7L) / 8L)
      assert(r.getAs[String]("decision") === "broadcast_bloom",
        "test dims all fit the broadcast threshold")
      // the frozen integer constants are within 1 micro of the real formula
      val realBpk = math.log(1e6 / fpp) / (math.log(2) * math.log(2))
      assert(math.abs(bpk - math.floor(1e6 * realBpk)) <= 1.0)
      assert(k === math.ceil(math.log(1e6 / fpp) / math.log(2)).toLong)
    }
  }
}
