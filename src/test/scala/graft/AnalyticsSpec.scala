package graft

import org.apache.spark.sql.functions._

import graft.queries.AnalyticsQueries

class AnalyticsSpec extends SparkSpec {

  test("q111 frontier: complete characterization — output undominated, excluded dominated") {
    val toks = graft.functions.TextFunctions.wsTokens(col("text"))
    val d = graft.sources.Tables.documents(spark, sf)
      .select(col("lang"), col("doc_id"), col("n_chars").as("x"),
        size(array_distinct(toks)).cast("long").as("y")).cache()
    val out = graft.queries.AnalyticsQueries.q111(spark, sf).cache()
    try {
      assert(out.count() > 0)
      // no output point is dominated by ANY input point
      val dominatedOut = out.as("f").join(d.as("p"),
        col("f.lang") === col("p.lang") &&
          col("p.x") >= col("f.x") && col("p.y") >= col("f.y") &&
          (col("p.x") > col("f.x") || col("p.y") > col("f.y")))
      assert(dominatedOut.isEmpty, "a frontier point must be undominated")
      // every excluded point is dominated by SOME frontier point
      val excluded = d.join(out.select("doc_id"), Seq("doc_id"), "left_anti")
      val undomExcluded = excluded.as("e").join(out.as("f"),
        col("e.lang") === col("f.lang") &&
          col("f.x") >= col("e.x") && col("f.y") >= col("e.y") &&
          (col("f.x") > col("e.x") || col("f.y") > col("e.y")), "left_anti")
      assert(undomExcluded.isEmpty,
        "every excluded point must be dominated by a frontier point")
    } finally { out.unpersist(); d.unpersist() }
  }

  test("q112 drift: exact integer TV numerator matches a driver-side recomputation") {
    val out = graft.queries.AnalyticsQueries.q112(spark, sf).cache()
    try {
      // mirror the query EXACTLY: same null filter, same bin formula
      // (no lower clamp), bins folded over the observed set — so the
      // recomputation stays faithful even if testdata gains nulls or
      // negative values
      val ev = graft.sources.Tables.events(spark, sf)
        .filter(col("value").isNotNull)
        .select("event_type", "ts", "value").collect()
        .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2)))
      // the query's cut is parsed under session timezone UTC — build
      // the same INSTANT here so the spec passes on any JVM timezone
      val cut = new java.sql.Timestamp(
        java.time.Instant.parse("2024-01-16T00:00:00Z").toEpochMilli)
      val byType = ev.groupBy(_._1)
      out.collect().foreach { r =>
        val tpe = r.getString(0)
        val rows = byType(tpe)
        val bins = rows.map { case (_, ts, v) =>
          (math.min(math.floor(v / 25).toLong, 19L), ts.before(cut))
        }
        val n1 = bins.count(_._2).toLong; val n2 = bins.size - n1
        assert(r.getAs[Long]("n_w1") === n1 && r.getAs[Long]("n_w2") === n2)
        val num = bins.map(_._1).distinct.map { b =>
          val c1 = bins.count(p => p._1 == b && p._2).toLong
          val c2 = bins.count(p => p._1 == b && !p._2).toLong
          math.abs(c1 * n2 - c2 * n1)
        }.sum
        assert(r.getAs[Long]("drift_num") === num, s"$tpe drift numerator")
        assert(num <= 2L * n1 * n2, "TV distance cannot exceed 1")
      }
    } finally out.unpersist()
  }

  test("q86 concurrency: peak bounded by day volume, every event day present") {
    val out = AnalyticsQueries.q86(spark, sf).cache()
    val ev = graft.sources.Tables.events(spark, sf)
    // peak concurrency on a day can never exceed the intervals touching it
    assert(out.filter(col("max_concurrent") > col("n_intervals") ||
      col("max_concurrent") < 1).isEmpty)
    // every day with an event start appears (its own interval is open then)
    val evDays = ev.select(to_date(col("ts")).as("day")).distinct()
    assert(evDays.exceptAll(out.select("day")).isEmpty)
    // independent check on the busiest day: driver-side sweep
    val top = out.orderBy(col("max_concurrent").desc, col("day").asc).head()
    val day = top.getAs[java.sql.Date]("day").toString
    val iv = ev.select(unix_micros(col("ts")).as("t0"),
        (unix_micros(col("ts")) + 1800000000L).as("t1"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val d0 = java.time.LocalDate.parse(day).atStartOfDay(java.time.ZoneOffset.UTC)
      .toInstant.toEpochMilli * 1000L
    val d1 = d0 + 86400000000L
    val pts = iv.filter { case (a, b) => a < d1 && b > d0 }
      .flatMap { case (a, b) => Seq((math.max(a, d0), 1), (math.min(b, d1), -1)) }
    // ends (-1) sort before starts (+1) at the same instant: half-open
    val peak = pts.sortBy { case (t, dl) => (t, dl) }
      .scanLeft(0) { case (acc, (_, dl)) => acc + dl }.max
    assert(top.getAs[Long]("max_concurrent") === peak,
      s"sweep-line peak on $day must match the driver-side re-computation")
  }

  test("q87 fuzzy join: exactly the edit-distance-1 pairs, no cross join") {
    val out = AnalyticsQueries.q87(spark, sf).cache()
    assert(out.count() > 0, "synthetic names must yield 1-digit-apart pairs")
    // ground truth by brute force on the driver (bounded input set)
    val names = graft.sources.Tables.customer(spark, sf)
      .filter(col("c_custkey") < 2000L).select("c_custkey", "c_name")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val truth = (for {
      (ka, na) <- names; (kb, nb) <- names
      if ka < kb && lev(na, nb) <= 1
    } yield (ka, kb)).toSet
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === truth, "deletion-neighborhood blocking must be exact for ed<=1")
    // the plan must not contain a cartesian/BNL join (blocking, not brute force)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("q88 pagerank: rank mass conserved minus dangling leak, teleport floor") {
    val out = AnalyticsQueries.q88(spark, sf).cache()
    val n = out.count()
    assert(n > 0)
    // every rank >= teleport floor (1-d)/N, and total mass <= 1
    // (pr_micro = floor(1e6 * pr), so compare in micro-units with a
    // 1-unit truncation allowance per row)
    val floorMicro = math.floor(1e6 * 0.15 / n).toLong - 1
    assert(out.filter(col("pr_micro") < floorMicro).isEmpty)
    val mass = out.agg(sum("pr_micro")).head().getLong(0)
    assert(mass <= 1000000L && mass > 500000L - n,
      s"3-iteration rank mass $mass micro should be in (0.5e6, 1e6]")
  }

  test("q89 binning: deciles near-equal within type, ranges ordered and disjoint") {
    val out = AnalyticsQueries.q89(spark, sf).cache()
    // ntile balance: bin sizes differ by at most 1 within an event type
    val spread = out.groupBy("event_type")
      .agg((max("n_rows") - min("n_rows")).as("d"), count(lit(1)).as("bins"))
    assert(spread.filter(col("d") > 1).isEmpty)
    assert(spread.filter(col("bins") =!= 10).isEmpty, "10 bins per type")
    // value ranges must be non-decreasing across bins
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("bin")
    val bad = out.withColumn("prev_max", lag("max_value", 1).over(w))
      .filter(col("prev_max").isNotNull && col("min_value") < col("prev_max"))
    assert(bad.isEmpty, "bin b's min can never undercut bin b-1's max")
  }

  test("q90 zscore: per-type mean ~0, sample stddev ~1, all rows kept") {
    val out = AnalyticsQueries.q90(spark, sf).cache()
    assert(out.count() === graft.sources.Tables.events(spark, sf).count())
    // z_micro = floor(1e6 * z): truncation biases the mean by at most
    // 1 micro-unit (plus the floor's half-unit spread), sd unaffected
    // beyond that scale
    val stats = out.groupBy("event_type")
      .agg(avg(col("z_micro") / 1e6).as("m"),
        stddev_samp(col("z_micro") / 1e6).as("s"))
    assert(stats.filter(abs(col("m")) > 1e-4).isEmpty, "standardized mean ~ 0")
    assert(stats.filter(abs(col("s") - 1.0) > 1e-4).isEmpty, "standardized sd ~ 1")
  }

  test("q91 partial-merge aggregation equals a single full aggregation") {
    val out = AnalyticsQueries.q91(spark, sf)
    val full = graft.sources.Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("sc"))
      .select(col("user_id"), col("n_events"),
        (col("sc") / 100.0).as("sum_value"),
        (expr("sc * 10000 div n_events") / 1000000.0).as("avg_value"))
    assert(out.exceptAll(full).isEmpty && full.exceptAll(out).isEmpty,
      "history-partial + delta-partial merged must equal the full rebuild")
  }

  test("q92 interarrival: gaps non-negative, count = events - users") {
    val out = AnalyticsQueries.q92(spark, sf).cache()
    assert(out.filter(col("min_gap_us") < 0).isEmpty)
    assert(out.filter(col("max_gap_us") < col("min_gap_us")).isEmpty)
    val ev = graft.sources.Tables.events(spark, sf)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(out.agg(sum("n_gaps")).head().getLong(0) === expected,
      "each user with k events contributes exactly k-1 gaps")
  }

  test("q93 skew profile: top-5 by count, shares consistent and ordered") {
    val out = AnalyticsQueries.q93(spark, sf).cache()
    assert(out.count() === 5)
    // ranks 1..5 with non-increasing counts
    assert(out.orderBy("rank").collect().map(_.getAs[Long]("n_events"))
      .sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    // rank-1 really is the hottest key
    val hottest = graft.sources.Tables.events(spark, sf)
      .groupBy("user_id").count().orderBy(col("count").desc, col("user_id").asc)
      .head()
    val r1 = out.filter(col("rank") === 1).head()
    assert(r1.getAs[Long]("user_id") === hottest.getAs[Long]("user_id"))
    assert(r1.getAs[Long]("n_events") === hottest.getAs[Long]("count"))
  }

  test("q104 transitions: counts conserve events and probabilities row-normalize") {
    val out = AnalyticsQueries.q104(spark, sf).cache()
    try {
      val ev = graft.sources.Tables.events(spark, sf)
      // each user with k events contributes exactly k-1 transitions
      val expected = ev.count() - ev.select("user_id").distinct().count()
      assert(out.agg(sum("n_trans")).head().getLong(0) === expected)
      // per prev_type the conditional ppm probabilities sum to 1e6 minus
      // at most one truncated unit per matrix row (integer DIV floors)
      val sums = out.groupBy("prev_type")
        .agg(sum("p_trans_ppm").as("p"), count(lit(1)).as("k")).collect()
      assert(sums.nonEmpty)
      sums.foreach { r =>
        val p = r.getAs[Long]("p"); val k = r.getAs[Long]("k")
        assert(p <= 1000000L && p > 1000000L - k,
          s"prev=${r.get(0)} sums to $p over $k rows")
      }
      // matrix is at most |types|^2
      val nTypes = ev.select("event_type").distinct().count()
      assert(out.count() <= nTypes * nTypes)
    } finally out.unpersist()
  }

  test("q161 last-error enrichment equals a driver recompute") {
    // µs-precision comparisons: Timestamp.getTime truncates to ms, and
    // the operator under test orders by microseconds — a same-ms pair
    // differing in µs would make a ms-precision oracle wrong
    def us(t: java.sql.Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
    val ev = graft.sources.Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    val errors = ev.filter(_._4 == "error").groupBy(_._1)
    val expect = ev.filter(_._4 == "purchase").flatMap { p =>
      errors.getOrElse(p._1, Array.empty[(Long, java.sql.Timestamp, Long, String)])
        .filter(e => us(e._2) <= us(p._2))
        .sortBy(e => (us(e._2), e._3)).lastOption
        .map(e => (p._3, e._3))
    }.toSet
    val got = AnalyticsQueries.q161(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(got === expect, "each purchase must carry its freshest prior error")
    assert(got.nonEmpty)
  }

  test("q162 disorder audit: conservation and a watermark bound that holds") {
    val out = AnalyticsQueries.q162(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ev = graft.sources.Tables.events(spark, sf)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(out.map(_._2).sum === expected,
      "every event after a user's first arrival is audited exactly once")
    // day class must bracket its own max lateness
    out.foreach { case (d, _, mx) =>
      assert(mx / 86400000000L === d, s"class $d holds max $mx")
    }
    // the model adds at most 2 days of lateness, so the audit can
    // never report a deeper disorder than that
    assert(out.map(_._3).max < 2L * 86400000000L)
    assert(out.exists(_._1 > 0), "the lateness model must produce real disorder")
  }
}
