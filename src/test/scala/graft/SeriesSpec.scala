package graft

import org.apache.spark.sql.functions._

import graft.functions.NgramFunctions
import graft.queries.SeriesQueries
import graft.sources.Tables

/** Round-9 second batch: series diagnostics & layout planning
  * (q173–q177) plus the codegen'd CharNgramExpr they ride on.
  */
class SeriesSpec extends SparkSpec {

  /** Code-point n-grams — the reference CharNgramExpr and DuckDB both
    * compute: `String.sliding` walks UTF-16 code units, so it would
    * split an astral character (4-byte UTF-8, a surrogate pair in
    * UTF-16) that both engines treat as ONE char.
    */
  private def cpNgrams(s: String, n: Int): List[String] = {
    val cps = s.codePoints().toArray
      .map(cp => new String(Character.toChars(cp))).toList
    cps.sliding(n).filter(_.length == n).map(_.mkString).toList
  }

  test("charNgrams: boundary cases and UTF-8 code points") {
    val sp = spark
    import sp.implicits._
    val out = Seq("", "a", "ab", "abc", "héllo", (null: String))
      .toDF("s")
      .select(NgramFunctions.charNgrams(col("s"), 2).as("g"))
      .collect().map(r => Option(r.getSeq[String](0)).map(_.toList))
    assert(out(0) === Some(Nil))
    assert(out(1) === Some(Nil))
    assert(out(2) === Some(List("ab")))
    assert(out(3) === Some(List("ab", "bc")))
    assert(out(4) === Some(List("hé", "él", "ll", "lo")))
    assert(out(5) === None)
  }

  test("charNgrams: matches code-point sliding window for n = 1..4") {
    val sp = spark
    import sp.implicits._
    // includes an astral (4-byte UTF-8 / surrogate-pair) character:
    // one char to both engines, two UTF-16 units to String.sliding
    val texts = Seq("the quick brown fox", "ααβγ mixed ascii", "x", "a😀b")
    for (n <- 1 to 4) {
      val got = texts.toDF("s")
        .select(NgramFunctions.charNgrams(col("s"), n).as("g"))
        .collect().map(_.getSeq[String](0).toList)
      val want = texts.map(t => cpNgrams(t, n))
      assert(got.toList === want, s"n=$n")
    }
  }

  test("q173: num/den equal the brute-force centered cross products") {
    val daily = Tables.orders(spark, sf)
      .groupBy(expr("unix_micros(o_orderdate) div 86400000000").as("day"))
      .agg(expr("sum(cast(round(o_totalprice * 100) as bigint)) div 100").as("x"))
      .collect().map(r => (r.getAs[Long]("day"), r.getAs[Long]("x")))
      .sortBy(_._1)
    val xs = daily.map(_._2)
    val m = xs.sum / xs.length // integer floor-div mean, same as the query
    val ys = xs.map(_ - m)
    val den = ys.map(y => y * y).sum
    val out = SeriesQueries.q173(spark, sf).collect()
      .map(r => r.getAs[Long]("lag_k") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("num"),
          r.getAs[Long]("den"), r.getAs[Long]("n_days"),
          r.getAs[Long]("unit_scale"))).toMap
    assert(out.keySet === (1L to 7L).toSet)
    for (k <- 1 to 7) {
      val prods = ys.dropRight(k).zip(ys.drop(k)).map { case (a, b) => a * b }
      // unit_scale is 1 at test scale, so the scaled sums ARE the raw ones
      assert(out(k.toLong) ===
        ((xs.length - k).toLong, prods.sum, den, xs.length.toLong, 1L),
        s"lag=$k")
    }
  }

  test("q173 unit scale engages on a corpus-scale series and keeps den in int64") {
    val s2 = spark
    import s2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_acf3").toString
    // 400 days of ~3e9-dollar totals with ±1e9 structure: the naive
    // dollars-unit den would be ~400·(1e9)² = 4e20 > 2^63 (the sf3
    // overflow this guards), the scaled one must fit with room
    val rows = (0 until 400).map { d =>
      val ts = java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2020, 1, 1).plusDays(d).atStartOfDay())
      (ts, 3.0e9 + 1.0e9 * math.sin(d * 0.9))
    }
    rows.toDF("o_orderdate", "o_totalprice").write.parquet(s"$dir/orders.parquet")
    val out = SeriesQueries.q173(spark, dir).collect()
    assert(out.length == 7)
    val us = out.head.getAs[Long]("unit_scale")
    assert(us > 1L, s"scale must engage on 1e9-deviation days, got us=$us")
    out.foreach { r =>
      assert(r.getAs[Long]("den") > 0 && r.getAs[Long]("den") <= (1L << 62),
        "scaled den must respect the designed 2^62 bound")
    }
    // the scaled integer ratio still IS the acf: compare against the
    // double brute force within the documented truncation error
    val xs = rows.map(_._2)
    val m = xs.sum / xs.length
    val ys = xs.map(_ - m)
    val denD = ys.map(y => y * y).sum
    for (r <- out) {
      val k = r.getAs[Long]("lag_k").toInt
      val numD = ys.dropRight(k).zip(ys.drop(k)).map { case (a, b) => a * b }.sum
      val got = r.getAs[Long]("num").toDouble / r.getAs[Long]("den").toDouble
      assert(math.abs(got - numD / denD) < 1e-3,
        s"lag=$k: scaled acf $got vs brute ${numD / denD}")
    }
  }

  test("q174: ewma is the exact integer dot product of the trailing 14 days") {
    val daily = Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("c"))
      .collect().map(r => (r.getAs[Long]("day"), r.getAs[Long]("c")))
      .sortBy(_._1)
    val out = SeriesQueries.q174(spark, sf).collect()
      .map(r => r.getAs[Long]("day") ->
        (r.getAs[Long]("c"), r.getAs[Long]("ewma_scaled"),
          r.getAs[Long]("dev"), r.getAs[String]("flag"))).toMap
    assert(out.size === daily.length - 14, "one row per day past the warmup")
    for (i <- 14 until daily.length) {
      val (day, c) = daily(i)
      val ew = SeriesQueries.EwmaWeights.zipWithIndex
        .map { case (w, k) => w * daily(i - k - 1)._2 }.sum
      val dev = c * SeriesQueries.EwmaWSum - ew
      val flag = if (math.abs(dev) * 10 > ew * 3) "spike" else "ok"
      assert(out(day) === ((c, ew, dev, flag)), s"day=$day")
    }
    // the flag rule itself must be live: a 31% jump over flat history
    // spikes (the baseline excludes the day under test, so the jump
    // can't damp itself below the threshold)
    val spikeEw = SeriesQueries.EwmaWeights.map(_ * 1000L).sum
    assert(math.abs(1310L * SeriesQueries.EwmaWSum - spikeEw) * 10 > spikeEw * 3)
    assert(math.abs(1290L * SeriesQueries.EwmaWSum - spikeEw) * 10 <= spikeEw * 3,
      "a 29% jump stays below the threshold")
  }

  test("q175: greedy prefix-sum bins — in order, never splitting, near target") {
    val rows = SeriesQueries.q175(spark, sf).collect()
      .map(r => (r.getAs[Long]("chunk"), r.getAs[Long]("est_bytes"),
        r.getAs[Long]("cum_before"), r.getAs[Long]("bin")))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    var cum = 0L
    for ((chunk, bytes, cumBefore, bin) <- rows) {
      assert(cumBefore === cum, s"prefix sum at chunk=$chunk")
      assert(bin === cum / 262144L, s"bin assignment at chunk=$chunk")
      cum += bytes
    }
    val bins = rows.map(_._4)
    assert(bins === bins.sorted, "bins are nondecreasing in chunk order")
    // each bin's payload stays within one chunk of the 256 KiB target
    rows.groupBy(_._4).foreach { case (bin, rs) =>
      val total = rs.map(_._2).sum
      assert(total < 262144L + rs.map(_._2).max,
        s"bin $bin overshoots by more than its last chunk")
    }
  }

  test("Compactor.compact executes the q175 plan: one dir per bin, rows conserved") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val li = Tables.lineitem(spark, sf)
    val chunk = expr("unix_micros(l_shipdate) div 2592000000000")
    val bpr = length(col("l_returnflag")) + length(col("l_linestatus")) + lit(72L)
    val manifest = graft.operators.Compactor
      .compact(li, chunk, bpr, 262144L, dir).collect()
      .map(r => r.getAs[Long]("bin") ->
        (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_rows"),
          r.getAs[Long]("est_bytes"))).toMap
    // manifest == the oracle-checked q175 plan rolled up per bin
    val plan = graft.queries.SeriesQueries.q175(spark, sf).collect()
      .map(r => (r.getAs[Long]("chunk"), r.getAs[Long]("est_bytes"),
        r.getAs[Long]("bin")))
    val want = plan.groupBy(_._3).map { case (bin, cs) =>
      bin -> (cs.length.toLong, cs.map(_._2).sum)
    }
    assert(manifest.keySet === want.keySet)
    want.foreach { case (bin, (nChunks, bytes)) =>
      assert(manifest(bin)._1 === nChunks, s"bin=$bin")
      assert(manifest(bin)._3 === bytes, s"bin=$bin")
    }
    assert(manifest.values.map(_._2).sum === li.count(), "rows conserved")
    // the written layout is one directory per planned bin, rows intact
    val back = spark.read.parquet(dir)
    assert(back.count() === li.count())
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("bin=")).map(_.stripPrefix("bin=").toLong)
    assert(dirs.toSet === want.keySet)
    assert(back.groupBy("bin").count().collect()
      .map(r => r.getAs[Long]("bin") -> r.getAs[Long]("count")).toMap
      === manifest.map { case (b, (_, n, _)) => b -> n })
    // idempotent re-delivery: a re-run overwrites to the same state
    val again = graft.operators.Compactor
      .compact(li, chunk, bpr, 262144L, dir).collect()
      .map(r => r.getAs[Long]("bin") ->
        (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_rows"),
          r.getAs[Long]("est_bytes"))).toMap
    assert(again === manifest)
    assert(spark.read.parquet(dir).count() === li.count())
    // inputs that already carry the working column names are refused
    // loudly — 'bin' would make the post-join drop ambiguous, '__chunk'
    // would be silently overwritten
    Seq("bin", "__chunk").foreach { c =>
      intercept[IllegalArgumentException] {
        graft.operators.Compactor.compact(
          li.withColumn(c, lit(1L)), chunk, bpr, 262144L, s"$dir-clash")
      }
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("q176: shares sum to ~1e6 per region and match brute force") {
    val out = SeriesQueries.q176(spark, sf).collect()
      .map(r => (r.getAs[String]("r_name"), r.getAs[Long]("dow")) ->
        (r.getAs[Long]("rev_cents"), r.getAs[Long]("share_ppm"),
          r.getAs[Long]("index_ppm"))).toMap
    val cust = Tables.customer(spark, sf).collect()
      .map(r => r.getAs[Long]("c_custkey") -> r.getAs[Int]("c_nationkey")).toMap
    val natToReg = Tables.nation(spark, sf).collect()
      .map(r => r.getAs[Int]("n_nationkey") -> r.getAs[Int]("n_regionkey")).toMap
    val regName = Tables.region(spark, sf).collect()
      .map(r => r.getAs[Int]("r_regionkey") -> r.getAs[String]("r_name")).toMap
    val brute = Tables.orders(spark, sf)
      .select(col("o_custkey"), expr("unix_micros(o_orderdate) div 86400000000"),
        expr("cast(round(o_totalprice * 100) as bigint)"))
      .collect()
      .map(r => (regName(natToReg(cust(r.getLong(0)))),
        (r.getLong(1) + 4) % 7, r.getLong(2)))
      .groupBy(t => (t._1, t._2)).map { case (k, ts) => k -> ts.map(_._3).sum }
    assert(out.keySet === brute.keySet)
    brute.foreach { case (k, cents) => assert(out(k)._1 === cents, s"key=$k") }
    out.keySet.groupBy(_._1).foreach { case (region, keys) =>
      val tot = keys.toSeq.map(k => out(k)._1).sum
      keys.foreach { k =>
        assert(out(k)._2 === out(k)._1 * 1000000L / tot)
        assert(out(k)._3 === out(k)._1 * 7000000L / tot)
      }
      val shareSum = keys.toSeq.map(k => out(k)._2).sum
      assert(shareSum > 1000000L - 7 && shareSum <= 1000000L,
        s"region=$region floor-rounded shares")
    }
  }

  test("q183: LTV curves recount from a driver-side cohort replay") {
    val out = SeriesQueries.q183(spark, sf).collect()
      .map(r => (r.getAs[Long]("cohort_day"), r.getAs[Long]("week_n")) ->
        (r.getAs[Long]("cohort_size"), r.getAs[Long]("week_cents"),
          r.getAs[Long]("cum_cents"), r.getAs[Long]("ltv_per_user_cents"))).toMap
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        expr("cast(round(value * 100) as bigint)").as("cents"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3)))
    val cohort = ev.groupBy(_._1).map { case (u, xs) => u -> xs.map(_._4).min }
    val sizes = cohort.values.groupBy(identity).map { case (d, c) => d -> c.size.toLong }
    val weekly = ev
      .collect { case (u, "purchase", Some(c), d) => ((cohort(u), (d - cohort(u)) / 7), c) }
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
    assert(out.keySet === weekly.keySet)
    weekly.keySet.groupBy(_._1).foreach { case (cd, keys) =>
      var cum = 0L
      keys.toSeq.sortBy(_._2).foreach { k =>
        cum += weekly(k)
        assert(out(k) === ((sizes(cd), weekly(k), cum, cum / sizes(cd))), s"key=$k")
      }
    }
    // LTV is nondecreasing in week within a cohort
    out.keySet.groupBy(_._1).foreach { case (_, keys) =>
      val ltvs = keys.toSeq.sortBy(_._2).map(k => out(k)._4)
      assert(ltvs === ltvs.sorted)
    }
  }

  test("q177: top-50 char bigrams equal brute force with the same tie-break") {
    val out = SeriesQueries.q177(spark, sf).collect()
      .map(r => (r.getAs[String]("gram"), r.getAs[Long]("n"), r.getAs[Long]("rnk")))
      .sortBy(_._3)
    val counts = Tables.documents(spark, sf).select("text").collect()
      .iterator.flatMap(r => cpNgrams(r.getString(0), 2))
      .foldLeft(Map.empty[String, Long]) { (m, g) => m.updated(g, m.getOrElse(g, 0L) + 1L) }
    val want = counts.toSeq.sortBy { case (g, n) => (-n, g) }.take(50)
      .zipWithIndex.map { case ((g, n), i) => (g, n, i + 1L) }
    assert(out.toList === want.toList)
  }
}
