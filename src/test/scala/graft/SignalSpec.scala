package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.queries.SignalQueries
import graft.sources.Tables

/** Round-8 signal queries: rank fusion, burst detection, vocabulary
  * coverage, A/B lift, template clustering.
  */
class SignalSpec extends SparkSpec {

  test("q130: RRF fusion — contiguous ranks, exact integer fusion of both lists") {
    val rows = SignalQueries.q130(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val ranks = rows.map(_.getAs[Int]("rnk")).sorted
    assert(ranks.sameElements(1 to rows.length), "ranks must be contiguous from 1")
    rows.foreach { r =>
      val lex = Option(r.getAs[Integer]("lex_rnk")).map(_.intValue)
      val sem = Option(r.getAs[Integer]("sem_rnk")).map(_.intValue)
      val expected =
        lex.map(x => 1000000000L / (SignalQueries.RrfK + x)).getOrElse(0L) +
          sem.map(x => 1000000000L / (SignalQueries.RrfK + x)).getOrElse(0L)
      assert(r.getAs[Long]("rrf_fp") === expected,
        s"doc ${r.getAs[Long]("doc_id")}: rrf must be the exact integer sum")
      assert(lex.isDefined || sem.isDefined, "fused docs come from at least one list")
    }
    // descending by (rrf, doc_id): the rank order is the sort order
    val sortedRows = rows.sortBy(r => (-r.getAs[Long]("rrf_fp"), r.getAs[Long]("doc_id")))
    assert(sortedRows.map(_.getAs[Int]("rnk")).sameElements(1 to rows.length))
  }

  test("q131: burst baseline equals the recomputed trailing 7-day sum") {
    val out = SignalQueries.q131(spark, sf).collect()
    assert(out.nonEmpty)
    // independent recomputation from the raw (type, day) counts
    val daily = Tables.events(spark, sf)
      .select(col("event_type"), col("ts").cast("date").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate) -> r.getLong(2))
      .toMap
    out.foreach { r =>
      val t = r.getAs[String]("event_type")
      val d = r.getAs[java.sql.Date]("day").toLocalDate
      val prior = (1 to 7).flatMap(i => daily.get((t, d.minusDays(i))))
      assert(prior.size === 7, s"($t,$d) emitted without a full baseline")
      assert(r.getAs[Long]("base7") === prior.sum)
      assert(r.getAs[Long]("ratio_ppm") ===
        7L * r.getAs[Long]("n") * 1000000L / prior.sum)
    }
  }

  test("q132: coverage curve is monotone and equals the naive rank-window answer") {
    val out = SignalQueries.q132(spark, sf).collect()
      .map(r => r.getAs[Int]("p") ->
        (r.getAs[Long]("need"), r.getAs[Long]("vocab_size"), r.getAs[Long]("covered")))
      .toMap
    assert(out.keySet === Set(50, 90, 95, 99))
    val sizes = Seq(50, 90, 95, 99).map(out(_)._2)
    assert(sizes === sizes.sorted, "vocab_size must be monotone in p")
    out.foreach { case (p, (need, _, covered)) =>
      assert(covered >= need, s"p=$p: covered mass must reach the target")
    }
    // naive formulation: literal token ranks (count desc, token asc)
    val vocab = Tables.documents(spark, sf)
      .select(explode(TextFunctions.wsTokens(lower(col("text")))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c"))
    val w = Window.orderBy(col("c").desc, col("token").asc)
    val ranked = vocab
      .withColumn("r", row_number().over(w))
      .withColumn("cum", sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .collect().map(r => (r.getAs[Int]("r").toLong, r.getAs[Long]("cum"))).sorted
    val total = ranked.last._2
    Seq(50, 90, 95, 99).foreach { p =>
      val need = (p.toLong * total + 99) / 100
      val (rk, cum) = ranked.find(_._2 >= need).get
      assert(out(p) === ((need, rk, cum)), s"p=$p disagrees with the naive window answer")
    }
  }

  test("q133: arm partition is exhaustive and rates are floor fixed-point") {
    val r = SignalQueries.q133(spark, sf).collect().head
    val totalUsers = Tables.events(spark, sf).select("user_id").distinct().count()
    val ua = r.getAs[Long]("users_a"); val ub = r.getAs[Long]("users_b")
    val ca = r.getAs[Long]("conv_a"); val cb = r.getAs[Long]("conv_b")
    assert(ua + ub === totalUsers, "every user lands in exactly one arm")
    assert(ca <= ua && cb <= ub)
    assert(r.getAs[Long]("rate_a_ppm") === ca * 1000000L / ua)
    assert(r.getAs[Long]("rate_b_ppm") === cb * 1000000L / ub)
    if (cb > 0) {
      val expected = r.getAs[Long]("rate_a_ppm") * 1000000L /
        r.getAs[Long]("rate_b_ppm") - 1000000L
      assert(r.getAs[Long]("lift_ppm") === expected)
    }
  }

  test("q134: every template cluster recounts to its membership") {
    val out = SignalQueries.q134(spark, sf).collect()
    assert(out.forall(_.getAs[Long]("n_docs") >= 3))
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"),
        TextFunctions.wsTokens(lower(col("text"))).as("toks"))
      .filter(size(col("toks")) >= 2)
      .withColumn("prefix", concat_ws(" ", slice(col("toks"), 1, 2)))
      .select("doc_id", "lang", "prefix")
      .collect()
    out.foreach { r =>
      val members = docs.filter(_.getAs[String]("prefix") == r.getAs[String]("prefix"))
      assert(members.length === r.getAs[Long]("n_docs"))
      assert(members.map(_.getAs[String]("lang")).distinct.length === r.getAs[Long]("n_langs"))
      assert(members.map(_.getAs[Long]("doc_id")).min === r.getAs[Long]("first_doc"))
    }
    // and no qualifying cluster is missed
    val expected = docs.groupBy(_.getAs[String]("prefix"))
      .filter(_._2.length >= 3).keySet
    assert(out.map(_.getAs[String]("prefix")).toSet === expected)
  }

  test("q135: cdf_ppm equals the naive rank recount and ends at 1e6") {
    val out = SignalQueries.q135(spark, sf).collect()
    assert(out.nonEmpty)
    val cents = Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(col("event_type"), round(col("value") * 100).cast("bigint").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byType = cents.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    out.foreach { r =>
      val t = r.getAs[String]("event_type"); val v = r.getAs[Long]("cents")
      val vals = byType(t)
      assert(r.getAs[Long]("cnt") === vals.count(_ == v))
      assert(r.getAs[Long]("cdf_ppm") ===
        vals.count(_ <= v).toLong * 1000000L / vals.length)
    }
    // the largest value of every type closes the CDF at exactly 1e6
    out.groupBy(_.getAs[String]("event_type")).foreach { case (_, rows) =>
      assert(rows.maxBy(_.getAs[Long]("cents")).getAs[Long]("cdf_ppm") === 1000000L)
    }
  }

  test("q136: histogram bounds equal literal rank-window order statistics") {
    val out = SignalQueries.q136(spark, sf).collect()
    assert(out.nonEmpty)
    val cents = Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(col("event_type"), round(col("value") * 100).cast("bigint").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    out.foreach { r =>
      val vals = cents(r.getAs[String]("event_type"))
      val n = vals.length
      val lo = vals(((n + 99) / 100 - 1).toInt)
      val hi = vals(((99 * n + 99) / 100 - 1).toInt)
      assert(r.getAs[Long]("n_events") === n.toLong)
      assert(r.getAs[Long]("lo_cents") === lo && r.getAs[Long]("hi_cents") === hi)
      assert(r.getAs[Long]("n_clip_lo") === vals.count(_ < lo))
      assert(r.getAs[Long]("n_clip_hi") === vals.count(_ > hi))
      assert(r.getAs[Long]("sum_cents") === vals.sum)
      assert(r.getAs[Long]("sum_winsor") ===
        vals.map(v => math.max(math.min(v, hi), lo)).sum)
      assert(r.getAs[Long]("sum_winsor") <= r.getAs[Long]("sum_cents") ||
        r.getAs[Long]("n_clip_lo") > 0)
    }
  }

  test("q137: attribution conserves purchases and matches a replay") {
    val out = SignalQueries.q137(spark, sf).collect()
      .map(r => r.getAs[String]("channel") ->
        (r.getAs[Long]("n_purchases"), r.getAs[Long]("cents_total"))).toMap
    val events = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        round(col("value") * 100).cast("bigint").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getLong(4)))
    // driver replay: walk each user's stream in (ts, event_id) order
    val replay = scala.collection.mutable.Map.empty[String, (Long, Long)]
    events.groupBy(_._1).foreach { case (_, es) =>
      var lastNp: String = null
      es.sortBy(e => (e._2.getTime, e._2.getNanos, e._3)).foreach { e =>
        if (e._4 == "purchase") {
          val ch = if (lastNp == null) "direct" else lastNp
          val (c, s0) = replay.getOrElse(ch, (0L, 0L))
          replay(ch) = (c + 1, s0 + e._5)
        } else lastNp = e._4
      }
    }
    assert(out === replay.toMap)
    assert(out.values.map(_._1).sum === events.count(_._4 == "purchase").toLong,
      "every purchase is attributed exactly once")
  }

  test("q138: scaled errors recount from the daily frame; winner is argmin") {
    val out = SignalQueries.q138(spark, sf).collect()
    assert(out.nonEmpty)
    val daily = Tables.events(spark, sf)
      .select(col("event_type"), col("ts").cast("date").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate) -> r.getLong(2)).toMap
    out.foreach { r =>
      val t = r.getAs[String]("event_type")
      val days = daily.keys.filter(_._1 == t).map(_._2)
      val scored = days.toSeq.sortBy(_.toEpochDay).flatMap { d =>
        val base = (1 to 7).flatMap(i => daily.get((t, d.minusDays(i))))
        val l7 = daily.get((t, d.minusDays(7)))
        if (base.size == 7 && l7.isDefined)
          Some((daily((t, d)), base.sum, l7.get))
        else None
      }
      assert(r.getAs[Long]("n_scored") === scored.size.toLong)
      val naive = scored.map { case (y, _, l) => math.abs(7 * y - 7 * l) }.sum
      val mean7 = scored.map { case (y, b, _) => math.abs(7 * y - b) }.sum
      assert(r.getAs[Long]("sae_naive_x7") === naive)
      assert(r.getAs[Long]("sae_mean_x7") === mean7)
      assert(r.getAs[String]("better") === (if (naive <= mean7) "naive" else "mean7"))
    }
  }
}
