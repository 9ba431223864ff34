package graft

import org.apache.spark.sql.functions._

import graft.queries.AuditQueries
import graft.sources.Tables

/** Round-8 audit batch: Benford first-digit audit (q142), order↔line
  * reconciliation (q143), dormancy/reactivation profiling (q144), and
  * the signup→purchase survival buckets (q145).
  */
class AuditSpec extends SparkSpec {

  test("q142: per-type shares sum to ~1e6 and recount from raw data") {
    val out = AuditQueries.q142(spark, sf).collect()
    assert(out.nonEmpty)
    val raw = Tables.events(spark, sf).filter(col("value").isNotNull)
      .select(col("event_type"), round(col("value") * 100).cast("bigint"))
      .collect().map(r => (r.getString(0), r.getLong(1))).filter(_._2 >= 1)
    val byType = raw.groupBy(_._1)
    out.groupBy(_.getAs[String]("event_type")).foreach { case (t, rows) =>
      val total = byType(t).size.toLong
      // floor shares can undershoot 1e6 by at most the number of digits
      val shareSum = rows.map(_.getAs[Long]("observed_ppm")).sum
      assert(shareSum <= 1000000L && shareSum > 1000000L - 9)
      rows.foreach { r =>
        val d = r.getAs[Int]("digit")
        assert(d >= 1 && d <= 9)
        val n = byType(t).count(_._2.toString.head.asDigit == d).toLong
        assert(r.getAs[Long]("n") === n)
        assert(r.getAs[Long]("observed_ppm") === 1000000L * n / total)
        val exp = AuditQueries.BenfordPpm.toMap.apply(d)
        assert(r.getAs[Long]("expected_ppm") === exp)
        assert(r.getAs[Long]("delta_ppm") === 1000000L * n / total - exp)
      }
    }
  }

  test("q143: status rollup matches a driver-side recount; audit is exercised") {
    val out = AuditQueries.q143(spark, sf).collect()
      .map(r => r.getAs[String]("o_orderstatus") -> r).toMap
    val ord = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("bigint"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val lines = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), round(col("l_extendedprice") * 100).cast("bigint"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    ord.groupBy(_._2).foreach { case (st, os) =>
      val deltas = os.map(o => (o._3 - lines.getOrElse(o._1, 0L), lines.contains(o._1)))
      val r = out(st)
      assert(r.getAs[Long]("n_orders") === os.length.toLong)
      assert(r.getAs[Long]("n_orphan") === deltas.count(!_._2).toLong)
      assert(r.getAs[Long]("n_mismatch") === deltas.count(_._1 != 0L).toLong)
      assert(r.getAs[Long]("abs_delta_cents") === deltas.map(d => math.abs(d._1)).sum)
      assert(r.getAs[Long]("max_abs_delta_cents") === deltas.map(d => math.abs(d._1)).max)
    }
    assert(out.values.map(_.getAs[Long]("n_mismatch")).sum > 0,
      "synthetic headers and lines are independent — the audit must fire")
  }

  test("q144: gaps recount per user; reactivation threshold honored") {
    val out = AuditQueries.q144(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    val raw = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")),
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date")).cast("bigint"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    raw.groupBy(_._1).foreach { case (u, es) =>
      val sorted = es.sortBy(e => (e._3, e._2)).toSeq
      val gaps: Seq[Long] =
        if (sorted.size < 2) Seq.empty
        else sorted.sliding(2).map(p => p(1)._3 - p(0)._3).toSeq
      val r = out(u)
      assert(r.getAs[Long]("n_events") === es.length.toLong)
      assert(r.getAs[Long]("active_days") === es.map(_._4).distinct.length.toLong)
      if (gaps.nonEmpty) assert(r.getAs[Long]("max_gap_us") === gaps.max)
      assert(r.getAs[Long]("n_react") === gaps.count(_ > AuditQueries.DormantGapUs).toLong)
    }
  }

  test("q145: buckets partition the signup cohort; counts recount") {
    val out = AuditQueries.q145(spark, sf).collect()
      .map(r => r.getAs[String]("bucket") -> r.getAs[Long]("n_users")).toMap
    val raw = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val su = raw.filter(_._2 == "signup").groupBy(_._1).map { case (u, v) =>
      u -> v.map(_._3).min }
    val expected = su.toSeq.map { case (u, s) =>
      val p = raw.filter(e => e._1 == u && e._2 == "purchase" && e._3 >= s)
        .map(_._3).sorted.headOption
      p match {
        case None => "never"
        case Some(us) =>
          val d = (us - s) / 86400000000L
          if (d == 0) "same_day" else if (d <= 3) "d1_3"
          else if (d <= 7) "d4_7" else "d8_plus"
      }
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(out === expected)
    assert(out.values.sum === su.size.toLong, "every signed-up user lands in a bucket")
  }
}
