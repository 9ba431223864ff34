package graft

import org.apache.spark.sql.functions._

import graft.queries.RiskQueries
import graft.sources.Tables

/** Round-8 seventh batch: self-calibrated purchase outliers (q150) and
  * per-priority fulfillment-latency percentiles (q151).
  */
class RiskSpec extends SparkSpec {

  test("q150: flags exactly the brute-force 3-sigma-vs-own-history set") {
    val out = RiskQueries.q150(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[Long]("cents"), r.getAs[Long]("n"), r.getAs[Long]("sum_c"))).toSet
    val p = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase" && col("value").isNotNull)
      .select(col("user_id"), col("event_id"), round(col("value") * 100).cast("bigint"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = p.groupBy(_._1).toSeq
      .filter(_._2.length >= RiskQueries.MinHistory)
      .flatMap { case (u, ps) =>
        val n = ps.length.toLong
        val s = ps.map(_._3).sum
        val ssq = ps.map(e => e._3 * e._3).sum
        ps.filter { e =>
          val dev = e._3 * n - s
          dev * dev > 9L * (n * ssq - s * s)
        }.map(e => (u, e._2, e._3, n, s))
      }.toSet
    assert(out === expected)
    assert(out.nonEmpty, "test data must exercise the outlier filter")
  }

  test("q151: percentiles equal a driver-side sort's type-1 ranks") {
    val out = RiskQueries.q151(spark, sf).collect()
      .map(r => r.getAs[String]("o_orderpriority") -> r).toMap
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate").cast("date"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDate(2).toLocalDate))
    val byKey = o.map(r => r._1 -> r).toMap
    val l = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_shipdate").cast("date"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val lat = l.flatMap { case (k, sd) =>
      byKey.get(k).map { case (_, pr, od) =>
        pr -> java.time.temporal.ChronoUnit.DAYS.between(od, sd)
      }
    }
    lat.groupBy(_._1).foreach { case (pr, xs) =>
      val sorted = xs.map(_._2).sorted
      val n = sorted.length
      def kth(p: Int) = sorted(((p.toLong * n + 99) / 100).toInt - 1)
      val r = out(pr)
      assert(r.getAs[Long]("n_lines") === n.toLong)
      assert(r.getAs[Long]("min_days") === sorted.head)
      assert(r.getAs[Long]("p50_days") === kth(50))
      assert(r.getAs[Long]("p90_days") === kth(90))
      assert(r.getAs[Long]("max_days") === sorted.last)
    }
    assert(out.size === 5)
  }
}
