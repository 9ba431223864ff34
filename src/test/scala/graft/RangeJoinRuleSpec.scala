package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The RangeJoinRewrite optimizer rule must turn a naive keyless
  * interval join into a hash-joinable plan with identical results.
  */
class RangeJoinRuleSpec extends SparkSpec {

  private def windows = Tables.orders(spark, sf)
    .groupBy("o_orderpriority")
    .agg(min(col("o_orderdate")).as("win_start"))
    .withColumn("win_end", col("win_start") + expr("INTERVAL 30 DAYS"))

  private def naive = Tables.lineitem(spark, sf)
    .select("l_shipdate", "l_quantity")
    .join(windows,
      col("l_shipdate") >= col("win_start") && col("l_shipdate") <= col("win_end"))

  test("rewritten plan has no cartesian or nested-loop join") {
    val phys = naive.queryExecution.executedPlan.toString
    assert(!phys.contains("CartesianProduct"), phys)
    assert(!phys.contains("BroadcastNestedLoopJoin"), phys)
    assert(phys.contains("Generate explode"), "bucket explode missing:\n" + phys)
  }

  test("rewritten join returns exactly the naive-semantics rows") {
    val expected = graft.operators.RangeJoin.pointInInterval(
      Tables.lineitem(spark, sf).select("l_shipdate", "l_quantity"),
      "l_shipdate", windows, "win_start", "win_end", "month").count()
    assert(naive.count() === expected)
    // and against a driver-side reference (NTZ collects as LocalDateTime)
    val wins = windows.collect().map(w =>
      (w.getAs[java.time.LocalDateTime]("win_start"),
        w.getAs[java.time.LocalDateTime]("win_end")))
    val manual = Tables.lineitem(spark, sf).select("l_shipdate").collect().map { r =>
      val ts = r.getAs[java.time.LocalDateTime](0)
      wins.count { case (s, e) => !ts.isBefore(s) && !ts.isAfter(e) }
    }.map(_.toLong).sum
    assert(naive.count() === manual)
  }

  test("equi-keyed range joins are left alone (as-of join still correct)") {
    // q12 has an equality conjunct — the rule must not touch it
    val q12 = SparkEntry.queries("q12_asof_join")(spark, sf)
    assert(q12.count() > 0)
  }
}
