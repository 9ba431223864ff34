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
    // and against a driver-side reference — on epoch micros, so the spec
    // is agnostic to the session's NTZ-vs-LTZ read of the parquet column
    val wins = windows
      .select(unix_micros(col("win_start")), unix_micros(col("win_end")))
      .collect().map(w => (w.getLong(0), w.getLong(1)))
    val manual = Tables.lineitem(spark, sf)
      .select(unix_micros(col("l_shipdate"))).collect().map { r =>
        val ts = r.getLong(0)
        wins.count { case (s, e) => ts >= s && ts <= e }
      }.map(_.toLong).sum
    assert(naive.count() === manual)
  }

  test("non-deterministic point sides are left alone (clamp would resample)") {
    // the clamp subqueries would RE-EXECUTE this plan; with rand() in it
    // they could sample different rows than the join scan and clamp away
    // needed buckets — the rule must refuse to fire
    // NOTE: an always-true rand() FILTER gets constant-folded away before
    // the rule runs; a rand() PROJECTION is kept (it is in the output)
    // and marks the plan non-deterministic without changing the row set
    val ndPoints = Tables.lineitem(spark, sf)
      .select(col("l_shipdate"), col("l_quantity"), rand(7L).as("nd"))
    val j = ndPoints.join(windows,
      col("l_shipdate") >= col("win_start") && col("l_shipdate") <= col("win_end"))
    val phys = j.queryExecution.executedPlan.toString
    assert(!phys.contains("Generate explode"),
      "rule fired on a non-deterministic points side:\n" + phys)
    assert(j.count() === naive.count(), "fallback join must still be correct")
  }

  test("equi-keyed range joins are left alone (as-of join still correct)") {
    // q12 has an equality conjunct — the rule must not touch it
    val q12 = SparkEntry.queries("q12_asof_join")(spark, sf)
    assert(q12.count() > 0)
  }

  test("open-ended sentinel intervals are clamped to the points' span, not 96k buckets") {
    val ss = spark; import ss.implicits._
    val points = Seq("1995-06-01 00:00:00", "2005-01-15 12:00:00")
      .toDF("p").select(to_timestamp(col("p")).as("ts"))
    val intervals = Seq(
      ("narrow", "1995-05-01 00:00:00", "1995-07-01 00:00:00"),
      ("open", "1990-01-01 00:00:00", "9999-12-31 00:00:00"))
      .toDF("tag", "s", "e")
      .select(col("tag"), to_timestamp(col("s")).as("win_start"),
        to_timestamp(col("e")).as("win_end"))
    val joined = points.join(intervals,
      col("ts") >= col("win_start") && col("ts") <= col("win_end"))
    // narrow matches point 1; open matches both → 3 rows
    assert(joined.count() === 3)
    // the sentinel row must NOT explode into ~96k month buckets: the
    // bucket sequence is clamped to the points' min/max month via
    // injected scalar subqueries, and the join stays a hash join
    val opt = joined.queryExecution.optimizedPlan.toString
    assert(opt.contains("scalar-subquery"), "month-span clamp missing:\n" + opt)
    val phys = joined.queryExecution.executedPlan.toString
    assert(!phys.contains("CartesianProduct"), phys)
    assert(!phys.contains("BroadcastNestedLoopJoin"), phys)
    assert(phys.contains("Generate explode"), "bucketed branch missing:\n" + phys)
  }
}
