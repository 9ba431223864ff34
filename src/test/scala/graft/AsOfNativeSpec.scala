package graft

import org.apache.spark.sql.functions._

import graft.plans.AsOfNative

class AsOfNativeSpec extends SparkSpec {

  private def factsAndVersions = {
    val ev = graft.sources.Tables.events(spark, sf)
    val facts = ev.filter(col("event_id") % 2 === 0)
      .select(col("event_id").as("f_id"), col("user_id").as("f_user"),
        col("ts").as("f_ts"))
    val vers = ev.filter(col("event_id") % 2 === 1)
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("v_id"), col("event_type").as("v_state"))
    (facts, vers)
  }

  test("native as-of equals the composed interval as-of on the fixture") {
    val (facts, vers) = factsAndVersions
    val native = AsOfNative.join(facts, vers, "f_user", "f_ts", "v_user", "v_ts", "v_id")
      .select(col("f_id"), col("v_state"), col("v_ts"))
    val ev = graft.sources.Tables.events(spark, sf)
    val dim = graft.operators.Scd.buildHistory(
      ev.filter(col("event_id") % 2 === 1), "user_id", "ts", "event_id", Seq("event_type"))
    val composed = graft.operators.Scd.asOfJoin(
      ev.filter(col("event_id") % 2 === 0)
        .select(col("event_id").as("f_id"), col("user_id").as("f_user"), col("ts").as("f_ts")),
      dim, "f_user", "user_id", "f_ts")
      .select(col("f_id"), col("event_type").as("v_state"),
        col("effective_from").as("v_ts"))
    assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty,
      "one-pass merge must equal interval-join semantics")
    assert(native.count() > 0)
  }

  test("plan: AsOfJoinExec with clustered exchanges, no BNLJ/cartesian") {
    val (facts, vers) = factsAndVersions
    // executedPlan is AQE-wrapped — assert on the rendered tree, which
    // includes the inner plan (the PlanLintSpec convention)
    val s = AsOfNative.join(facts, vers, "f_user", "f_ts", "v_user", "v_ts", "v_id")
      .queryExecution.executedPlan.toString
    assert(s.contains("AsOfJoin"), s"no AsOfJoinExec in:\n$s")
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"))
  }

  test("ties break on the tie column; exact-timestamp versions match; nulls drop") {
    val s2 = spark
    import s2.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-02 00:00:00")
    val facts = Seq(
      (1L, 10L, t1),          // after both versions of key 10
      (2L, 10L, t0),          // exactly at the tied version timestamps
      (3L, 20L, t0),          // key with no versions
      (4L, 30L, t0)           // fact BEFORE key 30's only version
    ).toDF("f_id", "f_user", "f_ts")
    val vers = Seq(
      (10L, t0, 1L, "a"), (10L, t0, 2L, "b"), // tie at t0: v_id 2 wins
      (30L, t1, 3L, "c")
    ).toDF("v_user", "v_ts", "v_id", "v_state")
    val out = AsOfNative.join(facts, vers, "f_user", "f_ts", "v_user", "v_ts", "v_id")
      .select("f_id", "v_state", "v_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(out === Set((1L, "b", 2L), (2L, "b", 2L)),
      "tie must resolve to the larger tie value; unmatched facts drop")

    val withNull = Seq((5L, Option.empty[Long], Option(t1)))
      .toDF("f_id", "f_user", "f_ts")
    val out2 = AsOfNative.join(withNull, vers, "f_user", "f_ts", "v_user", "v_ts", "v_id")
    assert(out2.isEmpty, "null keys never match")
  }

  test("correct across adversarial partitionings of both inputs") {
    val (facts, vers) = factsAndVersions
    val reference = AsOfNative.join(facts, vers, "f_user", "f_ts", "v_user", "v_ts", "v_id")
      .select("f_id", "v_id")
    val scrambled = AsOfNative.join(
      facts.repartition(7, col("f_ts")), vers.repartition(3, col("v_state")),
      "f_user", "f_ts", "v_user", "v_ts", "v_id")
      .select("f_id", "v_id")
    assert(scrambled.exceptAll(reference).isEmpty && reference.exceptAll(scrambled).isEmpty,
      "EnsureRequirements must re-cluster both sides by key")
  }
}
