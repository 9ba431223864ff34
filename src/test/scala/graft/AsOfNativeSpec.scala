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

  test("left-outer mode equals the composed left-outer form under adversarial partitioning") {
    val (facts, vers) = factsAndVersions
    val native = AsOfNative.join(
      facts.repartition(7, col("f_ts")), vers.repartition(3, col("v_state")),
      "f_user", "f_ts", "v_user", "v_ts", "v_id", joinType = "left_outer")
      .select("f_id", "v_id", "v_state")
    // composed reference: inner as-of result left-joined back onto facts
    val inner = AsOfNative.join(facts, vers, "f_user", "f_ts", "v_user", "v_ts", "v_id")
      .select(col("f_id").as("j_id"), col("v_id"), col("v_state"))
    val composed = facts.join(inner, facts("f_id") === inner("j_id"), "left_outer")
      .select("f_id", "v_id", "v_state")
    assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty,
      "left-outer merge must equal inner + null-extension")
    assert(native.count() == facts.count(), "left outer preserves every fact")
    assert(native.filter(col("v_id").isNull).count() > 0,
      "the fixture has facts before any version — they must null-extend")
    // the outer output schema must declare the version side nullable
    assert(native.schema("v_id").nullable && native.schema("v_state").nullable)
  }

  test("within tolerance equals the composed filtered form, inner and outer, " +
    "under adversarial partitioning") {
    val (facts, vers) = factsAndVersions
    val tolMicros = 3600L * 1000000L // one hour
    // composed reference: unbounded inner as-of, post-filtered to the
    // tolerance window (the latest at-or-before IS the latest within the
    // window whenever any window match exists — versions arrive in ts
    // order, so the two formulations agree row-for-row)
    val inner = AsOfNative.join(facts, vers,
      "f_user", "f_ts", "v_user", "v_ts", "v_id")
    val composedInner = inner
      .filter(col("v_ts").cast("long") >= col("f_ts").cast("long") - lit(3600L))
      .select("f_id", "v_id")
    val nativeInner = AsOfNative.join(
      facts.repartition(7, col("f_ts")), vers.repartition(3, col("v_state")),
      "f_user", "f_ts", "v_user", "v_ts", "v_id", within = Some(tolMicros))
      .select("f_id", "v_id")
    assert(nativeInner.exceptAll(composedInner).isEmpty &&
      composedInner.exceptAll(nativeInner).isEmpty,
      "within-tolerance inner must equal the post-filtered unbounded join")
    assert(nativeInner.count() > 0, "fixture sanity: some matches inside the hour")
    assert(nativeInner.count() < inner.count(),
      "fixture sanity: the tolerance must actually reject stale matches")
    // outer: rejected-stale facts null-extend instead of dropping
    val nativeOuter = AsOfNative.join(
      facts.repartition(7, col("f_ts")), vers.repartition(3, col("v_state")),
      "f_user", "f_ts", "v_user", "v_ts", "v_id",
      joinType = "left_outer", within = Some(tolMicros))
      .select("f_id", "v_id")
    val composedOuter = facts.join(
      composedInner.select(col("f_id").as("j_id"), col("v_id")),
      facts("f_id") === col("j_id"), "left_outer")
      .select("f_id", "v_id")
    assert(nativeOuter.exceptAll(composedOuter).isEmpty &&
      composedOuter.exceptAll(nativeOuter).isEmpty,
      "within-tolerance outer must equal inner + null-extension")
    assert(nativeOuter.count() == facts.count())
    intercept[IllegalArgumentException] {
      AsOfNative.join(facts, vers, "f_user", "f_ts", "v_user", "v_ts", "v_id",
        within = Some(-1L))
    }
  }

  test("within tolerance rejects a staleness that overflows Long on raw-bigint ts") {
    val s = spark
    import s.implicits._
    // raw-unit bigint domain: the fact sits near Long.Max, the only
    // version near Long.Min — true staleness ~1.9e19 exceeds 2^63 and
    // the naive lt - bufTs wraps NEGATIVE, which a plain <= tol check
    // would accept as fresh; the merge must reject (inner drops the
    // fact, outer null-extends)
    val facts = Seq((1L, 5000000000000000000L, 100L)).toDF("f_user", "f_ts", "f_id")
    val vers = Seq((1L, -5000000000000000000L, 7L)).toDF("v_user", "v_ts", "v_id")
    val inner = AsOfNative.join(facts, vers,
      "f_user", "f_ts", "v_user", "v_ts", "v_id", within = Some(1000L))
    assert(inner.isEmpty,
      "an overflowing staleness is past any tolerance — never a match")
    val outer = AsOfNative.join(facts, vers,
      "f_user", "f_ts", "v_user", "v_ts", "v_id",
      joinType = "left_outer", within = Some(1000L))
    assert(outer.count() == 1 && outer.filter(col("v_id").isNull).count() == 1)
    // and without a tolerance the same pair IS the latest at-or-before
    val unbounded = AsOfNative.join(facts, vers,
      "f_user", "f_ts", "v_user", "v_ts", "v_id")
    assert(unbounded.count() == 1)
  }

  test("left-outer keeps null-key facts with a null-extended version side") {
    val s2 = spark
    import s2.implicits._
    val t1 = java.sql.Timestamp.valueOf("2024-01-02 00:00:00")
    val facts = Seq((5L, Option.empty[Long], Option(t1)),
      (6L, Option(10L), Option(t1))).toDF("f_id", "f_user", "f_ts")
    val vers = Seq((10L, t1, 1L, "a")).toDF("v_user", "v_ts", "v_id", "v_state")
    val out = AsOfNative.join(facts, vers, "f_user", "f_ts", "v_user", "v_ts", "v_id",
      joinType = "left_outer").select("f_id", "v_state").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(out === Set((5L, None), (6L, Some("a"))),
      "null keys never match but must survive a left-outer as-of")
  }

  test("AsOfJoinExec reports SQLMetrics: output rows and row-fate counters") {
    val s2 = spark
    import s2.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-02 00:00:00")
    val facts = Seq(
      (1L, Option(10L), Option(t1)),  // matches
      (2L, Option(30L), Option(t0)),  // before key 30's version — unmatched
      (3L, Option.empty[Long], Option(t1))  // null key
    ).toDF("f_id", "f_user", "f_ts")
    val vers = Seq(
      (Option(10L), Option(t0), 1L, "a"),
      (Option.empty[Long], Option(t0), 2L, "junk"),  // null version key
      (Option(30L), Option(t1), 3L, "c")
    ).toDF("v_user", "v_ts", "v_id", "v_state")
    val df = AsOfNative.join(facts, vers, "f_user", "f_ts", "v_user", "v_ts", "v_id")
    // execute THIS queryExecution (count() would plan a separate one and
    // leave these metrics untouched)
    assert(df.collect().length == 1)
    // AQE wraps the final plan in (Result)QueryStageExec LEAVES — plain
    // collectFirst won't descend into them, so unwrap recursively
    def findExec(p: org.apache.spark.sql.execution.SparkPlan): Option[graft.plans.AsOfJoinExec] =
      p match {
        case e: graft.plans.AsOfJoinExec => Some(e)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          findExec(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          findExec(q.plan)
        case other => other.children.iterator.flatMap(findExec).nextOption()
      }
    val exec = findExec(df.queryExecution.executedPlan)
      .getOrElse(fail("no AsOfJoinExec in the executed plan"))
    assert(exec.metrics("numOutputRows").value == 1)
    assert(exec.metrics("numNullFacts").value == 1)
    assert(exec.metrics("numNullVersions").value == 1)
    assert(exec.metrics("numUnmatchedFacts").value == 1)
  }
}
