package graft

import org.apache.spark.sql.functions._
import graft.pipeline.FraudMart

class FraudMartSpec extends SparkSpec {

  test("every fraud rule fires at sf0.001") {
    assert(FraudMart.r1Blacklist(spark, sf).count() > 0)
    assert(FraudMart.r2Expired(spark, sf).count() > 0)
    assert(FraudMart.r3Velocity(spark, sf).count() > 0)
    assert(FraudMart.r4Guessing(spark, sf).count() > 0)
  }

  test("incremental refresh equals the full rebuild past the watermark") {
    // mid-corpus split: the 96h lookback buffer genuinely truncates
    // (events start Jan 1, the buffer starts Jan 11)
    val since = "2024-01-15 00:00:00"
    val full = FraudMart.report(spark, sf, watermark = since).cache()
    val incr = FraudMart.incrementalReport(spark, sf, since).cache()
    assert(full.count() > 0, "split must leave flags on both sides")
    assert(incr.count() == full.count())
    assert(incr.exceptAll(full).count() == 0)
    assert(full.exceptAll(incr).count() == 0)
  }

  test("r1 only flags purchases of blacklisted users") {
    val r1 = FraudMart.r1Blacklist(spark, sf)
    val pos = graft.sources.Tables.customer(spark, sf)
      .filter(col("c_acctbal") >= 0).select(col("c_custkey"))
    assert(r1.join(pos, r1("user_id") === pos("c_custkey")).count() == 0)
  }

  test("r3 rows always have a distinct previous location") {
    val r3 = FraudMart.r3Velocity(spark, sf)
    assert(r3.filter(col("k") === col("prv_k")).count() == 0)
  }

  test("report unions all rules and respects the watermark") {
    val rep = FraudMart.report(spark, sf).cache()
    assert(rep.select("rule").distinct().count() >= 3)
    assert(rep.filter(col("event_dt") <= lit(FraudMart.Watermark).cast("timestamp")).count() == 0)
    rep.unpersist(blocking = false)
  }

  test("fused report equals the four-way union of the standalone rules") {
    val common = Seq("event_id", "user_id", "rule")
    val fused = FraudMart.report(spark, sf, watermark = "2000-01-01 00:00:00")
      .select(common.map(col): _*).cache()
    val naive = FraudMart.r1Blacklist(spark, sf).select(common.map(col): _*)
      .unionByName(FraudMart.r2Expired(spark, sf).select(common.map(col): _*))
      .unionByName(FraudMart.r3Velocity(spark, sf).select(common.map(col): _*))
      .unionByName(FraudMart.r4Guessing(spark, sf).select(common.map(col): _*))
      .cache()
    assert(fused.count() == naive.count())
    assert(fused.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(fused).count() == 0)
    fused.unpersist(blocking = false); naive.unpersist(blocking = false)
  }

  test("fused report shuffles the fact table exactly once") {
    // distinct watermark → distinct plan → immune to cache substitution
    // from sibling tests (an InMemoryRelation would re-print its cached
    // child plan and double the exchange count)
    val plan = FraudMart.report(spark, sf, watermark = "1999-12-31 00:00:00")
      .queryExecution.executedPlan
    // every Exchange that reads the events scan (directly or transitively)
    // must be the single window exchange; validity's agg exchange only
    // carries the signup slice
    val explained = plan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(explained).size
    // window exchange + validity-agg exchange (signup slice) only
    assert(exchanges <= 2, s"expected <=2 hash exchanges, got $exchanges:\n$explained")
  }
}
