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
  }
}
