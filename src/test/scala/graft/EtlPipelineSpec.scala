package graft

import org.apache.spark.sql.functions._
import graft.pipeline.EtlPipeline
import graft.pipeline.EtlPipeline.TableMapping
import graft.operators.Scd
import graft.sources.Tables

class EtlPipelineSpec extends SparkSpec {

  test("scd1 pipeline merge produces a consistent run log") {
    val dwh = Tables.customer(spark, sf).filter(col("c_custkey") < 100)
      .select(col("c_custkey").as("id"), col("c_acctbal").as("bal"))
    val stg = Tables.customer(spark, sf).filter(col("c_custkey") < 120)
      .select(col("c_custkey").as("id"), (col("c_acctbal") + 10).as("bal"))
    val res = EtlPipeline.mergeTable(7, TableMapping("stg_cust", "dwh_cust", "id", Seq("bal"), 1),
      stg, dwh, "2024-02-01 00:00:00")
    val log = res.log.collect()(0)
    assert(log.getAs[Int]("run_id") == 7)
    assert(log.getAs[Long]("rows_inserted") == 20)   // keys 100..119
    assert(log.getAs[Long]("rows_updated") == 100)   // all overlapping bals shifted
  }

  test("scd2 pipeline merge logs tombstones as deletions") {
    val ev = Tables.events(spark, sf)
    val hist = Scd.buildHistory(ev.filter(col("user_id") < 10), "user_id", "ts",
      "event_id", Seq("event_type")).withColumnRenamed("event_type", "state")
    val stg = ev.filter(col("user_id") < 5)  // users 5..9 disappear
      .groupBy("user_id").agg(max(col("ts")).as("create_dt"))
      .withColumn("state", lit("inactive"))
    val res = EtlPipeline.mergeTable(8, TableMapping("stg_u", "dwh_u", "user_id", Seq("state"), 2),
      stg, hist, "2024-02-01 00:00:00")
    val log = res.log.collect()(0)
    assert(log.getAs[Long]("rows_deleted") == 5)
    assert(res.merged.filter(col("deleted_flg")).count() == 5)
  }
}
