package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.EtlPipeline
import graft.sources.{JdbcSink, JdbcSource}

/** The write-back half of the RDBMS surface against a REAL database —
  * embedded Derby stands in for the reference's target Postgres
  * (`database.py:44-66` insert/commit; `etl.py:96-125` mart + run-log
  * write-back). The contract under test: publish is idempotent (a
  * re-run converges, never duplicates), the round-trip is row-exact,
  * and the run-log push appends only runs the database hasn't seen.
  */
class JdbcSinkSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftsink;create=true"

  // Derby uppercases unquoted identifiers; normalize for comparisons
  private def lowered(df: DataFrame) =
    df.select(df.columns.map(c => col(c).as(c.toLowerCase)).toIndexedSeq: _*)

  private def rowSet(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def mart: DataFrame =
    graft.sources.Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("bigint")).as("cents"))

  test("overwrite round-trips row-exact and re-runs converge (no duplicates)") {
    val t = JdbcSink.Target(url, "fraud_mart", numPartitions = 2, batchSize = 5)
    val m = mart
    JdbcSink.overwrite(m, t)
    // second publish of the same frame must land the SAME state — the
    // truncate+insert semantics, not append-duplication
    JdbcSink.overwrite(m, t)
    val back = lowered(JdbcSource.read(spark, url, "fraud_mart"))
    assert(back.columns.toSet === m.columns.toSet)
    assert(rowSet(back.select(m.columns.map(col).toIndexedSeq: _*)) === rowSet(m))
    // overwrite with CHANGED content replaces, never merges
    val shrunk = m.limit(2)
    JdbcSink.overwrite(shrunk, t)
    assert(JdbcSource.read(spark, url, "fraud_mart").count() === 2L)
  }

  test("publishMarts + publishRunLog: warehouse → RDBMS, run-log delta-only") {
    val wh = java.nio.file.Files.createTempDirectory("graft_jdbc_wh").toString
    mart.write.parquet(s"$wh/report_mart")
    val s = spark
    import s.implicits._
    Seq((1L, "clients", 10L, 2L, 0L), (2L, "clients", 3L, 1L, 1L))
      .toDF("run_id", "table_name", "rows_inserted", "rows_updated", "rows_deleted")
      .write.parquet(s"$wh/etl_run_log")

    val martT = JdbcSink.Target(url, "report_mart")
    val logT = JdbcSink.Target(url, "etl_run_log")
    val counts = EtlPipeline.publishMarts(spark, wh,
      Seq("report_mart" -> martT), runLog = Some(logT))
    assert(counts === Map("report_mart" -> mart.count()))
    assert(rowSet(lowered(JdbcSource.read(spark, url, "report_mart"))
      .select(mart.columns.map(col).toIndexedSeq: _*)) === rowSet(mart))
    assert(JdbcSource.read(spark, url, "etl_run_log").count() === 2L)

    // replay: nothing new → nothing appended (idempotent without a
    // remote unique constraint)
    EtlPipeline.publishMarts(spark, wh, Seq("report_mart" -> martT),
      runLog = Some(logT))
    assert(JdbcSource.read(spark, url, "etl_run_log").count() === 2L)

    // a third run lands in the warehouse log → ONLY the delta ships
    Seq((3L, "accounts", 7L, 0L, 0L))
      .toDF("run_id", "table_name", "rows_inserted", "rows_updated", "rows_deleted")
      .write.mode("append").parquet(s"$wh/etl_run_log")
    val appended = JdbcSink.publishRunLog(spark, wh, logT)
    assert(appended === 1L)
    val remote = lowered(JdbcSource.read(spark, url, "etl_run_log"))
    assert(remote.count() === 3L)
    assert(remote.filter(col("run_id") === 3L).count() === 1L)
  }
}
