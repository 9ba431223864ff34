package graft

import org.apache.spark.sql.functions._
import graft.pipeline.EtlPipeline
import graft.pipeline.EtlPipeline.{TableFeed, TableMapping}
import graft.sources.JdbcSource

/** The from_database path against a REAL database — embedded Derby (on
  * Spark's classpath) stands in for the reference's source Postgres.
  */
class JdbcSourceSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private def withConn[A](f: java.sql.Connection => A): A = {
    val c = java.sql.DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  private def initTable(): Unit = withConn { c =>
    val st = c.createStatement()
    try st.execute("DROP TABLE clients") catch { case _: java.sql.SQLException => () }
    st.execute(
      "CREATE TABLE clients (client_id BIGINT, name VARCHAR(32), " +
        "create_dt TIMESTAMP, update_dt TIMESTAMP)")
    val ins = c.prepareStatement("INSERT INTO clients VALUES (?, ?, ?, ?)")
    (1L to 20L).foreach { i =>
      ins.setLong(1, i)
      ins.setString(2, s"client_$i")
      ins.setTimestamp(3, java.sql.Timestamp.valueOf(f"2024-01-${i % 9 + 1}%02d 08:00:00"))
      ins.setNull(4, java.sql.Types.TIMESTAMP)
      ins.addBatch()
    }
    ins.executeBatch()
  }

  // Derby uppercases unquoted identifiers; normalize for the mappings
  private def lowered(df: org.apache.spark.sql.DataFrame) =
    df.select(df.columns.map(c => col(c).as(c.toLowerCase)).toIndexedSeq: _*)

  test("partitioned JDBC read parallelizes and pushes filters to the database") {
    initTable()
    val df = JdbcSource.readPartitioned(spark, url, "clients",
      "client_id", lower = 1L, upper = 20L, numPartitions = 4)
    assert(df.rdd.getNumPartitions == 4, "range split must yield one partition per slice")
    assert(df.count() == 20)
    // rows outside the bound estimate still load (outer slices unbounded)
    val df2 = JdbcSource.readPartitioned(spark, url, "clients",
      "client_id", lower = 5L, upper = 15L, numPartitions = 3)
    assert(df2.count() == 20)
    // predicate pushdown into the remote SQL
    val f = df.filter(col("CLIENT_ID") > 10)
    assert(f.count() == 10)
    val scan = f.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("CLIENT_ID"),
      s"filter must reach the JDBC scan:\n${scan.take(500)}")
  }

  test("runFromTables drives the from_database loop off the JDBC source") {
    initTable()
    val wh = java.nio.file.Files.createTempDirectory("graft_jdbc_wh").toString
    def feed = Seq(TableFeed(
      TableMapping("clients", "dwh_jdbc_clients", "client_id", Seq("name"), scd = 2),
      lowered(JdbcSource.readPartitioned(spark, url, "clients",
        "client_id", 1L, 20L, 4))))
    val r1 = EtlPipeline.runFromTables(spark, wh, feed, runId = 1,
      deleteTs = "2024-02-01 00:00:00")
    val t1 = spark.read.parquet(s"$wh/dwh_jdbc_clients")
    assert(t1.count() == 20 && t1.filter(col("deleted_flg")).count() == 0)

    // source mutation: rename one client, delete another
    withConn { c =>
      val st = c.createStatement()
      st.execute("UPDATE clients SET name = 'renamed', " +
        "update_dt = TIMESTAMP('2024-02-02 09:00:00') WHERE client_id = 7")
      st.execute("DELETE FROM clients WHERE client_id = 13")
    }
    EtlPipeline.runFromTables(spark, wh, feed, runId = 2,
      deleteTs = "2024-02-03 00:00:00")
    val t2 = spark.read.parquet(s"$wh/dwh_jdbc_clients")
    assert(t2.filter(col("client_id") === 7 && col("name") === "renamed" &&
      col("effective_to") === lit("9999-12-31 00:00:00").cast("timestamp")).count() == 1)
    assert(t2.filter(col("client_id") === 13 && col("deleted_flg")).count() == 1)
    // untouched clients: still exactly one live open version
    assert(t2.filter(col("client_id") === 2).count() == 1)
  }
}
