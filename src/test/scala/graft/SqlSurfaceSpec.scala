package graft

import org.apache.spark.sql.functions._

class SqlSurfaceSpec extends SparkSpec {

  test("registered table and query views serve SQL, lazily and faithfully") {
    val tv = SqlSurface.registerTables(spark, sf)
    val qv = SqlSurface.registerQueries(spark, sf,
      Seq("q01_pricing_summary", "q20_fraud_report"))
    try {
      assert(tv.size === SqlSurface.tableNames.size && qv.size === 2)
      assert(spark.sql("SELECT COUNT(*) FROM customer").head().getLong(0) ===
        graft.sources.Tables.customer(spark, sf).count())
      // a query view is the same lazy plan the Scala API serves
      val direct = SparkEntry.queries("q01_pricing_summary")(spark, sf)
      val viaSql = spark.sql("SELECT * FROM q01_pricing_summary")
      assert(viaSql.exceptAll(direct).isEmpty && direct.exceptAll(viaSql).isEmpty)
      // views compose: join a query view back to a table view in SQL
      val joined = spark.sql(
        """SELECT r.rule, COUNT(DISTINCT c.c_nationkey) AS n_nations
          |FROM q20_fraud_report r JOIN customer c ON c.c_custkey = r.user_id
          |GROUP BY r.rule""".stripMargin)
      assert(joined.count() > 0)
    } finally (tv ++ qv).foreach(spark.catalog.dropTempView)
  }

  test("registering an unknown query fails loudly") {
    intercept[IllegalArgumentException] {
      SqlSurface.registerQueries(spark, sf, Seq("q999_nope"))
    }
  }
}
