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

  test("sketch aggregates run from SQL and agree with their Scala twins") {
    val names = SqlSurface.registerAggregates(spark)
    SqlSurface.registerTables(spark, sf)
    try {
      assert(names.size === 4)
      // quantile summary from SQL == exact rank below capacity
      val q = spark.sql(
        """SELECT event_type, quantile_summary(value) AS s FROM events
          |WHERE value IS NOT NULL GROUP BY 1""".stripMargin)
        .select(col("event_type"), col("s.n_events").as("n"), col("s.qs")(1).as("p50"))
      val exact = graft.sources.Tables.events(spark, sf)
        .filter(col("value").isNotNull)
        .groupBy("event_type")
        .agg(sort_array(collect_list("value")).as("vs"), count(lit(1)).as("n"))
        .select(col("event_type"), col("n"),
          element_at(col("vs"), expr("CAST((50*n + 99) DIV 100 AS INT)")).as("e50"))
      val bad = q.join(exact.select(col("event_type"), col("e50")), "event_type")
        .filter(col("p50") =!= col("e50"))
      assert(bad.isEmpty, "SQL quantile_summary must be exact below capacity")
      // KMV from SQL: exact distinct below capacity
      val kmv = spark.sql(
        "SELECT kmv_sketch(xxhash64(user_id)) AS s FROM events").head()
      val distinct = graft.sources.Tables.events(spark, sf)
        .select("user_id").distinct().count()
      val s = kmv.getStruct(0)
      val mins = s.getAs[scala.collection.Seq[Long]]("mins").toSeq
      val est = graft.operators.KmvSketch
        .KmvSummary(s.getAs[Int]("k"), mins).distinct
      assert(est === distinct.toDouble,
        "below capacity the KMV estimate IS the exact distinct count")
      // the other two registrations execute from SQL too
      val mg = spark.sql(
        "SELECT mg_sketch(event_type) AS s FROM events").head().getStruct(0)
      assert(mg.getAs[Long]("n") ===
        graft.sources.Tables.events(spark, sf).count())
      val gs = spark.sql(
        "SELECT group_sample(user_id, event_id) AS s FROM events").head().getStruct(0)
      assert(gs.getAs[scala.collection.Seq[Long]]("ids").size === 8)
      // SQL NULLs are IGNORED, not decoded as zero (built-in convention)
      val nq = spark.sql(
        "SELECT quantile_summary(CAST(NULL AS DOUBLE)) AS s FROM events").head().getStruct(0)
      assert(nq.getAs[Long]("n_events") === 0L,
        "an all-null column must produce an empty summary, not phantom zeros")
    } finally SqlSurface.tableNames.foreach(spark.catalog.dropTempView)
  }

  test("registering an unknown query fails loudly") {
    intercept[IllegalArgumentException] {
      SqlSurface.registerQueries(spark, sf, Seq("q999_nope"))
    }
  }
}
