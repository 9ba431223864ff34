package graft

import graft.queries.CoreQueries

class CoreQueriesSpec extends SparkSpec {

  test("every core query runs and returns rows at sf0.001") {
    CoreQueries.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("q01 aggregates are decimal-exact and grouped correctly") {
    val rows = CoreQueries.q01(spark, sf).collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).distinct.length == rows.length)
    assert(rows.forall(_.getDouble(2) > 0))
  }

  test("q04 emits at most 3 rows per priority with ranks 1..3") {
    val rows = CoreQueries.q04(spark, sf).collect()
    val byPrio = rows.groupBy(_.getString(0))
    assert(byPrio.values.forall(_.length <= 3))
    assert(rows.forall(r => r.getInt(1) >= 1 && r.getInt(1) <= 3))
  }

  test("q06 anti join excludes every customer matched by q05-style semi join") {
    import org.apache.spark.sql.functions.col
    val anti = CoreQueries.q06(spark, sf).select("c_custkey")
    val big = graft.sources.Tables.orders(spark, sf)
      .filter(col("o_totalprice") > 300000).select(col("o_custkey"))
    assert(anti.join(big, anti("c_custkey") === big("o_custkey")).count() == 0)
  }

  test("oracle map covers every query key") {
    assert(CoreQueries.queries.keySet == CoreQueries.oracle.keySet)
  }
}
