package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions needs its own session (withExtensions at build time),
  * so this suite does not share SparkSpec's.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("rolling_hash is callable from SQL via SparkSessionExtensions") {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    try {
      val got = spark.sql("SELECT rolling_hash('spark') AS h").collect()(0).getLong(0)
      val expected = graft.functions.RollingHash.hash64("spark".getBytes("UTF-8"))
      assert(got == expected)
      // arity error surfaces as an analysis failure, not a crash
      val err = intercept[Exception](spark.sql("SELECT rolling_hash('a','b')").collect())
      assert(err.getMessage.toLowerCase.contains("rolling_hash"))
    } finally spark.stop()
  }
}
