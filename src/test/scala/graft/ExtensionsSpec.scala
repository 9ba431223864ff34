package graft

/** The shared SparkSpec session is built withExtensions(GraftExtensions),
  * so this exercises the real injection path (builder → session →
  * function registry). Never stop the shared session — one JVM serves
  * every suite.
  */
class ExtensionsSpec extends SparkSpec {

  test("rolling_hash is callable from SQL via SparkSessionExtensions") {
    val got = spark.sql("SELECT rolling_hash('spark') AS h").collect()(0).getLong(0)
    val expected = graft.functions.RollingHash.hash64("spark".getBytes("UTF-8"))
    assert(got == expected)
  }

  test("rolling_hash arity error is a clean analysis failure") {
    val err = intercept[Exception](spark.sql("SELECT rolling_hash('a','b')").collect())
    assert(err.getMessage.toLowerCase.contains("rolling_hash"))
  }

  test("rolling_hash type error is a clean analysis failure, not a runtime crash") {
    val err = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT rolling_hash(42)").collect())
    assert(err.getMessage.contains("string"))
  }

  test("phrase_scan is callable from SQL; non-literal terms fail cleanly") {
    val row = spark.sql(
      "SELECT phrase_scan(split('x a b y a b', ' '), 'a', 'b') AS ps")
      .collect()(0).getSeq[Long](0)
    assert(row === Seq(2L, 2L), "two matches, first phrase starts at token 2")
    val err = intercept[Exception](
      spark.sql("SELECT phrase_scan(split('a b', ' '), lower(rand()), 'b')").collect())
    assert(err.getMessage.contains("literal"))
  }
}
