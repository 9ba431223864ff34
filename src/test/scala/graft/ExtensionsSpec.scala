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

  test("dedup-verifier primitives are callable from SQL") {
    // sorted-set intersection, exact and bounded (the bounded form may
    // return ANY value below the bound for failing pairs — assert the
    // passing case, where it must be exact)
    val r = spark.sql(
      """SELECT sorted_and_count(array(1L,2L,3L,5L), array(2L,3L,4L,5L)) AS n,
        |       sorted_and_count_bounded(array(1L,2L,3L,5L), array(2L,3L,4L,5L), 2L) AS nb,
        |       bitmap_and_count(array(3L), array(6L)) AS pc
        |""".stripMargin).collect()(0)
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    assert(r.getLong(2) == 1L, "popcount(0b011 & 0b110) = 1")
    // pack_bits + the screen bound, end to end in SQL
    val ub = spark.sql(
      """SELECT bitmap_and_count(pack_bits(a, 2), pack_bits(b, 2)) +
        |       least(size(a) - bitmap_count_stub, size(b) - bitmap_count_stub) AS x
        |FROM (SELECT array(1L, 2L, 3L) AS a, array(2L, 3L, 4L) AS b,
        |      0L AS bitmap_count_stub)""".stripMargin).collect()(0).getLong(0)
    assert(ub >= 2L, "screen upper bound must cover the true intersection (2)")
    // first-agreeing-band filter: band 1 agrees at index 0 → suppressed
    val fb = spark.sql(
      "SELECT no_earlier_band_match(array(7L, 9L), array(7L, 8L), 1) AS ok")
      .collect()(0).getBoolean(0)
    assert(!fb, "index 0 already agreed — the pair must not re-emit at band 1")
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
