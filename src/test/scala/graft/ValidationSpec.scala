package graft

import org.apache.spark.sql.functions._

import graft.operators.Checks
import graft.queries.ValidationQueries
import graft.sources.Tables

/** Round-8 validation batch: the declarative check suite (q139), exact
  * integer per-type trend (q140), and the near-duplicate payment band
  * join (q141).
  */
class ValidationSpec extends SparkSpec {

  import SparkSpec.spark.implicits._

  test("Checks.validate counts every violation class exactly on dirty data") {
    val dirty = Seq(
      // (id, user, value, typ)
      (1L, Option(10L), Option(5.0), "view"),
      (1L, Option(10L), Option(-2.0), "view"),     // dup id + negative
      (2L, None, Option(1.0), "bogus"),            // null user + unknown type
      (3L, Option(99L), None, "click"),            // user not in dim, null value
      (4L, Option(11L), Option(0.0), "click")
    ).toDF("event_id", "user_id", "value", "event_type")
    val dim = Seq(10L, 11L).toDF("c_custkey")
    val out = Checks.validate(dirty, Seq(
        Checks.NotNull("user_id"), Checks.Unique("event_id"),
        Checks.NonNegative("value"), Checks.InSet("event_type", Seq("view", "click")),
        Checks.RefIn("user_id", dim, "c_custkey")))
      .collect().map(r => r.getAs[String]("check_name") ->
        (r.getAs[Long]("violations"), r.getAs[Long]("total"), r.getAs[Boolean]("pass")))
      .toMap
    assert(out("not_null_user_id") === ((1L, 5L, false)))
    assert(out("unique_event_id") === ((1L, 5L, false)))
    assert(out("non_negative_value") === ((1L, 5L, false)))
    assert(out("known_event_type") === ((1L, 5L, false)))
    assert(out("user_id_in_c_custkey") === ((1L, 5L, false)))
  }

  test("Checks.validate refuses empty and duplicate suites") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    intercept[IllegalArgumentException](Checks.validate(df, Seq.empty))
    intercept[IllegalArgumentException](
      Checks.validate(df, Seq(Checks.NotNull("a"), Checks.NotNull("a"))))
  }

  test("q139: the events fact passes its whole suite; one row per check") {
    val rows = ValidationQueries.q139(spark, sf).collect()
    assert(rows.length === 5)
    val total = Tables.events(spark, sf).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("total") === total)
      assert(r.getAs[Long]("violations") === 0L, r.getAs[String]("check_name"))
      assert(r.getAs[Boolean]("pass"))
    }
  }

  test("q140: slope numerators recount from collected data; den positive") {
    val out = ValidationQueries.q140(spark, sf).collect()
    assert(out.nonEmpty)
    val data = Tables.events(spark, sf).filter(col("value").isNotNull)
      .select(col("event_type"),
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
          .cast("bigint"),
        round(col("value") * 100).cast("bigint"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    out.foreach { r =>
      val t = r.getAs[String]("event_type")
      val xs = data.filter(_._1 == t)
      val n = xs.length.toLong
      val sx = xs.map(_._2).sum; val sy = xs.map(_._3).sum
      val sxy = xs.map(v => v._2 * v._3).sum; val sxx = xs.map(v => v._2 * v._2).sum
      assert(r.getAs[Long]("n") === n)
      assert(r.getAs[Long]("slope_num") === n * sxy - sx * sy)
      assert(r.getAs[Long]("slope_den") === n * sxx - sx * sx)
      assert(r.getAs[Long]("slope_den") > 0, "variance of day index must be positive")
      val expected = if (n * sxy - sx * sy > 0) "up"
        else if (n * sxy - sx * sy < 0) "down" else "flat"
      assert(r.getAs[String]("trend") === expected)
    }
  }

  test("q141: band join finds exactly the brute-force pair set") {
    val out = ValidationQueries.q141(spark, sf).collect()
      .map(r => (r.getAs[Long]("event_a"), r.getAs[Long]("event_b"),
        r.getAs[Long]("gap_us"), r.getAs[Long]("cents_a"), r.getAs[Long]("cents_b")))
      .toSet
    val p = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase" && col("value").isNotNull)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")),
        round(col("value") * 100).cast("bigint"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val brute = (for {
      a <- p; b <- p
      if a._1 == b._1 && a._2 < b._2
      if math.abs(a._4 - b._4) <= ValidationQueries.PairTolCents
      if math.abs(b._3 - a._3) <= ValidationQueries.PairWindowUs
    } yield (a._2, b._2, b._3 - a._3, a._4, b._4)).toSet
    assert(out === brute)
    assert(out.nonEmpty, "test data must exercise the pair finder")
  }
}
