package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.plans.AsOfNative

/** Property-based check of the native as-of operator: for ARBITRARY
  * fact/version sets — duplicate timestamps, keys missing on either
  * side, facts before the first version — the one-pass merge must
  * equal the brute-force "latest version with (ts, tie) ≤-max at or
  * before the fact" definition, under an adversarial input
  * partitioning. (Raw scalacheck Gen with fixed seeds — the
  * scalatestplus bridge isn't in the offline dependency cache.)
  */
class AsOfPropertySpec extends SparkSpec {

  private val sparkStable = spark
  import sparkStable.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i =>
      g.apply(Gen.Parameters.default.withSize(40), Seed(1234L + i)))

  // (key, tsOffsetSeconds) pairs; small key and offset domains force
  // key collisions and EXACT timestamp ties
  private val setGen: Gen[(List[(Long, Int)], List[(Long, Int)])] = for {
    facts <- Gen.listOf(for {
      k <- Gen.choose(1L, 6L); off <- Gen.choose(0, 30)
    } yield (k, off))
    vers <- Gen.listOf(for {
      k <- Gen.choose(1L, 6L); off <- Gen.choose(0, 30)
    } yield (k, off))
  } yield (facts, vers)

  test("native as-of equals brute force on random fact/version sets") {
    samples(setGen, 8).foreach { case (factRows, verRows) =>
      val facts = factRows.zipWithIndex
        .map { case ((k, off), i) => (i.toLong, k, off.toLong) }
      val vers = verRows.zipWithIndex
        .map { case ((k, off), i) => (1000L + i, k, off.toLong, s"s$i") }
      if (facts.nonEmpty && vers.nonEmpty) {
        val fDf = facts.toDF("f_id", "f_user", "f_off")
          .withColumn("f_ts", expr(
            "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,f_off)"))
          .repartition(5, col("f_id")) // adversarial: NOT by key
        val vDf = vers.toDF("v_id", "v_user", "v_off", "v_state")
          .withColumn("v_ts", expr(
            "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,v_off)"))
          .repartition(3, col("v_state"))
        val got = AsOfNative.join(fDf, vDf, "f_user", "f_ts", "v_user", "v_ts", "v_id")
          .select("f_id", "v_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val byKey = vers.groupBy(_._2)
        val expect = facts.flatMap { case (fid, k, off) =>
          byKey.getOrElse(k, Nil)
            .filter(_._3 <= off)
            .sortBy(v => (v._3, v._1)) // (ts, tie) ascending; last = winner
            .lastOption.map(v => (fid, v._1))
        }.toSet
        assert(got === expect,
          s"facts=$factRows vers=$verRows: got $got expected $expect")
      }
    }
  }
}
