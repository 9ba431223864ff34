package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.queries.PrivacyQueries

/** Property-based statement of the k-anonymity guarantee for ANY input
  * shape: after kAnonymize, the quasi-identifier classes of the output
  * partition the rows such that
  *   - every class with real (non-"*") labels has ≥ k members,
  *   - the "*" class, when present, has ≥ k members OR holds the
  *     ENTIRE input (a corpus smaller than k can only collapse whole),
  *   - no row is lost or duplicated (including null-QI rows),
  *   - suppression is all-or-nothing per original class (an
  *     equivalence class never splits between kept and suppressed).
  */
class KAnonymizePropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i =>
      g.apply(Gen.Parameters.default.withSize(40), Seed(311L + i)))

  // skewed class sizes over a small QI alphabet, with occasional nulls
  private val inputGen: Gen[(List[(Option[String], String)], Int)] = for {
    nClasses <- Gen.choose(1, 6)
    classes <- Gen.listOfN(nClasses, for {
      g <- Gen.option(Gen.oneOf("a", "b", "c", "d"))
      seg <- Gen.oneOf("X", "Y")
      size <- Gen.frequency(3 -> Gen.choose(1, 3), 2 -> Gen.choose(6, 14))
    } yield List.fill(size)((g, seg)))
    k <- Gen.choose(2, 8)
  } yield (classes.flatten, k)

  test("k-anonymity holds for arbitrary class structures, k, and null QI values") {
    val s = spark
    import s.implicits._
    samples(inputGen, 8).foreach { case (rows, k) =>
      val df = rows.zipWithIndex
        .map { case ((g, seg), i) => (i.toLong, g, seg) }
        .toDF("id", "g", "seg")
      val out = PrivacyQueries.kAnonymize(df, Seq("g", "seg"), k).cache()
      try {
        val n = rows.size.toLong
        assert(out.count() === n, "no row lost or duplicated")
        assert(out.select("id").distinct().count() === n)
        val classes = out.groupBy("g_qi", "seg_qi").count().collect()
          .map(r => (Option(r.getString(0)), r.getLong(2)))
        classes.foreach { case (label, size) =>
          if (label.contains("*")) {
            assert(size >= math.min(k.toLong, n),
              s"'*' class of $size rows under k=$k (n=$n) is re-identifiable")
          } else {
            assert(size >= k.toLong,
              s"surviving class $label has $size < k=$k members")
          }
        }
        // all-or-nothing per original class: no (g,seg) combo appears
        // both suppressed and kept
        val split = out
          .groupBy("g", "seg")
          .agg(countDistinct(col("g_qi") <=> "*").as("modes")) // null-safe
          .filter(col("modes") > 1)
        assert(split.isEmpty, "an equivalence class must never split")
      } finally out.unpersist()
    }
  }
}
