package graft

import org.apache.spark.sql.functions._

/** The SURVEY §5 large-alphabet shard dial: pre-pruning the rank by
  * first-char shard must NEVER change the top-k — for any shard count,
  * including ties that straddle shard boundaries and shard counts
  * exceeding the alphabet.
  */
class NgramRankPropertySpec extends SparkSpec {

  test("topK is shard-count independent on a synthetic multi-thousand-char alphabet") {
    val s = spark
    import s.implicits._
    // 3000 distinct CJK first chars x 3 second chars — the ~10^4-char
    // alphabet regime the dial exists for; counts cycle mod 97 so
    // every count value ties across MANY shards and the (n DESC,
    // gram ASC) break must agree between the sharded and global plans
    val grams = (0 until 9000).map { i =>
      val g = "" + (0x4e00 + i % 3000).toChar + (0x5e00 + (i / 3000) * 7).toChar
      (g, (i * 2654435761L % 97L) + 1L)
    }
    val df = grams.toDF("gram", "n")
    val base = graft.text.NgramRank.topK(df, "gram", "n", 50)
      .orderBy("rnk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(base.length === 50)
    // deterministic rank: strictly increasing rnk, counts non-increasing
    assert(base.map(_._3).sameElements(1L to 50L))
    assert(base.sliding(2).forall { case Array(a, b) =>
      a._2 > b._2 || (a._2 == b._2 && a._1 < b._1) })
    Seq(2, 3, 7, 16, 64, 512).foreach { sh =>
      val got = graft.text.NgramRank.topK(df, "gram", "n", 50, shards = sh)
        .orderBy("rnk").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(got.sameElements(base), s"shards=$sh changed the top-50")
    }
  }

  test("topK survives degenerate shapes: tiny alphabets, k past the frame") {
    val s = spark
    import s.implicits._
    // alphabet far smaller than the shard count: most shards are empty
    val tiny = Seq(("aa", 5L), ("ab", 5L), ("ba", 3L), ("bb", 7L), ("ca", 1L))
      .toDF("gram", "n")
    val want = Seq(("bb", 7L, 1L), ("aa", 5L, 2L), ("ab", 5L, 3L),
      ("ba", 3L, 4L), ("ca", 1L, 5L))
    Seq(1, 2, 64).foreach { sh =>
      val got = graft.text.NgramRank.topK(tiny, "gram", "n", 10, shards = sh)
        .orderBy("rnk").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got === want, s"shards=$sh")
    }
    intercept[IllegalArgumentException] {
      graft.text.NgramRank.topK(tiny, "gram", "n", 0)
    }
    intercept[IllegalArgumentException] {
      graft.text.NgramRank.topK(tiny, "gram", "n", 10, shards = 0)
    }
  }
}
