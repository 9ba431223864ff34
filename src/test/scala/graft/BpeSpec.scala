package graft

import org.apache.spark.sql.functions._

import graft.operators.BpeTrainer

class BpeSpec extends SparkSpec {

  test("greedy loop reproduces hand-computed merges, deterministic tie-breaks") {
    // corpus: "abab" x3, "abc" x2  → pair counts round 1:
    //   (a,b): 3*2 + 2 = 8, (b,a): 3, (b,c): 2  → merge (a,b)->ab
    // round 2 over {ab ab}x3, {ab c}x2: (ab,ab): 3, (ab,c): 2 → merge (ab,ab)
    val words = Array(
      (Array("a", "b", "a", "b"), 3L),
      (Array("a", "b", "c"), 2L))
    val merges = BpeTrainer.learnFromWordFreq(words, 3)
    assert(merges.map(m => (m.rank, m.left, m.right, m.freq)) === Seq(
      (1, "a", "b", 8L),
      (2, "ab", "ab", 3L),
      (3, "ab", "c", 2L)))
    // exhaustion: no pairs left after all merges collapse — loop stops
    val single = BpeTrainer.learnFromWordFreq(Array((Array("x"), 5L)), 4)
    assert(single.isEmpty, "a corpus of 1-symbol words has nothing to merge")
  }

  test("tie-breaks are lexicographic, making the merge table a pure function") {
    // (a,b) and (c,d) both occur twice → (a,b) wins by lexical order
    val words = Array(
      (Array("a", "b"), 2L),
      (Array("c", "d"), 2L))
    val m = BpeTrainer.learnFromWordFreq(words, 1)
    assert(m.head.left === "a" && m.head.right === "b")
  }

  test("q113 on the corpus: valid ranks, parts known at merge time, spark==reference") {
    val out = graft.queries.CorpusQueries.q113(spark, sf).collect()
      .map(r => BpeTrainer.Merge(r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(out.nonEmpty && out.map(_.rank).toSeq === (1 to out.length))
    // every merge's parts are single chars or earlier merge outputs
    val known = scala.collection.mutable.Set.empty[String]
    out.foreach { m =>
      assert((m.left.length == 1 || known(m.left)) &&
        (m.right.length == 1 || known(m.right)),
        s"rank ${m.rank}: parts must exist as symbols when merged")
      assert(m.merged === m.left + m.right)
      known += m.merged
    }
    // independent reference from the same word-frequency table
    val wf = graft.sources.Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFunctions.wsTokens(lower(col("text"))))
        .as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq")).collect()
      .map(r => (r.getString(0).map(_.toString).toArray, r.getLong(1)))
    val ref = BpeTrainer.learnFromWordFreq(wf, 12)
    assert(out.toSeq === ref, "spark-side learn must equal the reference loop")
  }

  test("vocabulary bound is enforced loudly") {
    val prev = spark.conf.getOption("graft.bpe.maxVocab")
    spark.conf.set("graft.bpe.maxVocab", "2")
    try {
      val e = intercept[IllegalArgumentException] {
        graft.queries.CorpusQueries.q113(spark, sf).collect()
      }
      assert(e.getMessage.contains("graft.bpe.maxVocab"))
    } finally prev match {
      case Some(v) => spark.conf.set("graft.bpe.maxVocab", v)
      case None    => spark.conf.unset("graft.bpe.maxVocab")
    }
  }
}
