package graft

import org.apache.spark.sql.functions._
import graft.functions.{RollingHash, TextFunctions => TF}
import graft.queries.TextQueries
import graft.sources.Tables

class TextSpec extends SparkSpec {

  test("text stats are internally consistent") {
    val st = TextQueries.q27(spark, sf).cache()
    assert(st.count() == Tables.documents(spark, sf).count())
    assert(st.filter(col("n_tokens") <= 0).count() == 0)
    assert(st.filter(col("n_alpha") > col("n_chars_calc")).count() == 0)
  }

  test("langId is deterministic and draws from the marker languages") {
    val p1 = TextQueries.q28(spark, sf).select("doc_id", "pred_lang").collect().toSet
    val p2 = TextQueries.q28(spark, sf).select("doc_id", "pred_lang").collect().toSet
    assert(p1 == p2)
    val langs = TF.LangMarkers.map(_._1).toSet
    assert(p1.forall(r => langs.contains(r.getString(1))))
  }

  test("blank text has zero tokens; null text has null language") {
    val s = spark
    import s.implicits._
    val edge = Seq((1L, ""), (2L, "   "), (3L, null.asInstanceOf[String]),
      (4L, "one two")).toDF("doc_id", "text")
    val out = edge.select(col("doc_id"),
      graft.functions.TextFunctions.tokenCount(col("text")).as("n"),
      graft.functions.TextFunctions.langId(col("text")).as("lang")).collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.getString(2)))).toMap
    assert(out(1L)._1.contains(0L), "empty text must have 0 tokens")
    assert(out(2L)._1.contains(0L), "whitespace-only text must have 0 tokens")
    assert(out(3L)._2.isEmpty, "null text must not be classified as any language")
    assert(out(4L)._1.contains(2L))
  }

  test("quality score stays in [0,1]") {
    val q = Tables.documents(spark, sf)
      .select(TF.qualityScore(col("text")).as("q"))
    assert(q.filter(col("q") < 0 || col("q") > 1).count() == 0)
  }

  test("rolling-hash fingerprint is stable and collision-free on distinct texts") {
    val fp = TextQueries.q30(spark, sf).cache()
    val texts = Tables.documents(spark, sf).select("text").distinct().count()
    assert(fp.select("fingerprint").distinct().count() == texts)
    // matches the reference scala implementation (codegen path == eval path)
    val row = Tables.documents(spark, sf).filter(col("doc_id") === 0)
      .select(col("text")).collect()(0).getString(0)
    val expected = RollingHash.hash64(row.getBytes("UTF-8"))
    val got = fp.filter(col("doc_id") === 0).collect()(0).getLong(1)
    assert(got == expected)
  }

  test("multimodal metadata is deterministic and sized correctly") {
    val m1 = TextQueries.q31(spark, sf).collect().toSet
    val m2 = TextQueries.q31(spark, sf).collect().toSet
    assert(m1 == m2)
    assert(m1.forall(_.getLong(1) > 0))
  }

  test("q77 repetition stats: invariants hold and a known doc matches by hand") {
    val out = TextQueries.q77(spark, sf).cache()
    assert(out.count() == Tables.documents(spark, sf)
      .filter(size(split(trim(col("text")), "\\s+")) >= 2).count())
    assert(out.filter(col("n_distinct") > col("n_grams")).isEmpty)
    assert(out.filter(col("top_count") > col("n_grams")).isEmpty)
    assert(out.filter(col("dup_frac") < 0 || col("dup_frac") >= 1).isEmpty)
    assert(out.filter(col("top_frac") <= 0 || col("top_frac") > 1).isEmpty)
    // driver-side recomputation of one document
    val r = Tables.documents(spark, sf).filter(col("doc_id") === 0)
      .select("text").collect()(0).getString(0)
    val grams = r.trim.toLowerCase.split("\\s+").sliding(2).map(_.mkString(" ")).toSeq
    val counts = grams.groupBy(identity).view.mapValues(_.size)
    val got = out.filter(col("doc_id") === 0).collect()(0)
    assert(got.getAs[Long]("n_grams") == grams.size)
    assert(got.getAs[Long]("n_distinct") == counts.size)
    assert(got.getAs[Long]("top_count") == counts.values.max)
  }

  test("q77 repetition: a pathologically repetitive doc scores near 1") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, Seq.fill(50)("spam ham").mkString(" ")),
      (2L, (1 to 100).map(i => s"w$i").mkString(" ")),
      (3L, "short")).toDF("doc_id", "text")
    val st = graft.operators.Repetition.ngramStats(docs, "doc_id", "text", 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(st(1L).getAs[Double]("dup_frac") > 0.9, "repeated bigrams must dominate")
    assert(st(2L).getAs[Double]("dup_frac") == 0.0, "all-unique doc has no repeats")
    assert(!st.contains(3L), "single-word doc has no bigrams")
  }

  test("q82 char coverage keeps the minimal ranked prefix reaching 99.9%") {
    val rows = graft.queries.TextQueries.q82(spark, sf)
      .orderBy("rank").collect()
    assert(rows.nonEmpty)
    // ranks are dense from 1 and cum_n strictly increases with them
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to rows.length))
    val cums = rows.map(_.getAs[Long]("cum_n"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a < b })
    // the prefix is exactly the chars needed: coverage before the last
    // kept char is < 99.9% of the independently counted total
    val total = Tables.documents(spark, sf)
      .agg(sum(length(col("text")))).collect()(0).getLong(0)
    val last = rows.last
    assert((last.getAs[Long]("cum_n") - last.getAs[Long]("n")) * 1000 < total * 999)
    assert(cums.last <= total)
    // every char is a single character (split artifact guard)
    assert(rows.forall(_.getAs[String]("ch").length == 1))
  }

  test("wordNgrams honors the zero-tokens convention for blank text at every n") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, ""), (2L, "   "), (3L, "one"), (4L, "a b"))
      .toDF("doc_id", "text")
    // n=1: blank docs must yield NO shingles (split of "" is [""],
    // which used to leak through as a single empty-string shingle)
    val uni = graft.functions.TextFunctions.wordNgrams(docs, "doc_id", "text", 1)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(uni.toSet === Set((3L, "one"), (4L, "a"), (4L, "b")))
    assert(uni.forall(_._2.nonEmpty))
    val bi = graft.functions.TextFunctions.wordNgrams(docs, "doc_id", "text", 2)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(bi.toSet === Set((4L, "a b")))
  }
}
