package graft

import org.apache.spark.sql.functions._

import graft.queries.NoveltyQueries
import graft.sources.Tables

/** Round-8 fifth batch: corpus novelty (q146), frequency spectrum
  * (q147), RFM segmentation (q148).
  */
class NoveltySpec extends SparkSpec {

  private def shingles(text: String): Set[String] = {
    val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (toks.length < 4) Set.empty
    else toks.sliding(4).map(_.mkString(" ")).toSet
  }

  test("q146: novelty recounts against the doc_id-ordered prefix") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val firstSeen = scala.collection.mutable.Map[String, Long]()
    val expected = docs.map { case (id, text) =>
      val sh = shingles(text)
      val novel = sh.count(s => firstSeen.getOrElseUpdate(s, id) == id)
      id -> ((sh.size.toLong, novel.toLong))
    }.toMap
    val out = NoveltyQueries.q146(spark, sf).collect()
    assert(out.length === expected.count(_._2._1 > 0))
    out.foreach { r =>
      val (n, novel) = expected(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_shingles") === n)
      assert(r.getAs[Long]("n_novel") === novel)
      assert(r.getAs[Long]("novelty_ppm") === 1000000L * novel / n)
    }
    // the shared synthetic vocabulary guarantees real overlap: some doc
    // must be partly but not fully novel
    assert(out.exists(r => r.getAs[Long]("n_novel") > 0 &&
      r.getAs[Long]("n_novel") < r.getAs[Long]("n_shingles")))
  }

  test("q147: spectrum mass sums back to the corpus token count per lang") {
    val out = NoveltyQueries.q147(spark, sf).collect()
    val byLang = out.groupBy(_.getAs[String]("lang"))
    val docs = Tables.documents(spark, sf).select("lang", "text")
      .collect().map(r => (r.getString(0), r.getString(1)))
    docs.groupBy(_._1).foreach { case (lang, ds) =>
      val toks = ds.flatMap(_._2.trim.toLowerCase.split("\\s+").filter(_.nonEmpty))
      val counts = toks.groupBy(identity).map(_._2.size.toLong)
      val spectrum = counts.groupBy(identity).map { case (c, v) => c -> v.size.toLong }
      val rows = byLang(lang).map(r =>
        r.getAs[Long]("c") -> r.getAs[Long]("n_types")).toMap
      assert(rows === spectrum)
      assert(byLang(lang).map(_.getAs[Long]("mass")).sum === toks.length.toLong)
    }
  }

  test("q148: segments recount; every purchasing user labeled") {
    val out = NoveltyQueries.q148(spark, sf).collect()
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")),
        round(col("value") * 100).cast("bigint"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    val anchor = ev.map(_._3).max
    val purch = ev.filter(e => e._2 == "purchase" && e._4.isDefined)
    assert(out.length === purch.map(_._1).distinct.length)
    val byUser = out.map(r => r.getAs[Long]("user_id") -> r).toMap
    purch.groupBy(_._1).foreach { case (u, ps) =>
      val r = byUser(u)
      val rDays = (anchor - ps.map(_._3).max) / 86400000000L
      val f = ps.length.toLong
      val m = ps.map(_._4.get).sum
      assert(r.getAs[Long]("r_days") === rDays)
      assert(r.getAs[Long]("f") === f)
      assert(r.getAs[Long]("m_cents") === m)
      val seg =
        if (rDays <= NoveltyQueries.RfmRecentDays && f >= NoveltyQueries.RfmFreqMin
          && m >= NoveltyQueries.RfmValueCents) "champion"
        else if (rDays <= NoveltyQueries.RfmWarmDays &&
          f >= NoveltyQueries.RfmFreqMin) "loyal"
        else if (m >= NoveltyQueries.RfmValueCents) "big_spender"
        else if (rDays > NoveltyQueries.RfmWarmDays) "at_risk"
        else "regular"
      assert(r.getAs[String]("segment") === seg)
    }
  }
}
