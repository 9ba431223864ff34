package graft

import org.apache.spark.sql.functions._

import graft.queries.InfoQueries
import graft.sources.Tables

/** Round-9 third batch: information-theoretic profiling (q178–q180). */
class InfoSpec extends SparkSpec {

  private def entropyMicro(counts: Seq[Long]): Long = {
    val total = counts.sum
    counts.map(n => math.floor(1e6 * n * math.log(total.toDouble / n)).toLong)
      .sum / total
  }

  test("q178: entropy equals the per-term-floored recount; bounds hold") {
    val out = InfoQueries.q178(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_types"),
          r.getAs[Long]("entropy_micro"))).toMap
    val brute = Tables.events(spark, sf)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n")))
      .groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).toSeq }
    assert(out.keySet === brute.keySet)
    brute.foreach { case (u, ns) =>
      val (nEvents, nTypes, ent) = out(u)
      assert(nEvents === ns.sum, s"user=$u")
      assert(nTypes === ns.length.toLong, s"user=$u")
      assert(ent === entropyMicro(ns), s"user=$u")
      // 0 <= H <= ln(n_types), up to the <= n_types micro-nat floor bias
      assert(ent >= 0L)
      assert(ent <= math.ceil(1e6 * math.log(ns.length.toDouble)).toLong + ns.length)
    }
    // single-type users (if any) must read exactly zero
    brute.filter(_._2.length == 1).foreach { case (u, _) =>
      assert(out(u)._3 === 0L, s"single-type user=$u")
    }
  }

  test("q179: char entropy equals the recount over code-point chars") {
    val out = InfoQueries.q179(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_chars"), r.getAs[Long]("n_distinct"),
          r.getAs[Long]("entropy_micro"))).toMap
    // code points, not UTF-16 units — what CharNgramExpr and DuckDB count
    val brute = Tables.documents(spark, sf).select("source", "text").collect()
      .flatMap(r => r.getString(1).codePoints().toArray
        .map(cp => (r.getString(0), new String(Character.toChars(cp)))))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      .groupBy(_._1._1)
      .map { case (src, m) => src -> m.values.toSeq }
    assert(out.keySet === brute.keySet)
    brute.foreach { case (src, ns) =>
      assert(out(src)._1 === ns.sum, s"source=$src")
      assert(out(src)._2 === ns.length.toLong, s"source=$src")
      assert(out(src)._3 === entropyMicro(ns), s"source=$src")
    }
  }

  test("q180: slope num/den equal the brute-force least-squares sums") {
    val out = InfoQueries.q180(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("slope_num"),
          r.getAs[Long]("slope_den"))).toMap
    val brute = Tables.documents(spark, sf).select("source", "text").collect()
      .map { r =>
        val toks = r.getString(1).trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        (r.getString(0), toks.length.toLong, toks.distinct.length.toLong)
      }
      .filter(_._2 >= 2)
      .map { case (src, n, v) =>
        (src, math.floor(1e3 * math.log(n.toDouble)).toLong,
          math.floor(1e3 * math.log(v.toDouble)).toLong)
      }
      .groupBy(_._1)
    assert(out.keySet === brute.keySet)
    brute.foreach { case (src, pts) =>
      val n = pts.length.toLong
      val sx = pts.map(_._2).sum
      val sy = pts.map(_._3).sum
      val sxy = pts.map(p => p._2 * p._3).sum
      val sxx = pts.map(p => p._2 * p._2).sum
      assert(out(src) === ((n, n * sxy - sx * sy, n * sxx - sx * sx)), s"source=$src")
      // vocabulary can't grow faster than tokens: 0 <= beta <= 1 (+ floor noise)
      val beta = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx)
      assert(beta > 0.0 && beta < 1.05, s"source=$src beta=$beta")
    }
  }

  test("q182: pmi recounts from the joint table; marginals are consistent") {
    val out = InfoQueries.q182(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("dow")) ->
        (r.getAs[Long]("n_xy"), r.getAs[Long]("n_x"), r.getAs[Long]("n_y"),
          r.getAs[Long]("pmi_micro"))).toMap
    val joint = Tables.events(spark, sf)
      .select(col("event_type"), expr("(unix_micros(ts) div 86400000000 + 4) % 7"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    assert(out.keySet === joint.keySet)
    val n = joint.values.sum
    val nx = joint.groupBy(_._1._1).map { case (k, m) => k -> m.values.sum }
    val ny = joint.groupBy(_._1._2).map { case (k, m) => k -> m.values.sum }
    joint.foreach { case ((et, dow), nxy) =>
      val (gNxy, gNx, gNy, pmi) = out((et, dow))
      assert(gNxy === nxy)
      assert(gNx === nx(et))
      assert(gNy === ny(dow))
      val want = math.floor(
        1e6 * math.log((nxy * n).toDouble / (nx(et) * ny(dow)).toDouble)).toLong
      assert(pmi === want, s"($et,$dow)")
    }
    // MI = SUM(n_xy*pmi)/n must be ~non-negative (floor bias only)
    val mi = joint.map { case (k, nxy) => nxy * out(k)._4 }.sum / n
    assert(mi >= -joint.size, s"mi_micro=$mi")
  }

  test("char_ngrams is callable from pure SQL via the extension registry") {
    val got = spark.sql(
      "SELECT char_ngrams('abcd', 2) AS g, char_ngrams('abcd', 3) AS h")
      .collect().head
    assert(got.getSeq[String](0).toList === List("ab", "bc", "cd"))
    assert(got.getSeq[String](1).toList === List("abc", "bcd"))
    val err = intercept[Exception] {
      spark.sql("SELECT char_ngrams('abcd', CAST(rand() * 2 AS INT))").collect()
    }
    assert(err.getMessage.contains("integer literal") ||
      Option(err.getCause).exists(_.getMessage.contains("integer literal")))
  }
}
