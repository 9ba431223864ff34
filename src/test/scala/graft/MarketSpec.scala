package graft

import org.apache.spark.sql.functions._

import graft.queries.MarketQueries
import graft.sources.Tables

/** Round-8 eighth batch: brand price dispersion (q152), supplier HHI
  * concentration (q153), market-basket pair affinity (q154).
  */
class MarketSpec extends SparkSpec {

  test("q152: brand rollup recounts; dispersion exercised") {
    val out = MarketQueries.q152(spark, sf).collect()
      .map(r => r.getAs[String]("p_brand") -> r).toMap
    val parts = Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_brand"),
        round(col("p_retailprice") * 100).cast("bigint"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val rev = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), round(col("l_extendedprice") * 100).cast("bigint"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> (v.map(_._2).sum, v.length.toLong) }
    parts.groupBy(_._2).foreach { case (brand, ps) =>
      val r = out(brand)
      assert(r.getAs[Long]("n_parts") === ps.length.toLong)
      val cents = ps.map(_._3)
      assert(r.getAs[Long]("min_cents") === cents.min)
      assert(r.getAs[Long]("max_cents") === cents.max)
      assert(r.getAs[Long]("sum_cents") === cents.sum)
      assert(r.getAs[Long]("rev_cents") ===
        ps.map(p => rev.get(p._1).map(_._1).getOrElse(0L)).sum)
      assert(r.getAs[Long]("n_lines") ===
        ps.map(p => rev.get(p._1).map(_._2).getOrElse(0L)).sum)
      assert(r.getAs[Long]("spread_ppm") ===
        (cents.max - cents.min) * 1000000L / cents.min)
    }
    assert(out.size === 25)
  }

  test("q153: HHI recounts from basis-point shares; bounded by 1e8") {
    val out = MarketQueries.q153(spark, sf).collect()
      .map(r => r.getAs[String]("p_type") -> r).toMap
    val pType = Tables.part(spark, sf).select("p_partkey", "p_type")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val li = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_suppkey"),
        round(col("l_extendedprice") * 100).cast("bigint"))
      .collect().map(r => (pType(r.getLong(0)), r.getLong(1), r.getLong(2)))
    li.groupBy(_._1).foreach { case (t, xs) =>
      val bySupp = xs.groupBy(_._2).map { case (sp, v) => sp -> v.map(_._3).sum }
      val tot = bySupp.values.sum
      val shares = bySupp.values.map(r => r * 10000L / tot)
      val r = out(t)
      assert(r.getAs[Long]("n_suppliers") === bySupp.size.toLong)
      assert(r.getAs[Long]("rev_cents") === tot)
      assert(r.getAs[Long]("hhi") === shares.map(s => s * s).sum)
      assert(r.getAs[Long]("top_share_bp") === shares.max)
      assert(r.getAs[Long]("hhi") <= 100000000L)
    }
    assert(out.size === 6)
  }

  test("q154: top pairs equal the brute-force basket recount") {
    val out = MarketQueries.q154(spark, sf).collect()
    assert(out.length === MarketQueries.BasketTopK)
    val op = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val nOrders = op.map(_._1).distinct.length.toLong
    val cnt = op.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val support = op.groupBy(_._1).toSeq.flatMap { case (_, ps) =>
      val parts = ps.map(_._2).sorted
      for (i <- parts.indices; j <- i + 1 until parts.length)
        yield (parts(i), parts(j))
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val expected = support.toSeq
      .sortBy { case ((pa, pb), s) => (-s, pa, pb) }
      .take(MarketQueries.BasketTopK)
    out.zip(expected).foreach { case (r, ((pa, pb), s)) =>
      assert(r.getAs[Long]("pa") === pa)
      assert(r.getAs[Long]("pb") === pb)
      assert(r.getAs[Long]("support") === s)
      assert(r.getAs[Long]("cnt_a") === cnt(pa))
      assert(r.getAs[Long]("cnt_b") === cnt(pb))
      assert(r.getAs[Long]("lift_ppm") === s * nOrders * 1000000L / (cnt(pa) * cnt(pb)))
    }
  }

  test("q184: slope num/den equal the brute-force per-brand sums") {
    import graft.queries.MarketQueries
    val out = MarketQueries.q184(spark, sf).collect()
      .map(r => r.getAs[String]("p_brand") ->
        (r.getAs[Long]("n_lines"), r.getAs[Long]("slope_num"),
          r.getAs[Long]("slope_den"))).toMap
    val brandOf = graft.sources.Tables.part(spark, sf).collect()
      .map(r => r.getAs[Long]("p_partkey") -> r.getAs[String]("p_brand")).toMap
    val pts = graft.sources.Tables.lineitem(spark, sf)
      .select("l_partkey", "l_discount", "l_quantity").collect()
      .map(r => (brandOf(r.getLong(0)),
        math.round(r.getDouble(1) * 1000), math.round(r.getDouble(2))))
      .groupBy(_._1)
    assert(out.keySet === pts.keySet)
    pts.foreach { case (brand, xs) =>
      val n = xs.length.toLong
      val sx = xs.map(_._2).sum
      val sy = xs.map(_._3).sum
      val sxy = xs.map(p => p._2 * p._3).sum
      val sxx = xs.map(p => p._2 * p._2).sum
      assert(out(brand) === ((n, n * sxy - sx * sy, n * sxx - sx * sx)),
        s"brand=$brand")
    }
  }
}
