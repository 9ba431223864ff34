package graft

import org.apache.spark.sql.functions._

import graft.operators.ProductQuant
import graft.queries.PqQueries
import graft.sources.Tables

/** Product quantization: codebook fit, encode, ADC search + exact
  * re-rank (q149).
  */
class PqSpec extends SparkSpec {

  private val M = PqQueries.PqM
  private val K = PqQueries.PqK
  private lazy val emb = Tables.embeddings(spark, sf)
  private lazy val cb = ProductQuant.fit(emb, "embedding", m = M, k = K)
  private lazy val subDim = cb.subDim

  test("fit: codebook geometry matches the requested decomposition") {
    assert(cb.m === M && cb.k === K && cb.subDim === 64 / M)
    assert(cb.centroids.length === M)
    cb.centroids.foreach { sub =>
      assert(sub.length === K)
      sub.foreach(c => assert(c.length === 64 / M))
    }
  }

  test("fit is deterministic: same data, same codebook") {
    val cb2 = ProductQuant.fit(emb, "embedding", m = M, k = K)
    assert(cb.centroids.map(_.map(_.toSeq).toSeq).toSeq ===
      cb2.centroids.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("encode: every vector gets m codes in [0, k); nearest wins") {
    val codes = ProductQuant.encode(emb, "vec_id", "embedding", cb).collect()
    assert(codes.length === emb.count())
    val vecs = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    codes.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.length === M)
      cs.foreach(c => assert(c >= 0 && c < K))
      // spot-verify argmin against a driver-side recount
      val v = vecs(r.getLong(0))
      cs.zipWithIndex.foreach { case (code, j) =>
        val sub = v.slice(j * subDim, (j + 1) * subDim)
        def d2(c: Array[Double]) =
          sub.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
        val best = cb.centroids(j).map(d2).zipWithIndex.minBy(x => (x._1, x._2))._2
        assert(code === best, s"vec ${r.getLong(0)} subspace $j")
      }
    }
  }

  test("ADC distance equals the LUT recount for a sample probe") {
    val probe = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).first().getSeq[Double](0).toArray
    val adc = ProductQuant.encode(emb, "vec_id", "embedding", cb)
      .select(col("vec_id"), ProductQuant.adcCol(col("codes"), probe, cb).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val codes = ProductQuant.encode(emb, "vec_id", "embedding", cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    codes.foreach { case (id, cs) =>
      val expected = cs.zipWithIndex.map { case (c, j) =>
        val psub = probe.slice(j * subDim, (j + 1) * subDim)
        psub.zip(cb.centroids(j)(c)).map { case (a, b) => (a - b) * (a - b) }.sum
      }.sum
      assert(math.abs(adc(id) - expected) < 1e-9, s"vec $id")
    }
  }

  test("q149: ADC and refined recall clear their floors; refine never hurts") {
    val rows = PqQueries.q149(spark, sf).collect()
    assert(rows.length === 50)
    val adc = rows.map(_.getAs[Double]("recall_adc_at_10"))
    val ref = rows.map(_.getAs[Double]("recall_refined_at_10"))
    val meanAdc = adc.sum / adc.length
    val meanRef = ref.sum / ref.length
    // measured on the synthetic embeddings: adc ~0.42, refined ~0.83 —
    // floors pin that the index doesn't silently collapse
    assert(meanAdc >= 0.3, s"mean ADC recall@10 $meanAdc below floor")
    assert(meanRef >= 0.65, s"mean refined recall@10 $meanRef below floor")
    // exact re-ranking a superset shortlist can only improve recall
    rows.foreach { r =>
      assert(r.getAs[Double]("recall_refined_at_10") >=
        r.getAs[Double]("recall_adc_at_10") - 1e-9)
    }
  }

  test("pq_adc equals the element_at-on-literal formulation, bit-identical") {
    val probe = emb.filter(col("vec_id") === 7)
      .select(col("embedding").cast("array<double>")).first().getSeq[Double](0).toArray
    val codes = ProductQuant.encode(emb, "vec_id", "embedding", cb)
    // the pre-round-10 expression forest, reconstructed literally
    val oldForm = (0 until cb.m).map { j =>
      val lut = array(ProductQuant.lutFor(probe, cb)(j).map(lit): _*)
      element_at(lut, col("codes").getItem(j).cast("int") + 1)
    }.reduce(_ + _)
    val both = codes.select(col("vec_id"),
      ProductQuant.adcCol(col("codes"), probe, cb).as("nu"), oldForm.as("old"))
      .collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(2)), s"vec ${r.getLong(0)}")
    }
  }

  test("50-probe ADC scan compiles inside whole-stage codegen (no janino fallback)") {
    // With fallback disabled a >64 KB generated method FAILS the query
    // instead of silently de-codegen'ing — the exact regression the sf1
    // sweep caught in the per-probe expression-forest formulation.
    val before = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val probes = emb.filter(col("vec_id") < 50)
      val sl = ProductQuant.pqTopK(emb, probes, "vec_id", "embedding",
        k = PqQueries.PqShortlist, cb)
      assert(sl.count() > 0)
    } finally before match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }
}
