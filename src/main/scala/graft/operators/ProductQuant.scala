package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding columns — the memory-scale
  * ANN path beyond q108's scalar int8: split each d-dim vector into m
  * contiguous subvectors, learn a k-centroid codebook per subspace
  * (KMeans on a capped seeded sample, the IVF fit contract), and store
  * each vector as m small codes. At d=64, m=8, k=16 that is 8 bytes
  * per vector vs 256 float bytes — a 32× index shrink, which is what
  * lets a 100 TB corpus' ANN index live in executor memory.
  *
  * Search is asymmetric distance computation (ADC): a probe's distance
  * to a coded vector ≈ Σ_j ‖probe_j − centroid_j[code_j]‖², read from
  * per-probe lookup tables. Probes are a bounded query batch (the q25
  * contract), so the m·k LUT entries per probe are computed at PLAN
  * time and folded in as literal arrays — scoring the corpus is one
  * codegen'd map pass over the codes column, no join, no vector math
  * per row (m array lookups + adds instead of d multiplies).
  *
  * Like every approximate index here (q68 LSH, q122 IVF), PQ ships
  * with a recall eval (q149) — an index without a measured quality
  * number is an unevaluated model.
  */
object ProductQuant {

  /** Learned codebooks: centroids(j)(c) is the c-th centroid of
    * subspace j, a subDim-length array.
    */
  case class Codebook(m: Int, k: Int, subDim: Int,
                      centroids: Array[Array[Array[Double]]])

  /** Fit one KMeans per subspace on a seeded capped sample (the
    * [[Similarity.ivfTopK]] fit contract: centroids need a
    * representative sample, not the corpus — fit passes scan
    * ~fitSampleCap rows; encoding below still covers every vector).
    * The m fits share ONE cached slice projection of the sample.
    */
  def fit(corpus: DataFrame, vecCol: String, m: Int, k: Int,
          fitSampleCap: Long = 100000L): Codebook = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    require(m >= 1 && k >= 2 && k <= 256,
      s"need 1 <= m, 2 <= k <= 256 (codes must stay byte-sized), got m=$m k=$k")
    val c = corpus.select(col(vecCol).cast("array<double>").as("v"))
      .filter(col("v").isNotNull)
    val dim = c.select(size(col("v"))).first().getInt(0)
    require(dim % m == 0, s"vector dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    val n = c.count()
    val sample = if (n <= fitSampleCap) c
                 else c.sample(withReplacement = false,
                   fitSampleCap.toDouble / n, seed = 42L)
    val sliced = sample.select((0 until m).map(j =>
      array_to_vector(slice(col("v"), j * subDim + 1, subDim)).as(s"s$j")): _*)
      .cache()
    try {
      val centroids = (0 until m).map { j =>
        // random init for the same reason as the IVF quantizer: k-means||
        // costs extra distributed passes a codebook doesn't need
        val km = new KMeans().setK(k).setSeed(42L + j).setMaxIter(5)
          .setInitMode("random").setFeaturesCol(s"s$j").setPredictionCol("c")
        km.fit(sliced).clusterCenters.map(_.toArray)
      }.toArray
      Codebook(m, k, subDim, centroids)
    } finally sliced.unpersist(blocking = false)
  }

  /** The m-code array for a vector column: per subspace, argmin-L2 over
    * the k literal centroids — k codegen'd `vec_l2sq` calls whose min
    * is taken over a (distance, index) struct array, so ties break to
    * the SMALLEST centroid index deterministically. All constants fold
    * into the plan; no shuffle, no UDF.
    */
  def encodeCol(vec: Column, cb: Codebook): Column =
    array((0 until cb.m).map { j =>
      val sub = slice(vec, j * cb.subDim + 1, cb.subDim)
      val cand = array((0 until cb.k).map { c =>
        struct(
          graft.functions.VectorFunctions
            .l2sq(sub, array(cb.centroids(j)(c).map(lit): _*)).as("d"),
          lit(c).as("i"))
      }: _*)
      array_min(cand).getField("i")
    }: _*)

  /** Corpus → (id, codes) — the stored PQ index, 1 small int per
    * subspace. Zero-shuffle map stage (q108's shape at 32× instead of
    * 4× compression).
    */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
             cb: Codebook): DataFrame =
    corpus.select(col(idCol),
      encodeCol(col(vecCol).cast("array<double>"), cb).as("codes"))

  private def l2Local(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
    acc
  }

  /** ADC distance of a coded vector to one known probe: the probe's
    * m·k LUT is computed here (driver, plan time) and folded in as
    * literal arrays — per corpus row, m `element_at` lookups + adds.
    */
  def adcCol(codes: Column, probe: Array[Double], cb: Codebook): Column =
    (0 until cb.m).map { j =>
      val psub = probe.slice(j * cb.subDim, (j + 1) * cb.subDim)
      val lut = array((0 until cb.k).map { c =>
        lit(l2Local(psub, cb.centroids(j)(c)))
      }: _*)
      element_at(lut, codes.getItem(j).cast("int") + 1)
    }.reduce(_ + _)

  /** PQ-ADC top-k per probe. The probe set is COLLECTED — the bounded
    * query-batch contract shared with [[Similarity.bruteForceTopK]]'s
    * broadcast (a handful of query vectors against the corpus); the
    * corpus side is one scan of the codes index with literal LUTs, then
    * the per-probe top-k window. Ties break (distance, neighbor_id).
    */
  def pqTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
             vecCol: String, k: Int, cb: Codebook): DataFrame = {
    val ps = probes
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    require(ps.nonEmpty && ps.length <= 1024,
      s"probe set is a bounded query batch, got ${ps.length}")
    val codes = encode(corpus, idCol, vecCol, cb)
      .withColumnRenamed(idCol, "neighbor_id")
    val perProbe = array(ps.map { case (pid, pv) =>
      struct(lit(pid).as("probe_id"), adcCol(col("codes"), pv, cb).as("adist"))
    }: _*)
    val w = Window.partitionBy("probe_id")
      .orderBy(col("adist").asc, col("neighbor_id").asc)
    codes.select(col("neighbor_id"), explode(perProbe).as("s"))
      .select(col("s.probe_id").as("probe_id"), col("neighbor_id"), col("s.adist"))
      .filter(col("neighbor_id") =!= col("probe_id"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("probe_id", "neighbor_id", "rank")
  }

  /** PQ search with exact re-ranking — the production ANN pipeline:
    * ADC produces a `shortlist`-deep candidate set per probe (coarse,
    * cheap: code lookups over the whole corpus), then ONLY the
    * shortlisted vectors are fetched and exactly re-ranked by L2 (the
    * q72 LSH→exact-verify philosophy applied to ANN). At 100 TB the
    * refine join touches |probes|·shortlist rows — the full-precision
    * vectors never stream past the coarse stage. Recall is set by the
    * shortlist depth (measured by q149, floor-pinned by PqSpec).
    */
  def pqTopKRefined(corpus: DataFrame, probes: DataFrame, idCol: String,
                    vecCol: String, k: Int, shortlist: Int,
                    cb: Codebook): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must cover k=$k")
    val cand = pqTopK(corpus, probes, idCol, vecCol, shortlist, cb)
      .select(col("probe_id"), col("neighbor_id"))
    val vecs = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val pvecs = probes.select(col(idCol).as("probe_id"),
      col(vecCol).cast("array<double>").as("pv"))
    val w = Window.partitionBy("probe_id").orderBy(col("d").asc, col("neighbor_id").asc)
    cand.join(vecs, Seq("neighbor_id"))
      .join(broadcast(pvecs), Seq("probe_id"))
      .withColumn("d", graft.functions.VectorFunctions.l2sq(col("pv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("probe_id", "neighbor_id", "rank")
  }

  /** Exact L2 top-k per probe — ADC approximates L2, so its recall is
    * measured against the L2 ground truth (the cosine baseline q25
    * ranks by is a different metric). Same broadcast-probe shape as
    * [[Similarity.bruteForceTopK]].
    */
  def bruteForceL2TopK(corpus: DataFrame, probes: DataFrame, idCol: String,
                       vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val p = probes.select(col(idCol).as("probe_id"),
      col(vecCol).cast("array<double>").as("pv"))
    val w = Window.partitionBy("probe_id").orderBy(col("d").asc, col("neighbor_id").asc)
    c.join(broadcast(p), col("neighbor_id") =!= col("probe_id"))
      .withColumn("d", graft.functions.VectorFunctions.l2sq(col("pv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("probe_id", "neighbor_id", "rank")
  }
}
