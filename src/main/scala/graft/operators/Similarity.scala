package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact — the probe set broadcasts, the corpus is
  *    scanned once, ranking is a per-probe window. Correctness baseline
  *    and the right plan whenever |probes| is small (the common case:
  *    a query batch against a 100 TB corpus → one corpus scan).
  *  - [[lshTopK]]: random-hyperplane LSH — corpus and probes are bucketed
  *    by an nBits signature; candidates come only from the probe's
  *    bucket, turning the quadratic scan into a groupBy-sized join.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each probe (probe ≠ neighbor). */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val p = probes.select(col(idCol).as("probe_id"),
      col(vecCol).cast("array<double>").as("pv"))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    c.join(broadcast(p), col("neighbor_id") =!= col("probe_id"))
      .withColumn("cos", cosine(col("pv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("probe_id", "neighbor_id", "rank")
  }

  /** Deterministic pseudo-random hyperplanes (seeded), as literal arrays —
    * evaluated once at plan time, broadcast with the plan.
    */
  def hyperplanes(nBits: Int, dim: Int, seed: Long = 42L): Seq[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nBits)(Array.fill(dim)(rng.nextGaussian()))
  }

  /** nBits-bit signature column: bit i = sign of projection onto plane i. */
  def lshSignature(vec: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val plane = array(p.map(lit): _*)
      when(dot(vec, plane) >= 0, shiftleft(lit(1), i)).otherwise(0)
    }.reduce((a, b) => a.bitwiseOR(b))

  /** IVF (inverted-file) ANN: a seeded KMeans coarse quantizer assigns
    * every corpus vector to a cell; each probe searches only its nProbe
    * closest cells. The index build is one KMeans fit (linear scans);
    * the search is an equi-join on cell id — per-probe work is
    * |corpus| · nProbe / nCells instead of |corpus|, and the corpus side
    * is shuffled once on a key that partitions evenly by construction.
    * Exact cosine ranking within the candidate cells.
    */
  def ivfTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
              vecCol: String, k: Int, nCells: Int, nProbe: Int,
              fitSampleCap: Long = 100000L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    val c = corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).cast("array<double>").as("cv"))
      .withColumn("fv", array_to_vector(col("cv")))
    // init "random" (seeded): the default k-means|| init alone costs
    // ~2·initSteps extra distributed passes over the fit set — more than
    // the 5 Lloyd iterations it precedes. A coarse quantizer only needs
    // evenly-spread cells, not an optimal clustering; random init plus
    // the same Lloyd budget yields equivalent cell balance here.
    val km = new KMeans().setK(nCells).setSeed(42L).setMaxIter(5)
      .setInitMode("random")
      .setFeaturesCol("fv").setPredictionCol("cell")
    // Coarse-quantizer centroids need a representative sample, not the
    // corpus: cap the fit set with a seeded uniform sample so the
    // KMeans iterations (maxIter full passes) scan ~fitSampleCap rows
    // instead of 100 TB. The count is one columnar-metadata-cheap scan;
    // ASSIGNMENT below still covers every corpus vector.
    val n = c.count()
    // content-hash Bernoulli on the unique id, not df.sample: the
    // per-partition RNG would pick a different fit set under a
    // different partition layout, making the quantizer (and every cell
    // assignment) vary run to run on identical data (the
    // ProductQuant.fit contract). denom = 2^40: a 10^6 denom would
    // stop bounding the fit set once n > 10^6·cap (floor clamps to 1).
    require(fitSampleCap >= 1 && fitSampleCap <= 1000000L,
      s"fit sample is a bounded driver-side KMeans set, cap $fitSampleCap out of range")
    val fit = if (n <= fitSampleCap) c
              else c.filter(
                pmod(xxhash64(col("neighbor_id")), lit(1L << 40)) <
                  // (2^40)·cap <= 2^40 · 10^6 < 2^63 by the require
                  math.max(1L, (1L << 40) * fitSampleCap / n))
    val model = km.fit(fit)
    val assigned = model.transform(c).select(col("neighbor_id"), col("cv"), col("cell"))
    // centroid table is nCells rows — broadcast; each probe ranks cells
    // by L2 (KMeans' own metric) and keeps the nProbe closest
    import spark.implicits._
    val cents = model.clusterCenters.zipWithIndex
      .map { case (v, i) => (i, v.toArray) }.toSeq.toDF("cell", "centroid")
    val wCell = Window.partitionBy("probe_id").orderBy(col("cd").asc, col("cell").asc)
    val probeCells = probes.select(col(idCol).as("probe_id"),
        col(vecCol).cast("array<double>").as("pv"))
      .crossJoin(broadcast(cents))
      .withColumn("cd", graft.functions.VectorFunctions.l2sq(col("pv"), col("centroid")))
      .withColumn("cr", row_number().over(wCell))
      .filter(col("cr") <= nProbe)
      .select("probe_id", "pv", "cell")
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    assigned.join(broadcast(probeCells), Seq("cell"))
      .filter(col("neighbor_id") =!= col("probe_id"))
      .withColumn("cos", cosine(col("pv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("probe_id", "neighbor_id", "rank")
  }

  /** ANN via shared LSH bucket; exact cosine ranking within the bucket.
    * Recall < 1 by construction — the scale path, not the oracle.
    */
  def lshTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
              vecCol: String, k: Int, nBits: Int, dim: Int): DataFrame = {
    val planes = hyperplanes(nBits, dim)
    val c = corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).cast("array<double>").as("cv"))
      .withColumn("bucket", lshSignature(col("cv"), planes))
    val p = probes.select(col(idCol).as("probe_id"),
        col(vecCol).cast("array<double>").as("pv"))
      .withColumn("bucket", lshSignature(col("pv"), planes))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    c.join(broadcast(p), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("probe_id"))
      .withColumn("cos", cosine(col("pv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("probe_id", "neighbor_id", "rank")
  }
}
