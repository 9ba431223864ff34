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
