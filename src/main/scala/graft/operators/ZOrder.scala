package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton curve) clustering for multi-dimensional data skipping.
  *
  * Interleaving the bits of several scan-predicate columns gives a single
  * sort key under which a contiguous file/partition range covers a small
  * hyper-rectangle of every dimension — so per-file min/max stats prune
  * scans on ANY of the interleaved columns, not just the leading sort
  * column. This is the standard lakehouse layout trick for 100 TB tables
  * queried along several axes; here it's plain Column arithmetic that
  * stays inside whole-stage codegen (constant-folded shifts).
  */
object ZOrder {

  /** Morton key from the low `bits` bits of each (non-negative integral)
    * column: column j's bit i lands at output position `i·n + j`.
    * Values wider than `bits` bits must be range-compressed first (the
    * usual recipe: rank or clamp); unchecked high bits simply don't
    * participate in the interleave.
    */
  def zvalue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "zvalue needs at least one column")
    val n = cols.size
    require(bits * n <= 63, s"$n columns at $bits bits overflow a signed long")
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** The matching z-value formula as oracle SQL (DuckDB dialect). */
  def zvalueSql(cols: Seq[String], bits: Int): String = {
    val n = cols.size
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield s"(((CAST($c AS BIGINT) >> $i) & 1) << ${i * n + j})"
    terms.mkString(" | ")
  }

  /** Write-side layout: contiguous z-ranges per partition, sorted within —
    * each output file then covers a tight rectangle in every dimension.
    */
  def cluster(df: DataFrame, zcol: Column, numPartitions: Int): DataFrame =
    df.repartitionByRange(numPartitions, zcol).sortWithinPartitions(zcol)

  /** The skipping index itself: per z-bucket row counts and min/max of
    * each dimension — what a scan planner consults to prune buckets.
    */
  def skippingIndex(df: DataFrame, dims: Seq[String], bits: Int,
                    bucketShift: Int): DataFrame = {
    val z = zvalue(dims.map(col), bits)
    val aggs = dims.flatMap(d =>
      Seq(min(col(d)).as(s"min_$d"), max(col(d)).as(s"max_$d")))
    df.withColumn("zbucket", shiftright(z, bucketShift))
      .groupBy("zbucket")
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** Per-FILE min/max stats of a written (ideally [[cluster]]ed) parquet
    * table — the index consulted by [[prunedRead]]. One metadata-light
    * scan; persist next to the table and refresh on write.
    */
  def fileIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                dims: Seq[String]): DataFrame = {
    val aggs = dims.flatMap(d =>
      Seq(min(col(d)).as(s"min_$d"), max(col(d)).as(s"max_$d")))
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** Range scan that READS ONLY the files whose [min,max] envelope
    * intersects the predicate — file-level skipping on top of the
    * z-order layout, the same mechanic a lakehouse table format applies
    * from its manifest stats. The index is file-count-sized (collected
    * driver-side, like any scan planner's manifest); the data read is
    * the pruned file list. The residual filter still applies, so the
    * result is exact regardless of layout.
    */
  def prunedRead(spark: org.apache.spark.sql.SparkSession, path: String,
                 index: DataFrame, dim: String, lo: Long, hi: Long): DataFrame = {
    val keep = index
      .filter(col(s"max_$dim") >= lo && col(s"min_$dim") <= hi)
      .select("file").collect().map(_.getString(0))
    val base =
      if (keep.isEmpty) spark.read.parquet(path).limit(0)
      else spark.read.parquet(keep.toIndexedSeq: _*)
    base.filter(col(dim) >= lo && col(dim) <= hi)
  }
}
