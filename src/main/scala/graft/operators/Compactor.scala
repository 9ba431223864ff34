package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** File-compaction planning and execution — the maintenance pass
  * between incremental ingest and query on a 100 TB table: many small
  * ingest chunks (one per micro-batch / load window) merged into
  * target-sized output files so scans stop paying per-file open cost
  * and the NameNode/object-store stops tracking a million tiny
  * objects.
  *
  * Two halves, deliberately separable:
  *  - [[plan]] — pure metadata: one map-side-combined pass folds the
  *    corpus to <= |chunks| rows (chunk, n_rows, est_bytes), then the
  *    prefix-sum bin assignment bin = cum_bytes_before DIV target on
  *    that bounded frame. Greedy in chunk order: never splits a
  *    chunk, every bin lands within one chunk of target. This is
  *    q175's oracle-checked surface.
  *  - [[compact]] — execution: broadcast the (chunk -> bin) plan back
  *    onto the rows (the plan is metadata-sized by construction) and
  *    write one directory per bin. Rows move ONCE; the only shuffle
  *    is the write's own partitioning.
  *
  * The write is idempotent (overwrite mode, deterministic bin
  * assignment), so a failed compaction re-runs from scratch safely —
  * the same re-delivery posture as the SCD merges.
  */
object Compactor {

  /** The compaction plan: one row per chunk — (chunk, n_rows,
    * est_bytes, cum_before, bin), bins nondecreasing in chunk order.
    */
  def plan(df: DataFrame, chunkCol: Column, bytesPerRow: Column,
           targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    df.groupBy(chunkCol.as("chunk"))
      .agg(count(lit(1)).as("n_rows"),
        sum(bytesPerRow).cast("long").as("est_bytes"))
      .withColumn("cum_before",
        coalesce(sum("est_bytes").over(Window.orderBy("chunk")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).cast("long"))
      .withColumn("bin", expr(s"cum_before DIV $targetBytes"))
  }

  /** Execute the plan: write `df` to `outDir` partitioned by bin, one
    * directory per output bin, and return the manifest — one row per
    * bin: (bin, n_chunks, n_rows, est_bytes). The plan is COLLECTED
    * once (it is <= |chunks| rows by construction), so the broadcast
    * assignment and the manifest are both built from the same local
    * frame — the input scans exactly twice (plan + write), never a
    * third time when the manifest is consumed. A NULL chunk key is a
    * chunk like any other (null-safe join), so no row can silently
    * miss the write while the manifest bills it.
    */
  def compact(df: DataFrame, chunkCol: Column, bytesPerRow: Column,
              targetBytes: Long, outDir: String): DataFrame = {
    // the assignment join works through the '__chunk' working column and
    // writes partitioned by 'bin' — an input that already carries either
    // name would be silently overwritten (withColumn) or make the
    // post-join drop/partitionBy ambiguous, corrupting the layout
    require(!df.columns.contains("__chunk") && !df.columns.contains("bin"),
      "compact uses working columns '__chunk' and 'bin' — rename them in the input first")
    val spark = df.sparkSession
    val planDf = plan(df, chunkCol, bytesPerRow, targetBytes)
    val chunkType = planDf.schema("chunk").dataType
    require(Seq(org.apache.spark.sql.types.LongType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.ByteType).contains(chunkType),
      s"chunk expression must be integral, got $chunkType")
    val planRows = planDf
      .select(col("chunk").cast("long"), col("n_rows"), col("est_bytes"), col("bin"))
      .collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getLong(1), r.getLong(2), r.getLong(3)))
    import spark.implicits._
    val assignment = broadcast(
      planRows.map { case (c, _, _, b) => (c, b) }.toSeq.toDF("__chunk", "bin"))
    val withChunk = df.withColumn("__chunk", chunkCol.cast("long"))
    withChunk
      .join(assignment, withChunk("__chunk") <=> assignment("__chunk"))
      .drop(assignment("__chunk")).drop("__chunk")
      .write.mode("overwrite").partitionBy("bin").parquet(outDir)
    planRows.map { case (_, nRows, bytes, bin) => (bin, nRows, bytes) }.toSeq
      .groupBy(_._1).toSeq
      .map { case (bin, cs) =>
        (bin, cs.length.toLong, cs.map(_._2).sum, cs.map(_._3).sum)
      }
      .toDF("bin", "n_chunks", "n_rows", "est_bytes")
  }
}
