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
    * bin: (bin, n_chunks, n_rows, est_bytes). The manifest is computed
    * from the plan frame (metadata-sized), not by re-scanning the
    * written files.
    */
  def compact(df: DataFrame, chunkCol: Column, bytesPerRow: Column,
              targetBytes: Long, outDir: String): DataFrame = {
    val p = plan(df, chunkCol, bytesPerRow, targetBytes)
      .select(col("chunk"), col("n_rows"), col("est_bytes"), col("bin"))
    df.withColumn("__chunk", chunkCol)
      .join(broadcast(p.select(col("chunk").as("__chunk"), col("bin"))), "__chunk")
      .drop("__chunk")
      .write.mode("overwrite").partitionBy("bin").parquet(outDir)
    p.groupBy("bin")
      .agg(count(lit(1)).as("n_chunks"),
        sum("n_rows").cast("long").as("n_rows"),
        sum("est_bytes").cast("long").as("est_bytes"))
  }
}
