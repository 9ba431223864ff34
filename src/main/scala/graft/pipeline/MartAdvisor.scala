package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rebuild-vs-accumulate advisor for an incrementally maintained mart —
  * the decision the reference hardcodes (its fraud report always
  * ACCUMULATES past `MAX(report_dt)`, trsh_rep_fraud_sync.sql:22-24)
  * surfaced as a per-run cost readout so an operator can see when that
  * choice stops (or starts) being the right one.
  *
  * Cost model, in scanned-row units (the quantity that prices both a
  * parquet scan and the shuffle behind it):
  *  - REBUILD reprocesses the whole fact history: `cum_rows`.
  *  - ACCUMULATE reprocesses the increment plus the rule lookback
  *    window (the reference's velocity rule re-reads a trailing window
  *    of already-processed facts to evaluate increment rows against —
  *    `lookbackRuns` runs' worth), and pays `writeAmp`x on that volume
  *    for the merge machinery: staging the increment, the anti-join
  *    against the mart's high-water mark, and rewriting the touched
  *    output partitions. So `acc_cost = writeAmp * (n_new + lookback)`.
  *
  * The crossover is the advisor's point: on a young mart a rebuild is
  * CHEAPER than the merge machinery (cum < writeAmp*(new+lookback)),
  * and it also compacts output files; once history dwarfs the daily
  * increment, accumulation wins by the ratio cum/(new+lookback) — at
  * 100 TB that ratio is the difference between a nightly full-history
  * shuffle and a bounded incremental one.
  */
object MartAdvisor {

  /** Advise from per-run ingest counts: `daily` must have one row per
    * run (per `partitionCols` group, if any) with (`runCol`: orderable
    * run key, `nCol`: rows ingested). Output adds cumulative history,
    * both modeled costs, and the cheaper side's name. Exact integer
    * arithmetic end to end.
    *
    * Scale: the input is one row per RUN (bounded — runs, not facts),
    * so the running-sum window is over a frame that fits one task by
    * construction; callers aggregate the fact corpus down to per-run
    * counts first (one map-side-combined groupBy).
    */
  def advise(daily: DataFrame, runCol: String, nCol: String,
             writeAmp: Long = 3L, lookbackRuns: Int = 1,
             partitionCols: Seq[String] = Nil): DataFrame = {
    require(writeAmp >= 1L, s"writeAmp must be >= 1, got $writeAmp")
    require(lookbackRuns >= 0, s"lookbackRuns must be >= 0, got $lookbackRuns")
    val base =
      if (partitionCols.isEmpty) Window.orderBy(col(runCol))
      else Window.partitionBy(partitionCols.map(col): _*).orderBy(col(runCol))
    daily
      .withColumn("cum_rows",
        sum(col(nCol)).over(base.rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
      .withColumn("lookback_rows",
        if (lookbackRuns == 0) lit(0L)
        else coalesce(
          sum(col(nCol)).over(base.rowsBetween(-lookbackRuns, -1)), lit(0L)).cast("long"))
      .withColumn("acc_cost_rows",
        (lit(writeAmp) * (col(nCol) + col("lookback_rows"))).cast("long"))
      .withColumn("rebuild_cost_rows", col("cum_rows"))
      .withColumn("decision",
        when(col("acc_cost_rows") <= col("rebuild_cost_rows"), lit("accumulate"))
          .otherwise(lit("rebuild")))
  }

  /** Advise from a warehouse's own run log (`<warehouseDir>/etl_run_log`,
    * the reference's trsh_meta_etl_run_log): per (table, run) the
    * ingested volume is rows_inserted + rows_updated (deletes don't
    * rescan history under either strategy's scan model). One advisor
    * frame per table, ordered by run_id.
    */
  def adviseFromRunLog(spark: SparkSession, warehouseDir: String,
                       writeAmp: Long = 3L, lookbackRuns: Int = 1): DataFrame = {
    val perRun = spark.read.parquet(s"$warehouseDir/etl_run_log")
      .groupBy("table_name", "run_id")
      .agg((sum("rows_inserted") + sum("rows_updated")).cast("long").as("n_new"))
    advise(perRun, "run_id", "n_new", writeAmp, lookbackRuns,
        partitionCols = Seq("table_name"))
      .orderBy("table_name", "run_id")
  }
}
