package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Incremental, Scd}

/** Metadata-driven staging→DWH orchestration — the reference's ETL core
  * (etl.py:132-284) re-expressed as a library of lazy plans.
  *
  * The reference drives everything from `trsh_meta_core_table_mapping`
  * rows; here [[TableMapping]] is the same contract. One `run` produces
  * the merged DWH tables plus the run-log DataFrame — counts come from
  * the merge plans themselves (`action` column), not from driver-side
  * mutation counters.
  */
object EtlPipeline {

  /** Reference main.ddl:271-347 row, minus the Postgres-isms. */
  case class TableMapping(
      sourceName: String,
      targetName: String,
      key: String,
      payload: Seq[String],
      scd: Int)

  case class RunResult(target: String, merged: DataFrame, log: DataFrame)

  /** Merge one staged source into its DWH target.
    *
    * scd=1 → [[Scd.scd1Merge]] (upsert, action-tagged)
    * scd=2 → [[Scd.scd2Merge]] against the provided history
    */
  def mergeTable(runId: Int, mapping: TableMapping, stg: DataFrame,
                 dwh: DataFrame, deleteTs: String): RunResult = {
    val merged = mapping.scd match {
      case 1 => Scd.scd1Merge(dwh, stg, mapping.key, mapping.payload)
      case 2 => Scd.scd2Merge(dwh, stg, mapping.key, mapping.payload, deleteTs)
      case other => throw new IllegalArgumentException(s"unsupported scd=$other")
    }
    val log = runLog(runId, mapping.targetName, merged, mapping.scd)
    RunResult(mapping.targetName, merged, log)
  }

  /** Run-log row (reference trsh_meta_etl_run_log): inserted/updated
    * counts derived from the merge output itself.
    */
  private def runLog(runId: Int, table: String, merged: DataFrame, scd: Int): DataFrame = {
    val counts =
      if (scd == 1)
        merged.agg(
          sum(when(col("action") === "I", 1L).otherwise(0L)).as("rows_inserted"),
          sum(when(col("action") === "U", 1L).otherwise(0L)).as("rows_updated"),
          lit(0L).as("rows_deleted"))
      else
        merged.agg(
          sum(when(!col("deleted_flg"), 1L).otherwise(0L)).as("rows_inserted"),
          lit(0L).as("rows_updated"),
          sum(when(col("deleted_flg"), 1L).otherwise(0L)).as("rows_deleted"))
    counts.select(lit(runId).as("run_id"), lit(table).as("table_name"),
      col("rows_inserted"), col("rows_updated"), col("rows_deleted"))
  }

  /** Incremental staging pull (reference etl.py:190-199): only rows whose
    * change timestamp is past the stored watermark.
    */
  def stage(source: DataFrame, createCol: String, updateCol: Option[String],
            watermark: String): DataFrame =
    updateCol match {
      case Some(u) => Incremental.changedSince(source, createCol, u, watermark)
      case None    => Incremental.newerThan(source, createCol, watermark)
    }
}
