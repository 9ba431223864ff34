package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Operational inventory of a graft parquet warehouse — the
  * observability the reference keeps in its meta tables
  * (trsh_meta_etl_update, trsh_meta_etl_run_log) surfaced as one frame
  * an operator can eyeball or alert on.
  *
  * Listing is metadata-priced: one FileSystem recursive listing per
  * table (the same cost every parquet write's commit pays) plus reads
  * of the two small meta tables; no data files open. At 100 TB the
  * listing parallelizes per table on the driver's FS client — for
  * object stores with slow LIST, point it at the table subset you're
  * auditing.
  */
object WarehouseOps {

  private val MetaTables = Set("etl_watermark", "etl_watermark_ts", "etl_run_log")

  /** One row per warehouse table: file/byte footprint, last file
    * modification, stored watermark — the file loop's business date or
    * the database loop's timestamp, whichever store names the table
    * (null when neither does) — and the id/time of the LAST run that
    * wrote it, taken from one run-log row (struct-max on
    * (run_end_dt, run_id), so the pair is internally consistent even
    * when caller-supplied run ids aren't time-ordered). Meta tables
    * themselves are excluded.
    */
  def inventory(spark: SparkSession, warehouseDir: String): DataFrame = {
    import spark.implicits._
    val root = new Path(warehouseDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tables =
      if (!fs.exists(root)) Array.empty[org.apache.hadoop.fs.FileStatus]
      else fs.listStatus(root).filter(s =>
        s.isDirectory && !MetaTables(s.getPath.getName))
    val rows = tables.map { t =>
      val it = fs.listFiles(t.getPath, true)
      var nFiles = 0L; var bytes = 0L; var lastMod = 0L
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) {
          nFiles += 1; bytes += f.getLen
          if (f.getModificationTime > lastMod) lastMod = f.getModificationTime
        }
      }
      (t.getPath.getName, nFiles, bytes,
        if (lastMod == 0) null else new java.sql.Timestamp(lastMod))
    }.toSeq.toDF("table_name", "n_files", "total_bytes", "last_modified")

    def wmStore(name: String) = {
      val p = s"$warehouseDir/$name"
      if (fs.exists(new Path(p)))
        spark.read.parquet(p).toDF("table_name", "watermark")
      else Seq.empty[(String, String)].toDF("table_name", "watermark")
    }
    val wm = wmStore("etl_watermark").unionByName(wmStore("etl_watermark_ts"))

    val logPath = s"$warehouseDir/etl_run_log"
    val lastRun =
      if (fs.exists(new Path(logPath)))
        spark.read.parquet(logPath)
          .groupBy("table_name")
          .agg(max(struct(col("run_end_dt"), col("run_id"))).as("lr"))
          .select(col("table_name"), col("lr.run_id").as("last_run_id"),
            col("lr.run_end_dt").as("last_run_dt"))
      else Seq.empty[(String, Long, java.sql.Timestamp)]
        .toDF("table_name", "last_run_id", "last_run_dt")

    rows.join(wm, Seq("table_name"), "left")
      .join(lastRun, Seq("table_name"), "left")
      .orderBy("table_name")
  }
}
