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

  /** Outcome of a [[forgetKey]] pass: files the bloom shortlisted,
    * files actually rewritten (or deleted when nothing remained),
    * rows removed, and the refreshed bloom index (persist it —
    * the old one references vanished files).
    */
  case class ForgetResult(filesExamined: Long, filesRewritten: Long,
                          rowsRemoved: Long, index: DataFrame)

  /** Right-to-be-forgotten as a SURGICAL rewrite: remove every row
    * with `keyCol = key` from a parquet directory by rewriting ONLY
    * the files whose bloom may contain the key — the
    * deletion-vector-lite mechanic a plain-parquet lakehouse has
    * available. Cost is bloom-bounded: a layout clustered on the key
    * (the [[graft.operators.ZOrder]]/repartitionByRange write path)
    * rewrites a handful of files; a hash-scattered key degrades to a
    * full rewrite — correctly, never silently missing a row (bloom
    * false negatives are impossible).
    *
    * Each hit file rewrites to a DETERMINISTIC sibling name derived
    * from (source file, key hash), then the source is deleted — so a
    * crash between the two steps re-converges on re-run (the rewrite
    * overwrites the same target; rows are never lost, and the
    * still-present source keeps the key findable until the delete
    * lands — readers in that window may see surviving rows twice,
    * the price of per-file atomicity on plain parquet; the snapshot-
    * swap table writes elsewhere make the same trade). NULL keys are
    * refused (no bloom membership; NULL never
    * equals a predicate) and null-keyed ROWS are always preserved.
    * Call with the STORED index (the [[graft.operators.FileBloomIndex]]
    * caveat); the returned refreshed index covers the rewritten files.
    */
  def forgetKey(spark: SparkSession, path: String, index: DataFrame,
                keyCol: String, key: Any,
                expectedItemsPerFile: Long = 1000000L,
                fpp: Double = 0.01): ForgetResult = {
    import graft.operators.FileBloomIndex
    require(key != null, "forgetKey needs a non-null key")
    val data = spark.read.parquet(path)
    val keyType = data.schema(keyCol).dataType
    val probe = lit(key).cast(keyType)
    val hk = spark.range(1).select(xxhash64(probe)).head().getLong(0)
    import spark.implicits._
    val candidates = index.select(col("file"), col("bloom"))
      .as[(String, Array[Byte])]
      .filter { case (_, bytes) =>
        org.apache.spark.util.sketch.BloomFilter
          .readFrom(new java.io.ByteArrayInputStream(bytes))
          .mightContainLong(hk)
      }
      .map(_._1).collect().sorted
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    var rewritten = 0L
    var removed = 0L
    candidates.foreach { file =>
      val rows = spark.read.parquet(file)
      val hits = rows.filter(col(keyCol) === probe).count()
      if (hits > 0) {
        val kept = rows.filter(col(keyCol).isNull || col(keyCol) =!= probe)
        val src = new Path(new java.net.URI(file))
        val base = src.getName.stripSuffix(".parquet")
        val target = new Path(src.getParent, s"$base-fk${java.lang.Long.toHexString(hk)}.parquet")
        if (kept.isEmpty) {
          // nothing remains: the delete alone is the rewrite
        } else {
          val tmp = new Path(src.getParent, s".tmp_fk_${src.getName}")
          kept.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
          val part = fs.globStatus(new Path(tmp, "part-*.parquet")) match {
            case Array(one) => one.getPath
            case other => throw new IllegalStateException(
              s"expected one part under $tmp, found ${other.length}")
          }
          if (fs.exists(target)) fs.delete(target, false)
          require(fs.rename(part, target), s"rename $part -> $target failed")
          fs.delete(tmp, true)
        }
        require(fs.delete(src, false), s"delete $src failed")
        rewritten += 1
        removed += hits
      }
    }
    val refreshed = FileBloomIndex.updateIndex(spark, path, index, keyCol,
      expectedItemsPerFile, fpp)
    ForgetResult(candidates.length.toLong, rewritten, removed, refreshed)
  }
}
