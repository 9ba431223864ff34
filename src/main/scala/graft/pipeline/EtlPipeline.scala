package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Incremental, Scd}
import graft.sources.{DelimitedSource, FileIngest, JsonlSource, XlsxSource}

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
  def mergeTable(runId: Long, mapping: TableMapping, stg: DataFrame,
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
  private def runLog(runId: Long, table: String, merged: DataFrame, scd: Int): DataFrame = {
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

  // ------------------------------------------------------------------
  // End-to-end file-driven run (reference etl.py:132-189 from_file +
  // main.py): find → read → watermark → merge → run-log → archive →
  // mart refresh.
  // ------------------------------------------------------------------

  /** One file-fed table: which inbox files feed it (glob with the
    * `name_DDMMYYYY.ext` business-date convention), the DWH key/payload,
    * the SCD mode, and which columns need decimal-comma normalization.
    */
  case class FileMapping(
      template: String,
      targetName: String,
      key: String,
      payload: Seq[String],
      scd: Int,
      decimalCols: Seq[String] = Nil)

  /** The all-strings parse schema for a jsonl-fed mapping: key +
    * payload, every field read as a raw string exactly like the
    * delimited reader delivers them (decimal normalization and the
    * create_dt timestamp cast happen downstream, shared with the
    * delimited path; create_dt itself comes from the file's business
    * date, not the JSON body).
    */
  private def jsonlSchema(m: FileMapping): org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(
      (m.key +: m.payload).map(c => org.apache.spark.sql.types.StructField(
        c, org.apache.spark.sql.types.StringType)))

  /** What one `run` did: the run-log rows it appended (also persisted to
    * `<warehouseDir>/etl_run_log` with run start/end timestamps), and
    * which inbox files it consumed.
    */
  case class RunReport(runId: Long, log: DataFrame,
                       processedFiles: Seq[String], archivedFiles: Seq[String])

  /** Allocate the next run id from the persistent run log — the
    * reference's NEXTVAL sequence (etl.py:45-51) re-based on the
    * warehouse state: max(run_id)+1, or 1 for a fresh warehouse.
    * Monotone across completed runs (each run appends its id to the
    * log). A parquet directory has no atomic counter, so two callers
    * allocating CONCURRENTLY against the same warehouse can still
    * collide — concurrent orchestration must hand out disjoint explicit
    * ids instead (the reference's sequence lives in the database and
    * doesn't have this gap).
    */
  def nextRunId(spark: SparkSession, warehouseDir: String): Long = {
    val path = s"$warehouseDir/etl_run_log"
    if (!hadoopFs(spark, path).exists(new Path(path))) 1L
    else {
      val mx = spark.read.parquet(path).agg(max(col("run_id"))).collect()(0)
      if (mx.isNullAt(0)) 1L else mx.getAs[Number](0).longValue() + 1L
    }
  }

  /** How a mart refreshes after the merge loop (main.py `mart_update`). */
  sealed trait MartRefresh

  /** Rebuild from the warehouse and snapshot-swap — always correct,
    * reads full history; the right default for small marts.
    */
  final case class MartRebuild(build: (SparkSession, String) => DataFrame)
      extends MartRefresh

  /** Append-only accumulation — the reference's mart semantics
    * (trsh_rep_fraud_sync.sql:22-24 `create_dt > MAX(report_dt)`) and
    * the 100 TB answer: `full` bootstraps an absent mart;
    * afterwards each refresh appends `increment(spark, whDir, since)`
    * where `since` is the stored mart's MAX(`watermarkCol`), rendered
    * at µs precision. `increment` must return exactly the rows with
    * `watermarkCol > since` ([[FraudMart.incrementalReport]]'s contract,
    * with its proven 96 h lookback re-window). Statement-idempotent: a
    * re-run recomputes MAX and appends nothing.
    */
  final case class MartAccumulate(
      full: (SparkSession, String) => DataFrame,
      increment: (SparkSession, String, String) => DataFrame,
      watermarkCol: String) extends MartRefresh

  /** Refresh a set of marts once, explicitly and IN THE GIVEN ORDER —
    * the reference's orchestration runs BOTH loops (`from_file`,
    * `from_database`) and then ONE `mart_update()` over the combined
    * warehouse state (main.py:16-18); express that as
    * `run(..., marts = empty)` + `runFromTables(...)` + this call.
    * The parameter is a Seq, not a Map, because a mart may read
    * another mart's output: Scala Maps iterate in hash order past 4
    * entries, which would refresh a dependent mart before its
    * upstream. (`run`/`replayQuarantine` keep their Map hooks for
    * single-loop deployments of INDEPENDENT marts — chained marts
    * belong here.)
    */
  def refreshMarts(spark: SparkSession, warehouseDir: String,
                   marts: Seq[(String, MartRefresh)]): Unit =
    marts.foreach { case (name, how) => refreshMart(spark, warehouseDir, name, how) }

  /** Optional RDBMS publish step after [[refreshMarts]] — the
    * reference's consumers read the fraud report out of Postgres, not
    * parquet (`database.py:44-66`, `etl.py:96-125`), so a migration
    * keeps that contract by pushing each refreshed mart to its
    * [[graft.sources.JdbcSink.Target]] (idempotent truncate+insert) and
    * the run log insert-only past the remote MAX(run_id). In order,
    * like refreshMarts; returns rows landed per mart.
    */
  def publishMarts(spark: SparkSession, warehouseDir: String,
                   targets: Seq[(String, graft.sources.JdbcSink.Target)],
                   runLog: Option[graft.sources.JdbcSink.Target] = None
                  ): Map[String, Long] = {
    val counts = targets.map { case (name, t) =>
      name -> graft.sources.JdbcSink.publishMart(spark, warehouseDir, name, t)
    }.toMap
    runLog.foreach(t => graft.sources.JdbcSink.publishRunLog(spark, warehouseDir, t))
    counts
  }

  /** Optional flat-file publish step — the outbound mirror of the
    * inbound `name_DDMMYYYY.txt` loop: each refreshed mart exported
    * once per business date in the legacy format
    * ([[graft.sources.DelimitedSink]]), for downstream consumers that
    * never migrated off file handoff. Returns the written path per
    * mart; the sink's single-file bound applies (marts, not corpora).
    */
  def exportMarts(spark: SparkSession, warehouseDir: String,
                  outDir: String, marts: Seq[String],
                  businessDate: java.time.LocalDate,
                  decimalCols: Map[String, Seq[String]] = Map.empty
                 ): Map[String, String] =
    marts.map { name =>
      name -> graft.sources.DelimitedSink.write(
        spark.read.parquet(s"$warehouseDir/$name"), outDir, name,
        businessDate, decimalCols.getOrElse(name, Nil))
    }.toMap

  private def refreshMart(spark: SparkSession, warehouseDir: String,
                          name: String, how: MartRefresh): Unit = how match {
    case MartRebuild(build) =>
      writeSwap(build(spark, warehouseDir), s"$warehouseDir/$name")
    case MartAccumulate(full, increment, wmCol) =>
      val path = s"$warehouseDir/$name"
      val exists = hadoopFs(spark, path).exists(new Path(path))
      val since =
        if (!exists) None
        else {
          val mx = spark.read.parquet(path).agg(max(col(wmCol))).collect()(0)
          if (mx.isNullAt(0)) None else Some(utcString(mx.getTimestamp(0)))
        }
      since match {
        case None     => writeSwap(full(spark, warehouseDir), path)
        case Some(ts) =>
          increment(spark, warehouseDir, ts)
            .write.mode(SaveMode.Append).parquet(path)
          // Each tick appends a few files; over many runs the mart
          // fragments into task-per-row scans. The census is
          // metadata-priced, so every tick checks and only a
          // fragmented mart pays the rewrite.
          if (graft.sources.Compaction.needsCompaction(spark, path))
            graft.sources.Compaction.compact(spark, path)
      }
  }

  /** The reference's whole ETL loop (etl.py:132-189, driven by main.py)
    * as one call. For each mapping, in business-date order and only for
    * files strictly past the target's stored watermark (etl.py:158 —
    * the per-table `last_update_dt` check):
    *
    *  1. read the file — txt/csv via [[DelimitedSource]], xlsx via
    *     [[XlsxSource]] (file.py's `__HANDLER` dispatch on extension) —
    *     and normalize decimal-comma columns,
    *  2. merge into the parquet DWH table at
    *     `<warehouseDir>/<targetName>` via [[mergeTable]] (scd1 upsert or
    *     scd2 versioning; absent keys tombstone at the file's business
    *     date),
    *  3. log staging + merge counts (trsh_meta_etl_run_log),
    *  4. archive the file to `<inbox>/archive/<name>.backup`
    *     (file.py:46-51).
    *
    * After all mappings, marts rebuild from the warehouse (main.py's
    * `etl.mart_update()`), each written to `<warehouseDir>/<martName>`.
    *
    * State lives entirely in the warehouse directory (parquet tables +
    * `etl_watermark` + appended `etl_run_log`), so re-running is
    * idempotent: already-consumed business dates are skipped by the
    * watermark, exactly like the reference's meta-table check. Per-table
    * state is snapshot-swapped (write new, rename over old), never
    * read-modify-written in place.
    *
    * Scale: the driver touches only metadata (file lists, watermark map,
    * 1-row count aggregates); every data motion is a distributed plan.
    * Daily dimension files are small by construction — the 100 TB side
    * (facts) flows through [[stage]]/Incremental against partitioned
    * sources, not through this inbox loop.
    *
    * `quarantineDir`: when set, delimited files read through
    * [[DelimitedSource.readWithQuarantine]] — rows missing the mapping
    * key or carrying unparseable decimal values are appended (raw, with
    * `reject_reason`/`src_file`/`run_id`) to
    * `<quarantineDir>/<targetName>` instead of flowing into the merge
    * as silent nulls, and each file's reject count is logged as a
    * `qtn_<target>` run-log row. Without it the permissive legacy
    * behavior is unchanged.
    */
  def run(spark: SparkSession, inboxDir: String, warehouseDir: String,
          mappings: Seq[FileMapping], runId: Long,
          marts: Map[String, MartRefresh] = Map.empty,
          archiveFiles: Boolean = true,
          quarantineDir: Option[String] = None): RunReport = {
    val runStart = new java.sql.Timestamp(System.currentTimeMillis())
    var wm = loadWatermarks(spark, warehouseDir)
    val logRows = Seq.newBuilder[(Long, String, Long, Long, Long)]
    val processed = Seq.newBuilder[String]
    val archived = Seq.newBuilder[String]

    mappings.foreach { m =>
      requireValidTarget(m.targetName)
      val last = wm.get(m.targetName)
      val fresh = FileIngest.find(spark, inboxDir, Seq(m.template))
        .map(p => (p, businessDate(p)))
        .filter { case (_, d) => last.forall(d.isAfter) }
        .sortBy(_._2)
      // Two files with the SAME business date matching one template have
      // no defined merge order, and the second same-date scd2 merge
      // would violate scd2Merge's forward-order precondition (silently
      // producing versions with effective_to < effective_from). Refuse
      // up front — a redelivery should replace the file, not add one.
      val dup = fresh.groupBy(_._2).collect {
        case (d, fs) if fs.size > 1 => s"$d: ${fs.map(_._1).sorted.mkString(", ")}"
      }
      require(dup.isEmpty,
        s"mapping ${m.template}: multiple inbox files share a business date — " +
          s"merge order is undefined. ${dup.mkString("; ")}")
      fresh.foreach { case (path, dt) =>
        val isXlsx = path.toLowerCase.endsWith(".xlsx")
        // A quarantined row's key was PRESENT in the delivery — only its
        // payload was unparseable. The snapshot-based scd2 merge reads
        // key absence as deleted-at-source, so feeding it the thinned
        // good frame would tombstone live entities (phantom deletes).
        // When rejects exist, liveness switches to an explicit key list
        // covering good ∪ quarantined keys; scd1 ignores liveness.
        var liveness: Scd.Liveness = Scd.SnapshotStg
        val isJsonl = path.toLowerCase.endsWith(".jsonl")
        val norm = (quarantineDir, isXlsx) match {
          case (Some(qdir), false) =>
            // jsonl shards get the SAME audited reject loop as
            // delimited files: raw-line quarantine (replayable verbatim
            // via JsonlSource.splitRaw), a qtn_ run-log row, and the
            // key-list liveness switch. The jsonl quarantine stores raw
            // lines, so its key-list contribution is a best-effort
            // get_json_object pull — a line that is not even valid JSON
            // has no extractable key to protect.
            val q =
              if (isJsonl)
                JsonlSource.readWithQuarantine(spark, path,
                  jsonlSchema(m), Seq(m.key), m.decimalCols)
              else DelimitedSource.readWithQuarantine(
                spark, path, Seq(m.key), m.decimalCols)
            // count first (rejects are small by construction); write
            // only when non-empty so a clean run leaves no empty dirs
            val nBad = q.bad.count()
            if (nBad > 0) {
              // appending must not recreate a quarantine whose only
              // copy sits at __stage after an interrupted replay swap —
              // that would hide the orphan from replay's guard forever
              requireNoOrphanStage(spark, s"$qdir/${m.targetName}")
              q.bad.withColumn("run_id", lit(runId))
                .write.mode(org.apache.spark.sql.SaveMode.Append)
                .parquet(s"$qdir/${m.targetName}")
              logRows += ((runId, s"qtn_${m.targetName}", nBad, 0L, 0L))
              val badKeys =
                if (isJsonl)
                  q.bad.select(get_json_object(col("raw_line"), s"$$.${m.key}").as(m.key))
                else q.bad.select(m.key)
              liveness = Scd.KeyList(
                q.good.select(m.key).union(
                  badKeys.filter(col(m.key).isNotNull)).distinct())
            }
            if (isJsonl)
              q.good.withColumn("create_dt", lit(java.sql.Date.valueOf(dt)))
            else q.good
          case _ =>
            val raw =
              if (isXlsx) XlsxSource.read(spark, path)
              else if (isJsonl)
                JsonlSource.read(spark, path, jsonlSchema(m))
                  .withColumn("create_dt", lit(java.sql.Date.valueOf(dt)))
              else DelimitedSource.read(spark, path)
            DelimitedSource.normalizeDecimalColumns(raw, m.decimalCols)
        }
        val stg = norm.select(
          (m.key +: m.payload).map(col) :+
            col("create_dt").cast("timestamp").as("create_dt"): _*).persist()
        logRows += ((runId, s"stg_${m.targetName}", stg.count(), 0L, 0L))

        val deleteTs = dt.atStartOfDay().format(
          java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
        mergeInto(spark, warehouseDir,
          TableMapping(m.template, m.targetName, m.key, m.payload, m.scd),
          stg, runId, deleteTs, liveness, logRows)
        stg.unpersist(blocking = false)

        wm += (m.targetName -> dt)
        // persist the watermark WITH each table swap, not once at the
        // end of the whole run: a later mapping failing must not leave
        // an already-merged table accepting a redelivered older
        // snapshot (which would tombstone newer keys and invert
        // version intervals)
        saveWatermarks(spark, warehouseDir, wm)
        processed += path
        if (archiveFiles) archived += FileIngest.archive(spark, path)
      }
    }

    val log = writeRunLog(spark, warehouseDir, logRows.result(), runStart)

    refreshMarts(spark, warehouseDir, marts.toSeq)
    RunReport(runId, log, processed.result(), archived.result())
  }

  /** Append this run's log rows (with run start/end timestamps — the
    * reference's run_start_dt/run_end_dt, etl.py:108-125) and return the
    * count-only view callers assert on.
    */
  // Log schema note: run_id is Long and rows carry run_start_dt /
  // run_end_dt (both added in this library's current line). A warehouse
  // whose etl_run_log predates that (INT32 run_id, run_ts) mixes parquet
  // physical types in one directory — readers here do NOT mergeSchema,
  // so such a warehouse needs a one-time log rewrite before upgrading.
  private def writeRunLog(spark: SparkSession, warehouseDir: String,
                          rows: Seq[(Long, String, Long, Long, Long)],
                          runStart: java.sql.Timestamp): DataFrame = {
    import spark.implicits._
    val log = rows
      .toDF("run_id", "table_name", "rows_inserted", "rows_updated", "rows_deleted")
      .withColumn("run_start_dt", lit(runStart))
      .withColumn("run_end_dt", current_timestamp())
    // a no-op run appends nothing: an empty append writes a schemaless
    // marker directory that would break later schema inference (and
    // nextRunId) on a warehouse whose first run staged zero rows
    if (rows.nonEmpty)
      log.write.mode(SaveMode.Append).parquet(s"$warehouseDir/etl_run_log")
    log.drop("run_start_dt", "run_end_dt")
  }

  /** One database-fed table (reference etl.py:236-284 `from_database`):
    * any source relation (a JDBC read, another warehouse table, …) with
    * the reference's create/update change-tracking column pair.
    */
  case class TableFeed(mapping: TableMapping, source: DataFrame,
                       createCol: String = "create_dt",
                       updateCol: Option[String] = Some("update_dt"))

  /** The reference's `from_database` loop: per table, an INCREMENTAL
    * staging pull — only rows whose `COALESCE(update_dt, create_dt)`
    * passed the stored timestamp watermark (etl.py:190-199) — plus a
    * separately-pulled full key list for deletion detection
    * (etl.py:256-266 `stg_del`), merged via scd1 upsert or
    * [[Scd.scd2MergeIncremental]]. Keys merely unchanged since the
    * watermark are NOT tombstoned — that is the semantic difference from
    * the full-snapshot file path, and why the key list exists.
    *
    * Watermarks/run-log live beside the tables in `warehouseDir`, so
    * re-running with an unchanged source stages zero rows and rewrites
    * identical tables.
    */
  def runFromTables(spark: SparkSession, warehouseDir: String,
                    feeds: Seq[TableFeed], runId: Long,
                    deleteTs: String): RunReport = {
    val runStart = new java.sql.Timestamp(System.currentTimeMillis())
    var wm = loadTsWatermarks(spark, warehouseDir)
    val logRows = Seq.newBuilder[(Long, String, Long, Long, Long)]

    feeds.foreach { f =>
      val m = f.mapping
      requireValidTarget(m.targetName)
      val watermark = wm.getOrElse(m.targetName, "1900-01-01 00:00:00")
      val changeTs = f.updateCol match {
        case Some(u) => coalesce(col(u), col(f.createCol))
        case None    => col(f.createCol)
      }
      val stg = stage(f.source, f.createCol, f.updateCol, watermark)
        .select((m.key +: m.payload).map(col) :+
          changeTs.cast("timestamp").as("create_dt"): _*)
        .persist()
      logRows += ((runId, s"stg_${m.targetName}", stg.count(), 0L, 0L))
      // full key list: a column-pruned scan of the source (stg_del)
      val liveness = if (m.scd == 2) Scd.KeyList(f.source.select(m.key))
                     else Scd.SnapshotStg
      mergeInto(spark, warehouseDir, m, stg, runId, deleteTs, liveness, logRows)
      // advance the watermark to the newest staged change
      // (etl.py:100-106), rendered in UTC explicitly —
      // Timestamp.toString would use the JVM-default timezone while the
      // session (which re-parses it next run) is UTC, silently shifting
      // the watermark and skipping rows on tz-offset drivers
      val mx = Incremental.nextWatermark(stg, "create_dt").collect()(0)
      if (!mx.isNullAt(0)) wm += (m.targetName -> utcString(mx.getTimestamp(0)))
      stg.unpersist(blocking = false)
      // persist per feed, same reasoning as the file loop
      saveTsWatermarks(spark, warehouseDir, wm)
    }

    val log = writeRunLog(spark, warehouseDir, logRows.result(), runStart)
    RunReport(runId, log, Seq.empty, Seq.empty)
  }

  /** Continuous warehouse ingestion: each micro-batch of a stream
    * merges into the parquet target through the SAME merge→log→swap
    * step as the batch loops — a Delta-style streaming MERGE on plain
    * parquet. scd=1 upserts; scd=2 versions changed keys, with
    * deletions explicitly disabled (a stream of arrivals carries no
    * key-list; tombstones belong to the batch reconciliation run, which
    * passes a real key list to [[runFromTables]]). The returned query
    * runs until stopped; run-log rows append per micro-batch with
    * `run_id = batchId`.
    *
    * foreachBatch is at-least-once: on a micro-batch RETRY the merge
    * itself is idempotent (upserting identical rows changes nothing) but
    * a second log append would double-count inserts — so each batch
    * also logs a `stream_<target>` MARKER row, and a batch whose marker
    * is already present is skipped entirely, making the whole step
    * effectively-once. The marker name is what's checked (not the
    * target's own log rows): batch `run()`/`runFromTables` runs log
    * under the target name with ids from the same sequence space, and
    * matching on those would silently skip live micro-batches.
    *
    * The batch argument must already be shaped like a staging frame:
    * `mapping.key`, `mapping.payload`, and (for scd=2) `create_dt`.
    */
  def streamingMerge(stream: DataFrame, warehouseDir: String,
                     m: TableMapping): org.apache.spark.sql.streaming.StreamingQuery = {
    requireValidTarget(m.targetName)
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val logPath = s"$warehouseDir/etl_run_log"
          val marker = s"stream_${m.targetName}"
          val alreadyDone = hadoopFs(spark, logPath).exists(new Path(logPath)) &&
            !spark.read.parquet(logPath)
              .filter(col("run_id") === batchId && col("table_name") === marker)
              .isEmpty
          if (!alreadyDone) {
            val runStart = new java.sql.Timestamp(System.currentTimeMillis())
            val stg = batch.persist()
            val logRows = Seq.newBuilder[(Long, String, Long, Long, Long)]
            logRows += ((batchId, marker, 0L, 0L, 0L))
            mergeInto(spark, warehouseDir, m, stg, batchId,
              deleteTs = "9999-12-31 00:00:00", Scd.NoDeletes, logRows)
            writeRunLog(spark, warehouseDir, logRows.result(), runStart)
            stg.unpersist(blocking = false)
          }
        }
        ()
      }
      .start()
  }

  /** Close the quarantine loop: re-validate the rows parked at
    * `<quarantineDir>/<targetName>` (after an operator fixed them in
    * place, or after a mapping fix changed what's parseable) and merge
    * the now-clean ones into the warehouse.
    *
    * Freshness: the file loop delivers FULL SNAPSHOTS, so any delivery
    * after a quarantined row's business date supersedes it wholesale —
    * replaying a stale row would clobber newer state (and invert scd2
    * intervals, whose merge requires forward-ordered arrivals). Only
    * rows from the table's LATEST merged epoch (`create_dt` equal to
    * the stored business-date watermark) merge; older now-valid rows
    * are dropped as superseded, counted in the `qrp_<target>` log
    * row's `rows_deleted`. The merge is NoDeletes — a replay is an
    * arrival, never a snapshot, so it must not tombstone.
    *
    * The quarantine shrinks atomically (snapshot swap; the directory
    * is removed outright when nothing remains); still-invalid rows
    * stay with a recomputed `reject_reason` and original
    * `src_file`/`run_id` provenance. A jsonl row whose `src_file`
    * carries no parseable `_DDMMYYYY` business date cannot be stamped
    * for replay: it stays quarantined with `reject_reason =
    * 'dateless_src_file'` (rename the file to release it) rather than
    * aborting the batch — the other repairable rows still merge. Pass the same `marts` map as
    * `run` to refresh marts afterwards — note a `MartAccumulate`
    * whose stored watermark already covers the replayed rows' dates
    * will not re-derive them (strictly-greater contract); pair
    * replay-heavy feeds with `MartRebuild` or a lookback increment.
    */
  def replayQuarantine(spark: SparkSession, quarantineDir: String,
                       warehouseDir: String, m: FileMapping, runId: Long,
                       marts: Map[String, MartRefresh] = Map.empty): RunReport = {
    requireValidTarget(m.targetName)
    val runStart = new java.sql.Timestamp(System.currentTimeMillis())
    val path = s"$quarantineDir/${m.targetName}"
    val logRows = Seq.newBuilder[(Long, String, Long, Long, Long)]
    val fs = hadoopFs(spark, path)
    requireNoOrphanStage(spark, path)
    if (fs.exists(new Path(path))) {
      val qtn = spark.read.parquet(path)
      // a raw_line column marks a jsonl quarantine (stored verbatim
      // lines); re-split it through the SAME parser the ingest used,
      // deriving create_dt from the source file's business date — the
      // value run() stamped on the good rows of that delivery
      val sp =
        if (qtn.columns.contains("raw_line")) {
          // a dateless src_file (hand-renamed file) cannot be stamped
          // with a replay create_dt. It must not produce a null create_dt
          // — null fails the watermark filter, gets counted "stale", and
          // leaves the quarantine WITHOUT being merged: silent data loss.
          // But aborting the WHOLE replay on the first offender would
          // block every other repairable row behind one bad filename — so
          // dateless rows are split to a REJECTED side-channel instead:
          // they stay quarantined with reject_reason 'dateless_src_file'
          // (visible provenance, rename the file to release them) while
          // every dated row merges normally this run.
          // Gate on the PARSED date, not the regex: an 8-digit but
          // invalid business date (_31132024) passes the regex, then
          // to_date('ddMMyyyy') either throws executor-side under ANSI
          // (aborting the whole replay — the failure mode this branch
          // exists to remove) or yields a NULL create_dt under legacy
          // mode (counted "stale", never merged, never released:
          // silent loss). try_to_date turns both into NULL here, and
          // NULL routes to the dateless side-channel. A NULL src_file
          // makes regexp_extract NULL → try_to_date NULL → same
          // branch: NULL provenance is dateless.
          val parsedDate = call_function("try_to_date",
            regexp_extract(col("src_file"),
              graft.sources.FileIngest.BusinessDateRegex, 1), lit("ddMMyyyy"))
          val hasDate = parsedDate.isNotNull
          val dateless = qtn.filter(!hasDate)
            .withColumn("reject_reason", lit("dateless_src_file"))
          val s0 = graft.sources.JsonlSource.splitRaw(
            qtn.filter(hasDate).drop("reject_reason"),
            jsonlSchema(m), Seq(m.key), m.decimalCols)
          s0.copy(
            good = s0.good.withColumn("create_dt", parsedDate),
            bad = s0.bad.unionByName(dateless))
        } else DelimitedSource.validitySplit(
          qtn.drop("reject_reason"), Seq(m.key), m.decimalCols)
      val current = loadWatermarks(spark, warehouseDir).get(m.targetName) match {
        case Some(d) => sp.good.filter(col("create_dt").cast("date") >= lit(d.toString).cast("date"))
        case None    => sp.good
      }
      val nGood = current.count()
      val nStale = sp.good.count() - nGood
      if (nGood > 0 || nStale > 0) {
        logRows += ((runId, s"qrp_${m.targetName}", nGood, 0L, nStale))
        if (nGood > 0) {
          val stg = current.select(
            (m.key +: m.payload).map(col) :+
              col("create_dt").cast("timestamp").as("create_dt"): _*).persist()
          mergeInto(spark, warehouseDir,
            TableMapping(m.template, m.targetName, m.key, m.payload, m.scd),
            stg, runId, deleteTs = "9999-12-31 00:00:00", Scd.NoDeletes, logRows)
          stg.unpersist(blocking = false)
        }
        // replayed AND superseded rows both leave; only still-invalid stay
        if (sp.bad.isEmpty) fs.delete(new Path(path), true)
        else writeSwap(sp.bad, path)
      }
    }
    val log = writeRunLog(spark, warehouseDir, logRows.result(), runStart)
    refreshMarts(spark, warehouseDir, marts.toSeq)
    RunReport(runId, log, Seq.empty, Seq.empty)
  }

  // The run-log's table_name column doubles as a namespace: staging
  // counts log as stg_<target>, quarantine as qtn_/qrp_<target>, and
  // streaming idempotence markers as stream_<target>. A real target
  // named with one of these prefixes would collide (e.g. a table
  // literally called stream_x shares rows with streaming markers for
  // x, which can silently skip live micro-batches) — refused up front.
  private val ReservedPrefixes = Seq("stg_", "qtn_", "qrp_", "stream_")
  private def requireValidTarget(name: String): Unit =
    require(!ReservedPrefixes.exists(name.startsWith),
      s"target name '$name' starts with a reserved run-log prefix " +
        s"(${ReservedPrefixes.mkString(", ")}) — pick another name")

  /** Shared merge→log→snapshot-swap step for both the file and the
    * database loops.
    */
  private def mergeInto(spark: SparkSession, warehouseDir: String,
                        m: TableMapping, stg: DataFrame, runId: Long,
                        deleteTs: String, liveness: Scd.Liveness,
                        logRows: scala.collection.mutable.Builder[
                          (Long, String, Long, Long, Long),
                          Seq[(Long, String, Long, Long, Long)]]): Unit = {
    val targetPath = s"$warehouseDir/${m.targetName}"
    val dwh = readTargetOrEmpty(spark, targetPath,
      if (m.scd == 2)
        stg.select((m.key +: m.payload).map(col): _*).limit(0)
          .withColumn("effective_from", lit(null).cast("timestamp"))
          .withColumn("effective_to", lit(null).cast("timestamp"))
          .withColumn("deleted_flg", lit(false))
      else stg.select((m.key +: m.payload).map(col): _*).limit(0))
    val merged = ((m.scd, liveness) match {
      case (1, _)                   => Scd.scd1Merge(dwh, stg, m.key, m.payload)
      case (2, Scd.KeyList(lk))     => Scd.scd2MergeIncremental(dwh, stg, lk, m.key, m.payload, deleteTs)
      case (2, Scd.SnapshotStg)     => Scd.scd2Merge(dwh, stg, m.key, m.payload, deleteTs)
      case (2, Scd.NoDeletes)       => Scd.scd2MergeNoDeletes(dwh, stg, m.key, m.payload)
      case (other, _)               => throw new IllegalArgumentException(s"unsupported scd=$other")
    }).persist()
    val lr = runLog(runId, m.targetName, merged, m.scd).collect()(0)
    logRows += ((runId, m.targetName, lr.getAs[Long]("rows_inserted"),
      lr.getAs[Long]("rows_updated"), lr.getAs[Long]("rows_deleted")))
    writeSwap(if (m.scd == 1) merged.drop("action") else merged, targetPath)
    merged.unpersist(blocking = false)
  }

  /** Business date from `name_DDMMYYYY.ext` — the shared definition. */
  def businessDate(path: String): java.time.LocalDate =
    FileIngest.businessDate(path)

  private def hadoopFs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Explicit-UTC render at µs precision — never Timestamp.toString
    * (JVM-default timezone).
    */
  private def utcString(ts: java.sql.Timestamp): String =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
      .withZone(java.time.ZoneOffset.UTC).format(ts.toInstant)

  private def readTargetOrEmpty(spark: SparkSession, path: String,
                                empty: => DataFrame): DataFrame = {
    requireNoOrphanStage(spark, path)
    val fs = hadoopFs(spark, path)
    if (fs.exists(new Path(path))) spark.read.parquet(path) else empty
  }

  /** Snapshot-swap write: parquet to `<path>__stage`, then rename over
    * the old table. The write materializes the plan (which may read the
    * OLD table) before the old table is touched — Spark cannot overwrite
    * a path a lazy plan is still reading.
    */
  private def writeSwap(df: DataFrame, path: String): Unit = {
    val fs = hadoopFs(df.sparkSession, path)
    val stage = new Path(path + "__stage")
    df.write.mode(SaveMode.Overwrite).parquet(stage.toString)
    val p = new Path(path)
    if (fs.exists(p)) fs.delete(p, true)
    if (!fs.rename(stage, p))
      throw new java.io.IOException(s"rename $stage -> $p failed")
  }

  /** Per-target business-date watermark (reference meta `last_update_dt`,
    * etl.py:75-106) — a tiny parquet table, collected driver-side.
    */
  // A crash between writeSwap's delete and rename leaves the ONLY copy
  // of a table at the __stage path. Every reader AND every writer that
  // could recreate the target must refuse loudly then: silently reading
  // "empty" discards history (warehouse tables), resets watermarks
  // (backwards scd2 merges), or drops parked rejects (quarantine) —
  // and a writer recreating the target would HIDE the orphan from the
  // readers' checks forever.
  private def requireNoOrphanStage(spark: SparkSession, path: String): Unit = {
    val fs = hadoopFs(spark, path)
    if (!fs.exists(new Path(path)) && fs.exists(new Path(path + "__stage")))
      throw new IllegalStateException(
        s"$path is missing but ${path}__stage exists — an interrupted " +
          "snapshot swap. Recover by renaming the stage directory to the " +
          "target path before re-running.")
  }

  private def loadWatermarks(spark: SparkSession,
                             warehouseDir: String): Map[String, java.time.LocalDate] = {
    val path = s"$warehouseDir/etl_watermark"
    requireNoOrphanStage(spark, path)
    if (!hadoopFs(spark, path).exists(new Path(path))) Map.empty
    else spark.read.parquet(path).collect()
      .map(r => r.getString(0) -> java.time.LocalDate.parse(r.getString(1))).toMap
  }

  private def saveWatermarks(spark: SparkSession, warehouseDir: String,
                             wm: Map[String, java.time.LocalDate]): Unit = {
    import spark.implicits._
    if (wm.nonEmpty)
      writeSwap(wm.toSeq.map { case (t, d) => (t, d.toString) }
        .toDF("table_name", "last_dt"), s"$warehouseDir/etl_watermark")
  }

  /** Timestamp watermarks for the database loop (`max_update_dt`,
    * etl.py:75-106) — separate from the file loop's business-date store.
    */
  private def loadTsWatermarks(spark: SparkSession,
                               warehouseDir: String): Map[String, String] = {
    val path = s"$warehouseDir/etl_watermark_ts"
    requireNoOrphanStage(spark, path)
    if (!hadoopFs(spark, path).exists(new Path(path))) Map.empty
    else spark.read.parquet(path).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
  }

  private def saveTsWatermarks(spark: SparkSession, warehouseDir: String,
                               wm: Map[String, String]): Unit = {
    import spark.implicits._
    if (wm.nonEmpty)
      writeSwap(wm.toSeq.toDF("table_name", "last_ts"),
        s"$warehouseDir/etl_watermark_ts")
  }
}
