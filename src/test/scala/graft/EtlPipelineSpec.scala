package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.pipeline.{EtlPipeline, WarehouseOps}
import graft.pipeline.EtlPipeline.{FileMapping, TableMapping}
import graft.operators.Scd
import graft.sources.Tables

class EtlPipelineSpec extends SparkSpec {

  private def mkFile(dir: String, name: String, content: String): String =
    Files.writeString(Paths.get(dir, name), content).toString

  private def logRow(rep: EtlPipeline.RunReport, table: String) =
    rep.log.filter(col("table_name") === table).collect()(0)

  test("end-to-end run: find, stage, merge, run-log, archive, watermark, mart") {
    val inbox = Files.createTempDirectory("graft_inbox").toString
    val wh = Files.createTempDirectory("graft_wh").toString
    val mappings = Seq(
      FileMapping("rates_*.csv", "dwh_rates", "cur", Seq("rate"), scd = 1,
        decimalCols = Seq("rate")),
      FileMapping("terminals_*.csv", "dwh_terminals", "term_id", Seq("city"), scd = 2),
      FileMapping("blacklist_*.xlsx", "dwh_blacklist", "passport", Seq("entry_dt"), scd = 1))
    val marts = Map[String, EtlPipeline.MartRefresh](
      "mart_rate_count" -> EtlPipeline.MartRebuild((s, whDir) =>
        s.read.parquet(s"$whDir/dwh_rates").agg(count(lit(1)).as("n"))))

    // --- day 1 ---
    mkFile(inbox, "rates_01012024.csv", "cur;rate\nUSD;90,5\nEUR;99,1\n")
    mkFile(inbox, "terminals_01012024.csv", "term_id;city\nT1;Moscow\nT2;Kazan\nT3;Perm\n")
    TestXlsx.write(s"$inbox/blacklist_01012024.xlsx",
      Seq("passport", "entry_dt"), Seq(Seq("P1", "2024-01-01"), Seq("P2", "2024-01-01")))

    val r1 = EtlPipeline.run(spark, inbox, wh, mappings, runId = 1, marts = marts)
    assert(r1.processedFiles.size == 3 && r1.archivedFiles.size == 3)
    assert(r1.archivedFiles.forall(_.contains("/archive/")))
    assert(logRow(r1, "stg_dwh_rates").getAs[Long]("rows_inserted") == 2)
    assert(logRow(r1, "dwh_rates").getAs[Long]("rows_inserted") == 2)
    assert(logRow(r1, "dwh_blacklist").getAs[Long]("rows_inserted") == 2)
    assert(logRow(r1, "dwh_terminals").getAs[Long]("rows_inserted") == 3)
    val rates1 = spark.read.parquet(s"$wh/dwh_rates")
    assert(rates1.count() == 2)
    assert(math.abs(rates1.filter(col("cur") === "USD").collect()(0)
      .getAs[Double]("rate") - 90.5) < 1e-9)
    assert(spark.read.parquet(s"$wh/mart_rate_count").collect()(0).getAs[Long]("n") == 2)

    // --- day 2: rate change + new cur; terminal T2 moves, T3 disappears ---
    mkFile(inbox, "rates_02012024.csv", "cur;rate\nUSD;92,0\nEUR;99,1\nGBP;115,3\n")
    mkFile(inbox, "terminals_02012024.csv", "term_id;city\nT1;Moscow\nT2;Samara\n")

    val r2 = EtlPipeline.run(spark, inbox, wh, mappings, runId = 2, marts = marts)
    assert(r2.processedFiles.size == 2)
    val ratesLog = logRow(r2, "dwh_rates")
    assert(ratesLog.getAs[Long]("rows_inserted") == 1)  // GBP
    assert(ratesLog.getAs[Long]("rows_updated") == 1)   // USD
    val rates2 = spark.read.parquet(s"$wh/dwh_rates")
    assert(rates2.count() == 3)
    assert(math.abs(rates2.filter(col("cur") === "USD").collect()(0)
      .getAs[Double]("rate") - 92.0) < 1e-9)
    assert(math.abs(rates2.filter(col("cur") === "EUR").collect()(0)
      .getAs[Double]("rate") - 99.1) < 1e-9)

    // NOT cached: a cached plan would serve day-2 state to the identical
    // day-3 read below (cache is keyed on the logical plan)
    val terms = spark.read.parquet(s"$wh/dwh_terminals")
    // T1 open(1) + T2 closed+open(2) + T3 closed+tombstone(2)
    assert(terms.count() == 5)
    assert(terms.filter(col("deleted_flg")).count() == 1)
    assert(terms.filter(col("term_id") === "T2" && col("city") === "Samara" &&
      col("effective_to") === lit(Scd.OpenEnd).cast("timestamp")).count() == 1)
    assert(logRow(r2, "dwh_terminals").getAs[Long]("rows_deleted") == 1)

    // --- day 3: T3 returns with its ORIGINAL city — the snapshot path
    // must close the tombstone and revive the key (identical-state
    // revival, mirroring the reference's INTERSECT-with-deleted_flg)
    mkFile(inbox, "terminals_03012024.csv", "term_id;city\nT1;Moscow\nT2;Samara\nT3;Perm\n")
    EtlPipeline.run(spark, inbox, wh, mappings, runId = 3, marts = marts)
    val terms3 = spark.read.parquet(s"$wh/dwh_terminals")
    val t3open = terms3.filter(col("term_id") === "T3" &&
      col("effective_to") === lit(Scd.OpenEnd).cast("timestamp"))
    assert(t3open.count() == 1)
    assert(!t3open.collect()(0).getAs[Boolean]("deleted_flg"), "T3 must revive")
    assert(terms3.filter(col("term_id") === "T3").count() == 3) // closed, closed tombstone, open

    // --- run 4: nothing new — watermark skips everything ---
    val r3 = EtlPipeline.run(spark, inbox, wh, mappings, runId = 4, marts = marts)
    assert(r3.processedFiles.isEmpty && r3.log.count() == 0)

    // persistent combined run log accumulated all runs
    val fullLog = spark.read.parquet(s"$wh/etl_run_log")
    assert(fullLog.filter(col("run_id") === 1).count() == 6)
    assert(fullLog.filter(col("run_id") === 2).count() == 4)
  }

  test("random daily deliveries: warehouse PIT reproduces every delivered snapshot") {
    // The file-loop totality property (end-to-end sibling of
    // ScdPropertySpec's operator-level fold): deliver random daily
    // snapshot files — creates, changes, deletes, revivals, empty
    // days, decimal commas — through run(), then the warehouse's
    // point-in-time view at each day's midday must equal exactly what
    // that day's file said.
    for (seed <- Seq(7L, 21L)) {
      val rnd = new scala.util.Random(seed)
      val inbox = Files.createTempDirectory(s"graft_pt_in$seed").toString
      val wh = Files.createTempDirectory(s"graft_pt_wh$seed").toString
      val m = FileMapping("snap_*.csv", "dwh_snap", "k", Seq("v"), scd = 2,
        decimalCols = Seq("v"))
      val days = (1 to 4).map { d =>
        val snap = (1 to 6).filter(_ => rnd.nextBoolean())
          .map(i => s"K$i" -> s"${rnd.nextInt(100)},5").toMap
        mkFile(inbox, f"snap_${d}%02d012024.csv",
          "k;v\n" + snap.map { case (k, v) => s"$k;$v" }.mkString("\n") + "\n")
        EtlPipeline.run(spark, inbox, wh, Seq(m), runId = d)
        snap.map { case (k, v) => k -> v.replace(',', '.').toDouble }
      }
      days.zipWithIndex.foreach { case (snap, i) =>
        val probe = lit(f"2024-01-${i + 1}%02d 12:00:00").cast("timestamp")
        val pit = spark.read.parquet(s"$wh/dwh_snap")
          .filter(col("effective_from") <= probe && col("effective_to") >= probe &&
            !col("deleted_flg"))
          .select("k", "v").collect()
          .map(r => r.getString(0) -> r.getDouble(1)).toMap
        assert(pit === snap, s"seed $seed day ${i + 1}: PIT must equal the file")
      }
    }
  }

  test("reference orchestration: both loops then one explicit mart update") {
    val s = spark
    import s.implicits._
    val inbox = Files.createTempDirectory("graft_orch_in").toString
    val wh = Files.createTempDirectory("graft_orch_wh").toString
    mkFile(inbox, "rates_01012024.csv", "cur;rate\nUSD;90,5\nEUR;99,1\n")
    val fm = Seq(FileMapping("rates_*.csv", "dwh_rates", "cur", Seq("rate"), scd = 1,
      decimalCols = Seq("rate")))
    val src = Seq((1L, "Ann", java.sql.Timestamp.valueOf("2024-01-01 08:00:00"),
      null.asInstanceOf[java.sql.Timestamp])).toDF("client_id", "name", "create_dt", "update_dt")
    val feeds = Seq(EtlPipeline.TableFeed(
      TableMapping("clients", "dwh_clients", "client_id", Seq("name"), 1), src))
    // ordered seq: the second mart READS the first's output — refresh
    // order is binding, which is why refreshMarts takes a Seq
    val marts = Seq[(String, EtlPipeline.MartRefresh)](
      "mart_counts" -> EtlPipeline.MartRebuild((sp, whDir) =>
        sp.read.parquet(s"$whDir/dwh_rates").agg(count(lit(1)).as("n_rates"))
          .crossJoin(sp.read.parquet(s"$whDir/dwh_clients")
            .agg(count(lit(1)).as("n_clients")))),
      "mart_derived" -> EtlPipeline.MartRebuild((sp, whDir) =>
        sp.read.parquet(s"$whDir/mart_counts")
          .select((col("n_rates") + col("n_clients")).as("total"))))
    // main.py order: from_file, from_database, THEN one mart_update
    EtlPipeline.run(spark, inbox, wh, fm, runId = 61)
    EtlPipeline.runFromTables(spark, wh, feeds, runId = 62,
      deleteTs = "2024-01-02 00:00:00")
    EtlPipeline.refreshMarts(spark, wh, marts)
    val m = spark.read.parquet(s"$wh/mart_counts").head()
    assert(m.getAs[Long]("n_rates") === 2L && m.getAs[Long]("n_clients") === 1L,
      "the single mart update must see BOTH loops' tables")
    assert(spark.read.parquet(s"$wh/mart_derived").head().getAs[Long]("total") === 3L,
      "a chained mart refreshes after its upstream")
  }

  test("quarantine routes bad rows out of the merge and logs reject counts") {
    val inbox = Files.createTempDirectory("graft_qinbox").toString
    val wh = Files.createTempDirectory("graft_qwh").toString
    val qdir = Files.createTempDirectory("graft_qtn").toString
    val mappings = Seq(
      FileMapping("rates_*.csv", "dwh_rates", "cur", Seq("rate"), scd = 1,
        decimalCols = Seq("rate")))
    // good comma-decimal, unparseable decimal, missing key, good dot-decimal
    mkFile(inbox, "rates_01012024.csv",
      "cur;rate\nUSD;90,5\nJPY;1x2,3\n;77,0\nEUR;88.25\n")

    val r1 = EtlPipeline.run(spark, inbox, wh, mappings, runId = 11,
      quarantineDir = Some(qdir))
    val rates = spark.read.parquet(s"$wh/dwh_rates")
    assert(rates.count() == 2, "only clean rows may reach the warehouse")
    assert(math.abs(rates.filter(col("cur") === "USD").collect()(0)
      .getAs[Double]("rate") - 90.5) < 1e-9)
    val qtn = spark.read.parquet(s"$qdir/dwh_rates")
    assert(qtn.count() == 2)
    assert(qtn.select("reject_reason").collect().map(_.getString(0)).toSet ===
      Set("bad_decimal", "missing_required"))
    // the rejected row keeps its RAW string value and provenance
    val jpy = qtn.filter(col("cur") === "JPY").collect()(0)
    assert(jpy.getAs[String]("rate") === "1x2,3")
    assert(jpy.getAs[String]("src_file").contains("rates_01012024.csv"))
    assert(jpy.getAs[Long]("run_id") === 11L)
    assert(logRow(r1, "qtn_dwh_rates").getAs[Long]("rows_inserted") == 2)

    // a clean day appends nothing to the quarantine and logs no qtn row
    mkFile(inbox, "rates_02012024.csv", "cur;rate\nUSD;91,0\n")
    val r2 = EtlPipeline.run(spark, inbox, wh, mappings, runId = 12,
      quarantineDir = Some(qdir))
    assert(spark.read.parquet(s"$qdir/dwh_rates").count() == 2)
    assert(r2.log.filter(col("table_name") === "qtn_dwh_rates").isEmpty)
    assert(spark.read.parquet(s"$wh/dwh_rates")
      .filter(col("cur") === "USD").collect()(0).getAs[Double]("rate") == 91.0)
  }

  test("jsonl shards get the audited reject loop: qtn_ row, raw-line quarantine, replay") {
    val inbox = Files.createTempDirectory("graft_jinbox").toString
    val wh = Files.createTempDirectory("graft_jwh").toString
    val qdir = Files.createTempDirectory("graft_jqtn").toString
    val mappings = Seq(
      FileMapping("rates_*.jsonl", "dwh_jrates", "cur", Seq("rate"), scd = 1,
        decimalCols = Seq("rate")))
    // good comma-decimal, malformed json, missing key, bad decimal, good dot
    mkFile(inbox, "rates_01012024.jsonl",
      """{"cur":"USD","rate":"90,5"}
        |{"cur":"GBP","rate":
        |{"cur":"","rate":"77,0"}
        |{"cur":"JPY","rate":"1x2,3"}
        |{"cur":"EUR","rate":"88.25"}
        |""".stripMargin)

    val r1 = EtlPipeline.run(spark, inbox, wh, mappings, runId = 31,
      quarantineDir = Some(qdir))
    val rates = spark.read.parquet(s"$wh/dwh_jrates")
    assert(rates.count() == 2, "only clean rows may reach the warehouse")
    assert(math.abs(rates.filter(col("cur") === "USD").collect()(0)
      .getAs[Double]("rate") - 90.5) < 1e-9)
    // the business date stamped on the shard became the watermark —
    // the same create_dt path the delimited loop drives
    assert(WarehouseOps.inventory(spark, wh)
      .filter(col("table_name") === "dwh_jrates")
      .head().getAs[String]("watermark") === "2024-01-01")
    // the quarantine stores VERBATIM lines with provenance + reasons
    val qtn = spark.read.parquet(s"$qdir/dwh_jrates")
    assert(qtn.count() == 3)
    assert(qtn.select("reject_reason").collect().map(_.getString(0)).sorted.toSeq
      === Seq("bad_decimal", "malformed_json", "missing_required"))
    val jpy = qtn.filter(col("raw_line").contains("JPY")).collect()(0)
    assert(jpy.getAs[String]("raw_line") === """{"cur":"JPY","rate":"1x2,3"}""")
    assert(jpy.getAs[String]("src_file").contains("rates_01012024.jsonl"))
    assert(jpy.getAs[Long]("run_id") === 31L)
    assert(logRow(r1, "qtn_dwh_jrates").getAs[Long]("rows_inserted") == 3)
    assert(logRow(r1, "stg_dwh_jrates").getAs[Long]("rows_inserted") == 2)

    // replay: JPY's fee is still bad, but a corrected quarantine row
    // replays through the SAME jsonl parser back into the warehouse
    val fixed = spark.read.parquet(s"$qdir/dwh_jrates")
      .withColumn("raw_line",
        when(col("raw_line").contains("JPY"),
          lit("""{"cur":"JPY","rate":"1,23"}""")).otherwise(col("raw_line")))
    val tmp = Files.createTempDirectory("graft_jfix").toString
    fixed.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(s"$qdir/dwh_jrates")
    val r2 = EtlPipeline.replayQuarantine(spark, qdir, wh,
      mappings.head, runId = 32)
    assert(logRow(r2, "qrp_dwh_jrates").getAs[Long]("rows_inserted") == 1)
    val after = spark.read.parquet(s"$wh/dwh_jrates")
    assert(after.count() == 3)
    assert(math.abs(after.filter(col("cur") === "JPY").collect()(0)
      .getAs[Double]("rate") - 1.23) < 1e-9)
    // still-invalid lines stay quarantined, reasons recomputed
    val left = spark.read.parquet(s"$qdir/dwh_jrates").collect()
    assert(left.length == 2)
    assert(left.map(_.getAs[String]("reject_reason")).sorted.toSeq
      === Seq("malformed_json", "missing_required"))
  }

  test("replay parks dateless-src_file rows with a reason instead of aborting the batch") {
    val inbox = Files.createTempDirectory("graft_dlinbox").toString
    val wh = Files.createTempDirectory("graft_dlwh").toString
    val qdir = Files.createTempDirectory("graft_dlqtn").toString
    val m = FileMapping("rates_*.jsonl", "dwh_dlrates", "cur", Seq("rate"), scd = 1,
      decimalCols = Seq("rate"))
    mkFile(inbox, "rates_01012024.jsonl",
      """{"cur":"USD","rate":"90,5"}
        |{"cur":"JPY","rate":"1x2,3"}
        |{"cur":"GBP","rate":"zz"}
        |{"cur":"CHF","rate":"yy"}
        |{"cur":"DKK","rate":"xx"}
        |""".stripMargin)
    EtlPipeline.run(spark, inbox, wh, Seq(m), runId = 61, quarantineDir = Some(qdir))
    assert(spark.read.parquet(s"$qdir/dwh_dlrates").count() == 4)
    // repair ALL raw lines, but hand-rename one row's src_file so it has
    // no parseable business date, NULL another's entirely, and give a
    // third an 8-digit-but-INVALID date (month 13 — passes the regex,
    // fails the parse) — none may block the dated repair, abort the
    // batch under ANSI, or silently vanish
    val fixed = spark.read.parquet(s"$qdir/dwh_dlrates")
      .withColumn("raw_line",
        when(col("raw_line").contains("JPY"), lit("""{"cur":"JPY","rate":"1,23"}"""))
          .when(col("raw_line").contains("GBP"), lit("""{"cur":"GBP","rate":"2,5"}"""))
          .when(col("raw_line").contains("DKK"), lit("""{"cur":"DKK","rate":"4,5"}"""))
          .otherwise(lit("""{"cur":"CHF","rate":"3,5"}""")))
      .withColumn("src_file",
        when(col("raw_line").contains("GBP"), lit("rates_fixed.jsonl"))
          .when(col("raw_line").contains("CHF"), lit(null: String))
          .when(col("raw_line").contains("DKK"), lit("rates_31132024.jsonl"))
          .otherwise(col("src_file")))
    val tmp = Files.createTempDirectory("graft_dlfix").toString
    fixed.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(s"$qdir/dwh_dlrates")
    val r = EtlPipeline.replayQuarantine(spark, qdir, wh, m, runId = 62)
    assert(logRow(r, "qrp_dwh_dlrates").getAs[Long]("rows_inserted") == 1)
    val after = spark.read.parquet(s"$wh/dwh_dlrates")
    assert(after.filter(col("cur") === "JPY").count() == 1,
      "the dated repair must merge despite the dateless siblings")
    assert(after.filter(col("cur").isin("GBP", "CHF", "DKK")).isEmpty)
    val left = spark.read.parquet(s"$qdir/dwh_dlrates").collect()
    assert(left.length == 3,
      "renamed, null-src_file AND invalid-date rows must all stay parked")
    assert(left.forall(_.getAs[String]("reject_reason") == "dateless_src_file"))
    assert(left.exists(_.getAs[String]("raw_line").contains("CHF")),
      "a NULL src_file row must park as dateless, not vanish at the swap")
    assert(left.exists(_.getAs[String]("raw_line").contains("DKK")),
      "an unparseable 8-digit date must park as dateless, not null-merge or abort")
  }

  test("warehouse inventory reports footprint, watermark, and last run per table") {
    val inbox = Files.createTempDirectory("graft_winbox").toString
    val wh = Files.createTempDirectory("graft_wwh").toString
    val mappings = Seq(
      FileMapping("rates_*.csv", "dwh_rates", "cur", Seq("rate"), scd = 1,
        decimalCols = Seq("rate")))
    mkFile(inbox, "rates_01012024.csv", "cur;rate\nUSD;90,5\nEUR;99,1\n")
    EtlPipeline.run(spark, inbox, wh, mappings, runId = 21)

    val inv = WarehouseOps.inventory(spark, wh).collect()
    assert(inv.map(_.getString(0)).toSeq === Seq("dwh_rates"),
      "meta tables are excluded, data tables listed")
    val r = inv(0)
    assert(r.getAs[Long]("n_files") > 0 && r.getAs[Long]("total_bytes") > 0)
    assert(r.getAs[java.sql.Timestamp]("last_modified") != null)
    assert(r.getAs[String]("watermark") === "2024-01-01")
    assert(r.getAs[Long]("last_run_id") === 21L)
    assert(r.getAs[java.sql.Timestamp]("last_run_dt") != null)
    // empty warehouse: empty frame, same schema, no exception
    val none = WarehouseOps.inventory(spark,
      Files.createTempDirectory("graft_nowh").toString)
    assert(none.isEmpty && none.columns.length === 7)
  }

  test("quarantined rows do not read as deleted-at-source in an scd2 snapshot merge") {
    val inbox = Files.createTempDirectory("graft_qpinbox").toString
    val wh = Files.createTempDirectory("graft_qpwh").toString
    val qdir = Files.createTempDirectory("graft_qpqtn").toString
    val mappings = Seq(
      FileMapping("terms_*.csv", "dwh_terms", "term_id", Seq("fee"), scd = 2,
        decimalCols = Seq("fee")))
    mkFile(inbox, "terms_01012024.csv", "term_id;fee\nT1;1,0\nT2;2,0\nT3;3,0\n")
    EtlPipeline.run(spark, inbox, wh, mappings, runId = 31,
      quarantineDir = Some(qdir))
    // day 2: T2's fee is unparseable (quarantined), T3 is truly absent
    mkFile(inbox, "terms_02012024.csv", "term_id;fee\nT1;1,5\nT2;zz\n")
    val r2 = EtlPipeline.run(spark, inbox, wh, mappings, runId = 32,
      quarantineDir = Some(qdir))
    val cur = spark.read.parquet(s"$wh/dwh_terms")
      .filter(col("effective_to") === "9999-12-31 00:00:00" && !col("deleted_flg"))
    assert(cur.filter(col("term_id") === "T2").count() === 1,
      "a quarantined key was PRESENT in the delivery — it must not tombstone")
    assert(cur.filter(col("term_id") === "T3").isEmpty,
      "a key truly absent from the snapshot still tombstones")
    assert(cur.filter(col("term_id") === "T1" && col("fee") === 1.5).count() === 1)
    assert(logRow(r2, "qtn_dwh_terms").getAs[Long]("rows_inserted") == 1)
  }

  test("replayQuarantine merges fixed rows, keeps still-bad ones, clears when empty") {
    val inbox = Files.createTempDirectory("graft_rpinbox").toString
    val wh = Files.createTempDirectory("graft_rpwh").toString
    val qdir = Files.createTempDirectory("graft_rpqtn").toString
    val m = FileMapping("rates_*.csv", "dwh_rates", "cur", Seq("rate"), scd = 1,
      decimalCols = Seq("rate"))
    mkFile(inbox, "rates_01012024.csv", "cur;rate\nUSD;90,5\nJPY;zz\nGBP;xx\n")
    EtlPipeline.run(spark, inbox, wh, Seq(m), runId = 41,
      quarantineDir = Some(qdir))
    assert(spark.read.parquet(s"$qdir/dwh_rates").count() === 2)

    // operator fixes ONE of the two parked rows in place
    val fixed = spark.read.parquet(s"$qdir/dwh_rates")
      .withColumn("rate",
        when(col("cur") === "JPY", "0,65").otherwise(col("rate")))
    val tmp = Files.createTempDirectory("graft_rpfix").toString
    fixed.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(s"$qdir/dwh_rates")

    val r = EtlPipeline.replayQuarantine(spark, qdir, wh, m, runId = 42)
    val rates = spark.read.parquet(s"$wh/dwh_rates").collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(rates === Map("USD" -> 90.5, "JPY" -> 0.65),
      "the fixed row merges; the still-broken one does not")
    val remaining = spark.read.parquet(s"$qdir/dwh_rates").cache()
    try {
      assert(remaining.count() === 1 &&
        remaining.head().getAs[String]("cur") === "GBP")
      assert(remaining.head().getAs[String]("src_file")
        .contains("rates_01012024.csv"), "original provenance survives replay")
    } finally remaining.unpersist()
    assert(logRow(r, "qrp_dwh_rates").getAs[Long]("rows_inserted") == 1)

    // fix the last row too: quarantine directory disappears entirely
    val fixed2 = spark.read.parquet(s"$qdir/dwh_rates")
      .withColumn("rate", lit("1,15"))
    val tmp2 = Files.createTempDirectory("graft_rpfix2").toString
    fixed2.write.mode("overwrite").parquet(tmp2)
    spark.read.parquet(tmp2).write.mode("overwrite").parquet(s"$qdir/dwh_rates")
    EtlPipeline.replayQuarantine(spark, qdir, wh, m, runId = 43)
    assert(!new java.io.File(s"$qdir/dwh_rates").exists(),
      "an emptied quarantine leaves no directory behind")
    assert(spark.read.parquet(s"$wh/dwh_rates").count() === 3)
  }

  test("replayQuarantine drops rows superseded by a later snapshot instead of clobbering") {
    val inbox = Files.createTempDirectory("graft_stinbox").toString
    val wh = Files.createTempDirectory("graft_stwh").toString
    val qdir = Files.createTempDirectory("graft_stqtn").toString
    val m = FileMapping("rates_*.csv", "dwh_rates", "cur", Seq("rate"), scd = 1,
      decimalCols = Seq("rate"))
    // day 1 quarantines USD; day 2 delivers a NEWER parseable USD
    mkFile(inbox, "rates_01012024.csv", "cur;rate\nUSD;zz\nEUR;99,0\n")
    EtlPipeline.run(spark, inbox, wh, Seq(m), runId = 51,
      quarantineDir = Some(qdir))
    mkFile(inbox, "rates_02012024.csv", "cur;rate\nUSD;92,0\nEUR;99,0\n")
    EtlPipeline.run(spark, inbox, wh, Seq(m), runId = 52,
      quarantineDir = Some(qdir))
    // operator "fixes" the stale day-1 USD row
    val fixed = spark.read.parquet(s"$qdir/dwh_rates")
      .withColumn("rate", lit("90,5"))
    val tmp = Files.createTempDirectory("graft_stfix").toString
    fixed.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(s"$qdir/dwh_rates")
    val r = EtlPipeline.replayQuarantine(spark, qdir, wh, m, runId = 53)
    assert(spark.read.parquet(s"$wh/dwh_rates")
      .filter(col("cur") === "USD").head().getAs[Double]("rate") === 92.0,
      "the day-2 value must survive — a stale replay cannot clobber it")
    val qrp = logRow(r, "qrp_dwh_rates")
    assert(qrp.getAs[Long]("rows_inserted") === 0L &&
      qrp.getAs[Long]("rows_deleted") === 1L,
      "the superseded row is dropped, not merged")
    assert(!new java.io.File(s"$qdir/dwh_rates").exists(),
      "superseded rows leave the quarantine too")
  }

  test("replayQuarantine refuses an interrupted quarantine swap instead of losing it") {
    val qdir = Files.createTempDirectory("graft_crqtn").toString
    val wh = Files.createTempDirectory("graft_crwh").toString
    // simulate the crash window: only the stage directory survives
    Files.createDirectories(Paths.get(s"$qdir/dwh_rates__stage"))
    val m = FileMapping("rates_*.csv", "dwh_rates", "cur", Seq("rate"), scd = 1)
    val e = intercept[IllegalStateException] {
      EtlPipeline.replayQuarantine(spark, qdir, wh, m, runId = 71)
    }
    assert(e.getMessage.contains("interrupted"))
  }

  test("run() refuses to recreate a quarantine over an orphaned replay stage") {
    val inbox = Files.createTempDirectory("graft_orqin").toString
    val wh = Files.createTempDirectory("graft_orqwh").toString
    val qdir = Files.createTempDirectory("graft_orqq").toString
    // interrupted replay: only the stage copy of the rejects survives
    Files.createDirectories(Paths.get(s"$qdir/dwh_rates__stage"))
    mkFile(inbox, "rates_01012024.csv", "cur;rate\nUSD;zz\n")
    val m = FileMapping("rates_*.csv", "dwh_rates", "cur", Seq("rate"), scd = 1,
      decimalCols = Seq("rate"))
    val e = intercept[IllegalStateException] {
      EtlPipeline.run(spark, inbox, wh, Seq(m), runId = 81,
        quarantineDir = Some(qdir))
    }
    assert(e.getMessage.contains("interrupted"),
      "appending would hide the orphaned stage from replay's guard forever")
  }

  test("reserved run-log prefixes are refused as target names") {
    val wh = Files.createTempDirectory("graft_rsv").toString
    intercept[IllegalArgumentException] {
      EtlPipeline.run(spark, wh, wh,
        Seq(FileMapping("x_*.csv", "stream_x", "k", Seq("v"), scd = 1)), runId = 1)
    }
    intercept[IllegalArgumentException] {
      EtlPipeline.replayQuarantine(spark, wh, wh,
        FileMapping("x_*.csv", "qtn_x", "k", Seq("v"), scd = 1), runId = 1)
    }
  }

  test("streaming markers keep micro-batches distinct from batch run ids") {
    val s = spark
    import s.implicits._
    val inDir = Files.createTempDirectory("graft_smk_in").toString
    val wh = Files.createTempDirectory("graft_smk_wh").toString
    // a prior BATCH run logged run_id 0 and 1 for this very table — the
    // streaming dedup must not mistake those for its own batch ids
    Seq((0L, "dwh_feed", 1L, 0L, 0L), (1L, "dwh_feed", 1L, 0L, 0L))
      .toDF("run_id", "table_name", "rows_inserted", "rows_updated", "rows_deleted")
      .withColumn("run_start_dt", current_timestamp())
      .withColumn("run_end_dt", current_timestamp())
      .write.mode("append").parquet(s"$wh/etl_run_log")

    val m = TableMapping("feed", "dwh_feed", "id", Seq("v"), scd = 1)
    def push(rows: Seq[(Long, Double)]): Unit =
      rows.toDF("id", "v").coalesce(1).write.mode("append").parquet(inDir)
    push(Seq((1L, 1.0)))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType)))
    val q = EtlPipeline.streamingMerge(
      spark.readStream.schema(schema).parquet(inDir), wh, m)
    try {
      q.processAllAvailable()                      // batchId 0
      push(Seq((2L, 2.0))); q.processAllAvailable() // batchId 1
      assert(spark.read.parquet(s"$wh/dwh_feed").count() === 2,
        "micro-batches 0 and 1 must merge despite batch log rows with ids 0/1")
      val markers = spark.read.parquet(s"$wh/etl_run_log")
        .filter(col("table_name") === "stream_dwh_feed")
      assert(markers.count() === 2)
    } finally q.stop()
  }

  test("from-database run: incremental pull, key-list deletes, tombstone revival") {
    val s = spark
    import s.implicits._
    val wh = Files.createTempDirectory("graft_whdb").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val nullTs = null.asInstanceOf[java.sql.Timestamp]
    def feed(src: org.apache.spark.sql.DataFrame) = Seq(EtlPipeline.TableFeed(
      TableMapping("clients", "dwh_clients", "client_id", Seq("name"), 2), src))
    def tbl() = spark.read.parquet(s"$wh/dwh_clients")
    val openEnd = lit(Scd.OpenEnd).cast("timestamp")

    // day 1: three clients bootstrap the history
    val src1 = Seq(
      (1L, "Ann", ts("2024-01-01 08:00:00"), nullTs),
      (2L, "Bob", ts("2024-01-01 09:00:00"), nullTs),
      (3L, "Cat", ts("2024-01-01 10:00:00"), nullTs))
      .toDF("client_id", "name", "create_dt", "update_dt")
    val r1 = EtlPipeline.runFromTables(spark, wh, feed(src1), runId = 1,
      deleteTs = "2024-01-02 00:00:00")
    assert(logRow(r1, "stg_dwh_clients").getAs[Long]("rows_inserted") == 3)
    assert(tbl().count() == 3 && tbl().filter(col("deleted_flg")).count() == 0)

    // the inventory treats the ts-watermark store as META and surfaces
    // the database-loop watermark for the table it covers
    val inv = WarehouseOps.inventory(spark, wh).collect()
    assert(inv.map(_.getString(0)).toSeq === Seq("dwh_clients"),
      "etl_watermark_ts must not appear as a data table")
    // derive the expected rendering from the same instant the source
    // carried (UTC-explicit), so the assertion holds on any JVM tz
    val expWm = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC)
      .format(ts("2024-01-01 10:00:00").toInstant)
    assert(inv(0).getAs[String]("watermark") != null &&
      inv(0).getAs[String]("watermark").startsWith(expWm),
      "the timestamp watermark surfaces in the inventory")

    // day 2: Bob renamed (update_dt bumped), Cat gone from the source,
    // Dan new — and Ann untouched, so she is ABSENT from the incremental
    // stg but PRESENT in the key list
    val src2 = Seq(
      (1L, "Ann", ts("2024-01-01 08:00:00"), nullTs),
      (2L, "Bobby", ts("2024-01-01 09:00:00"), ts("2024-01-02 12:00:00")),
      (4L, "Dan", ts("2024-01-02 13:00:00"), nullTs))
      .toDF("client_id", "name", "create_dt", "update_dt")
    val r2 = EtlPipeline.runFromTables(spark, wh, feed(src2), runId = 2,
      deleteTs = "2024-01-03 00:00:00")
    // watermark excludes Ann: only Bob's change and Dan staged
    assert(logRow(r2, "stg_dwh_clients").getAs[Long]("rows_inserted") == 2)
    // NOTE: do not .cache() these reads — the cache is keyed on the
    // logical plan, and a later identical spark.read.parquet(path) would
    // be served the STALE cached files from before the next writeSwap.
    val t2 = tbl()
    // Ann: still ONE open live row — unchanged-since-watermark must NOT tombstone
    assert(t2.filter(col("client_id") === 1).count() == 1)
    assert(t2.filter(col("client_id") === 1 && !col("deleted_flg") &&
      col("effective_to") === openEnd).count() == 1)
    // Bob: closed old version + open renamed one
    assert(t2.filter(col("client_id") === 2).count() == 2)
    assert(t2.filter(col("client_id") === 2 && col("name") === "Bobby" &&
      col("effective_to") === openEnd).count() == 1)
    // Cat: closed + open tombstone at deleteTs
    assert(t2.filter(col("client_id") === 3).count() == 2)
    assert(t2.filter(col("client_id") === 3 && col("deleted_flg") &&
      col("effective_to") === openEnd).count() == 1)
    assert(t2.filter(col("client_id") === 4 && col("effective_to") === openEnd).count() == 1)

    // day 3: Cat returns with IDENTICAL state — the tombstone must close
    // and a live version open (reference INTERSECT includes deleted_flg)
    val src3 = src2.unionByName(Seq(
      (3L, "Cat", ts("2024-01-01 10:00:00"), ts("2024-01-03 09:00:00")))
      .toDF("client_id", "name", "create_dt", "update_dt"))
    EtlPipeline.runFromTables(spark, wh, feed(src3), runId = 3,
      deleteTs = "2024-01-04 00:00:00")
    val t3 = tbl()
    val catOpen = t3.filter(col("client_id") === 3 && col("effective_to") === openEnd)
    assert(catOpen.count() == 1)
    assert(!catOpen.collect()(0).getAs[Boolean]("deleted_flg"), "revived Cat must be live")
    assert(t3.filter(col("client_id") === 3).count() == 3) // closed, closed tombstone, open
    val t3Count = t3.count() // materialize BEFORE run 4 swaps the files

    // day 4: identical source — watermark stages nothing, table unchanged
    val r4 = EtlPipeline.runFromTables(spark, wh, feed(src3), runId = 4,
      deleteTs = "2024-01-05 00:00:00")
    assert(logRow(r4, "stg_dwh_clients").getAs[Long]("rows_inserted") == 0)
    assert(tbl().count() == t3Count)
  }

  test("from-database scd1 feed upserts incrementally without touching absent keys") {
    val s = spark
    import s.implicits._
    val wh = Files.createTempDirectory("graft_whdb1").toString
    def ts(x: String) = java.sql.Timestamp.valueOf(x)
    val nullTs = null.asInstanceOf[java.sql.Timestamp]
    def feed(src: org.apache.spark.sql.DataFrame) = Seq(EtlPipeline.TableFeed(
      EtlPipeline.TableMapping("rates", "dwh_db_rates", "cur", Seq("rate"), 1), src))
    val src1 = Seq(("USD", 90.5, ts("2024-01-01 08:00:00"), nullTs),
                   ("EUR", 99.1, ts("2024-01-01 08:00:00"), nullTs))
      .toDF("cur", "rate", "create_dt", "update_dt")
    EtlPipeline.runFromTables(spark, wh, feed(src1), 1, "2024-01-02 00:00:00")
    // only USD changes past the watermark; EUR is absent from the
    // incremental stg and must survive untouched (scd1 never deletes)
    val src2 = Seq(("USD", 92.0, ts("2024-01-01 08:00:00"), ts("2024-01-02 09:00:00")),
                   ("EUR", 99.1, ts("2024-01-01 08:00:00"), nullTs))
      .toDF("cur", "rate", "create_dt", "update_dt")
    val r2 = EtlPipeline.runFromTables(spark, wh, feed(src2), 2, "2024-01-03 00:00:00")
    assert(logRow(r2, "stg_dwh_db_rates").getAs[Long]("rows_inserted") == 1)
    val t = spark.read.parquet(s"$wh/dwh_db_rates").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(t == Map("USD" -> 92.0, "EUR" -> 99.1))
  }

  test("streaming merge upserts each micro-batch into the warehouse") {
    val s = spark
    import s.implicits._
    val inDir = Files.createTempDirectory("graft_sm_in").toString
    val wh = Files.createTempDirectory("graft_sm_wh").toString
    val m = TableMapping("stream", "dwh_stream_cust", "id", Seq("bal"), scd = 1)
    def push(rows: Seq[(Long, Double)]): Unit =
      rows.toDF("id", "bal").coalesce(1).write.mode("append").parquet(inDir)
    push(Seq((1L, 10.0), (2L, 20.0)))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("bal", org.apache.spark.sql.types.DoubleType)))
    val q = EtlPipeline.streamingMerge(
      spark.readStream.schema(schema).parquet(inDir), wh, m)
    try {
      q.processAllAvailable()
      val t1 = spark.read.parquet(s"$wh/dwh_stream_cust").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(t1 == Map(1L -> 10.0, 2L -> 20.0))
      // batch 2: update user 2, insert user 3
      push(Seq((2L, 25.0), (3L, 30.0)))
      q.processAllAvailable()
      val t2 = spark.read.parquet(s"$wh/dwh_stream_cust").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(t2 == Map(1L -> 10.0, 2L -> 25.0, 3L -> 30.0))
      // per-micro-batch run log accumulated
      assert(spark.read.parquet(s"$wh/etl_run_log").count() >= 2)
    } finally q.stop()
  }

  test("accumulating mart equals the full rebuild across two runs") {
    val inbox = Files.createTempDirectory("graft_mart_inbox").toString
    val wh = Files.createTempDirectory("graft_mart_wh").toString
    val cutoff = "2024-01-20 00:00:00"
    val marts = Map[String, EtlPipeline.MartRefresh](
      "mart_fraud" -> EtlPipeline.MartAccumulate(
        (s, d) => graft.pipeline.FraudMart.report(s, d),
        (s, d, since) => graft.pipeline.FraudMart.incrementalReport(s, d, since),
        watermarkCol = "event_dt"))
    // warehouse facts arrive in two time slices of the same stream
    Tables.customer(spark, sf).write.parquet(s"$wh/customer.parquet")
    Tables.events(spark, sf).filter(col("ts") <= lit(cutoff).cast("timestamp"))
      .write.parquet(s"$wh/events.parquet")
    EtlPipeline.run(spark, inbox, wh, Seq.empty, runId = 1, marts = marts)
    val afterRun1 = spark.read.parquet(s"$wh/mart_fraud").count()
    assert(afterRun1 > 0, "bootstrap build must flag events in the first slice")

    // second slice lands: the refresh must APPEND only the new rows
    Tables.events(spark, sf).write.mode("overwrite").parquet(s"$wh/events.parquet")
    EtlPipeline.run(spark, inbox, wh, Seq.empty, runId = 2, marts = marts)
    val accumulated = spark.read.parquet(s"$wh/mart_fraud")
    assert(accumulated.count() > afterRun1, "second run must append new flags")
    val full = graft.pipeline.FraudMart.report(spark, wh)
    assert(accumulated.exceptAll(full).count() == 0,
      "accumulated mart contains rows the full rebuild does not")
    assert(full.exceptAll(accumulated).count() == 0,
      "accumulated mart is missing rows of the full rebuild")

    // statement-level idempotence: an immediate re-refresh appends nothing
    EtlPipeline.run(spark, inbox, wh, Seq.empty, runId = 3, marts = marts)
    assert(spark.read.parquet(s"$wh/mart_fraud").count() == accumulated.count())
  }

  test("nextRunId allocates monotone ids and runs log start/end timestamps") {
    val s = spark
    import s.implicits._
    val wh = Files.createTempDirectory("graft_runid").toString
    def ts(x: String) = java.sql.Timestamp.valueOf(x)
    val nullTs = null.asInstanceOf[java.sql.Timestamp]
    def feed(src: org.apache.spark.sql.DataFrame) = Seq(EtlPipeline.TableFeed(
      TableMapping("rates", "dwh_seq_rates", "cur", Seq("rate"), 1), src))
    assert(EtlPipeline.nextRunId(spark, wh) == 1L, "fresh warehouse starts at 1")
    val src1 = Seq(("USD", 90.5, ts("2024-01-01 08:00:00"), nullTs))
      .toDF("cur", "rate", "create_dt", "update_dt")
    val r1 = EtlPipeline.runFromTables(spark, wh, feed(src1),
      EtlPipeline.nextRunId(spark, wh), "2024-01-02 00:00:00")
    assert(r1.runId == 1L)
    assert(EtlPipeline.nextRunId(spark, wh) == 2L, "allocator follows the log")
    val src2 = Seq(("USD", 92.0, ts("2024-01-01 08:00:00"), ts("2024-01-02 09:00:00")))
      .toDF("cur", "rate", "create_dt", "update_dt")
    val r2 = EtlPipeline.runFromTables(spark, wh, feed(src2),
      EtlPipeline.nextRunId(spark, wh), "2024-01-03 00:00:00")
    assert(r2.runId == 2L)
    assert(EtlPipeline.nextRunId(spark, wh) == 3L)
    val log = spark.read.parquet(s"$wh/etl_run_log")
    assert(log.select("run_id").distinct().count() == 2)
    assert(log.filter(col("run_start_dt").isNull || col("run_end_dt").isNull).count() == 0)
    assert(log.filter(col("run_end_dt") < col("run_start_dt")).count() == 0)
  }

  test("scd1 pipeline merge produces a consistent run log") {
    val dwh = Tables.customer(spark, sf).filter(col("c_custkey") < 100)
      .select(col("c_custkey").as("id"), col("c_acctbal").as("bal"))
    val stg = Tables.customer(spark, sf).filter(col("c_custkey") < 120)
      .select(col("c_custkey").as("id"), (col("c_acctbal") + 10).as("bal"))
    val res = EtlPipeline.mergeTable(7, TableMapping("stg_cust", "dwh_cust", "id", Seq("bal"), 1),
      stg, dwh, "2024-02-01 00:00:00")
    val log = res.log.collect()(0)
    assert(log.getAs[Long]("run_id") == 7L)
    assert(log.getAs[Long]("rows_inserted") == 20)   // keys 100..119
    assert(log.getAs[Long]("rows_updated") == 100)   // all overlapping bals shifted
  }

  test("scd2 pipeline merge logs tombstones as deletions") {
    val ev = Tables.events(spark, sf)
    val hist = Scd.buildHistory(ev.filter(col("user_id") < 10), "user_id", "ts",
      "event_id", Seq("event_type")).withColumnRenamed("event_type", "state")
    val stg = ev.filter(col("user_id") < 5)  // users 5..9 disappear
      .groupBy("user_id").agg(max(col("ts")).as("create_dt"))
      .withColumn("state", lit("inactive"))
    val res = EtlPipeline.mergeTable(8, TableMapping("stg_u", "dwh_u", "user_id", Seq("state"), 2),
      stg, hist, "2024-02-01 00:00:00")
    val log = res.log.collect()(0)
    assert(log.getAs[Long]("rows_deleted") == 5)
    assert(res.merged.filter(col("deleted_flg")).count() == 5)
  }
}
