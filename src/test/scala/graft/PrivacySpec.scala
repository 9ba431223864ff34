package graft

import org.apache.spark.sql.functions._

import graft.queries.{PipelineQueries, PrivacyQueries}

class PrivacySpec extends SparkSpec {

  test("kAnonymize: every surviving QI group has >= k members, small groups suppress") {
    val s = spark
    import s.implicits._
    // groups of 12, 3, 2 over (g, seg): base suppression = 3 + 2 = 5 = k,
    // so the "*" bucket is already k-sized and 'a' survives untouched
    val rows = Seq.fill(12)(("a", "X")) ++ Seq.fill(3)(("b", "X")) ++
      Seq.fill(2)(("c", "Y"))
    val df = rows.zipWithIndex.map { case ((g, seg), i) => (i.toLong, g, seg) }
      .toDF("id", "g", "seg")
    val out = PrivacyQueries.kAnonymize(df, Seq("g", "seg"), 5).cache()
    try {
      assert(out.count() === 17, "row count preserved")
      val kept = out.filter(col("g_qi") =!= "*")
      assert(kept.groupBy("g_qi", "seg_qi").count().filter(col("count") < 5).isEmpty,
        "no surviving QI group smaller than k")
      assert(kept.select("g_qi").distinct().collect().map(_.getString(0)).toSet === Set("a"))
      // suppression collapses BOTH QI columns together
      assert(out.filter(col("g_qi") === "*" && col("seg_qi") =!= "*").isEmpty)
      assert(out.filter(col("g_qi") === "*").count() === 5)
    } finally out.unpersist()
  }

  test("kAnonymize: null QI values form a class and are never dropped") {
    val s = spark
    import s.implicits._
    // 6 rows with a NULL nation + 12 with 'a': null class >= k survives
    // as its own (string "null" never appears — suppression or the
    // null itself render it); plain equi-join semantics would LOSE the
    // null rows entirely
    val rows = Seq.fill(6)((Option.empty[String], "X")) ++
      Seq.fill(12)((Option("a"), "X"))
    val df = rows.zipWithIndex.map { case ((g, seg), i) => (i.toLong, g, seg) }
      .toDF("id", "g", "seg")
    val out = PrivacyQueries.kAnonymize(df, Seq("g", "seg"), 5).cache()
    try {
      assert(out.count() === 18, "null-QI rows must not vanish from the extract")
      assert(out.groupBy("g_qi", "seg_qi").count().filter(col("count") < 5).isEmpty)
      assert(out.filter(col("g").isNull).count() === 6)
    } finally out.unpersist()
  }

  test("kAnonymize: an undersized '*' bucket tops up from the smallest survivors") {
    val s = spark
    import s.implicits._
    // base suppression = {c:1}, 1 < k=5 → the smallest survivor (b:4)
    // must also collapse, making the bucket 5; 'a' (12) survives
    val rows = Seq.fill(12)(("a", "X")) ++ Seq.fill(4)(("b", "X")) ++ Seq(("c", "Y"))
    val df = rows.zipWithIndex.map { case ((g, seg), i) => (i.toLong, g, seg) }
      .toDF("id", "g", "seg")
    val out = PrivacyQueries.kAnonymize(df, Seq("g", "seg"), 5).cache()
    try {
      assert(out.filter(col("g_qi") === "*").count() === 5,
        "bucket must reach k by absorbing the smallest surviving class")
      assert(out.filter(col("g_qi") === "a").count() === 12)
      // EVERY output class — '*' included — now has >= k members
      assert(out.groupBy("g_qi", "seg_qi").count().filter(col("count") < 5).isEmpty)
    } finally out.unpersist()
  }

  test("q105: pseudonyms unique, original identifiers absent, k honored at sf0.01") {
    val out = PrivacyQueries.q105(spark, "/root/testdata/sf0.01").cache()
    try {
      val n = out.count()
      assert(n === 1500)
      assert(out.select("pseudo_id").distinct().count() === n,
        "deterministic pseudonym is collision-free on this corpus")
      assert(!out.columns.exists(Set("c_name", "c_custkey")),
        "direct identifiers do not leave the extract")
      val kept = out.filter(col("nation_qi") =!= "*")
      assert(kept.count() > 0, "sf0.01 must exercise the non-suppressed path")
      assert(kept.groupBy("nation_qi", "segment_qi").count()
        .filter(col("count") < 10).isEmpty, "k-anonymity holds in the output")
    } finally out.unpersist()
  }

  test("q106 epoch shuffle: exact partition, dense positions, balanced shards") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val out = PipelineQueries.q106(spark, sf).cache()
    try {
      assert(out.count() === docs.count(), "every doc sharded exactly once")
      assert(out.select("doc_id").distinct().count() === docs.count())
      // dense 1..size positions per shard
      val bad = out.groupBy("shard")
        .agg(count(lit(1)).as("n"), max("pos").as("mx"), countDistinct("pos").as("nd"))
        .filter(col("mx") =!= col("n") || col("nd") =!= col("n"))
      assert(bad.isEmpty)
      // odd multiplier is a bijection mod 16: contiguous ids spread evenly
      val sizes = out.groupBy("shard").count().collect().map(_.getLong(1))
      assert(sizes.length === 16 && sizes.max - sizes.min <= 1)
    } finally out.unpersist()
  }

  test("epochShuffle: changing epoch permutes order but not membership") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val e0 = PipelineQueries.epochShuffle(docs, "doc_id", 16, 0L)
    val e1 = PipelineQueries.epochShuffle(docs, "doc_id", 16, 1L)
    val joined = e0.as("a").join(e1.as("b"), "doc_id")
      .select(col("a.shard").as("s0"), col("a.pos").as("p0"),
        col("b.shard").as("s1"), col("b.pos").as("p1")).cache()
    try {
      assert(joined.count() === docs.count(), "same membership across epochs")
      assert(joined.filter(col("s0") =!= col("s1") || col("p0") =!= col("p1")).count() > 0,
        "a new epoch reassigns at least some rows")
    } finally joined.unpersist()
  }

  test("forgetKey: surgical index-pruned delete, untouched files stay byte-identical") {
    import graft.operators.FileBloomIndex
    import graft.pipeline.WarehouseOps
    val dir = java.nio.file.Files.createTempDirectory("graft_forget").toString
    val ev = graft.sources.Tables.events(spark, sf)
    // cluster by user so the victim lives in few files — the layout
    // the surgical rewrite exploits
    ev.repartitionByRange(8, col("user_id")).write.parquet(s"$dir/events")
    FileBloomIndex.bloomIndex(spark, s"$dir/events", "user_id", 10000L)
      .write.parquet(s"$dir/idx")
    val idx = spark.read.parquet(s"$dir/idx")
    val victim = ev.select("user_id").orderBy("user_id").head().getLong(0)
    val before = spark.read.parquet(s"$dir/events")
    val victimRows = before.filter(col("user_id") === victim).count()
    assert(victimRows > 0)
    val others = before.filter(col("user_id") =!= victim)
      .select("event_id").collect().map(_.getLong(0)).sorted
    val someUser = before.filter(col("user_id") =!= victim)
      .select("user_id").orderBy("user_id").head().getLong(0)
    val fileStats = new org.apache.hadoop.fs.Path(s"$dir/events")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val preMods = fileStats.listStatus(new org.apache.hadoop.fs.Path(s"$dir/events"))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(s => s.getPath.getName -> s.getModificationTime).toMap

    val res = WarehouseOps.forgetKey(spark, s"$dir/events", idx,
      "user_id", victim, expectedItemsPerFile = 10000L)
    assert(res.rowsRemoved === victimRows)
    assert(res.filesRewritten >= 1 && res.filesRewritten <= res.filesExamined)
    assert(res.filesExamined < preMods.size.toLong,
      "a range-clustered victim must not shortlist every file")
    val after = spark.read.parquet(s"$dir/events")
    assert(after.filter(col("user_id") === victim).isEmpty, "key fully forgotten")
    assert(after.select("event_id").collect().map(_.getLong(0)).sorted
      .sameElements(others), "every other row survives exactly once")
    // files the bloom never shortlisted were not touched at all
    val postMods = fileStats.listStatus(new org.apache.hadoop.fs.Path(s"$dir/events"))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(s => s.getPath.getName -> s.getModificationTime).toMap
    val untouched = preMods.keySet.intersect(postMods.keySet)
    assert(untouched.nonEmpty)
    untouched.foreach(f => assert(postMods(f) === preMods(f), s"file $f rewritten"))
    // the refreshed index serves exact point reads on the new layout
    res.index.write.mode("overwrite").parquet(s"$dir/idx2")
    val idx2 = spark.read.parquet(s"$dir/idx2")
    val pruned = FileBloomIndex.prunedPointRead(
      spark, s"$dir/events", idx2, "user_id", someUser)
    assert(pruned.count() === after.filter(col("user_id") === someUser).count())
    // re-running the forget is a no-op on an already-clean directory
    val res2 = WarehouseOps.forgetKey(spark, s"$dir/events", idx2,
      "user_id", victim, expectedItemsPerFile = 10000L)
    assert(res2.rowsRemoved === 0L)
    assert(spark.read.parquet(s"$dir/events").count() === others.length.toLong)
  }

  test("forgetKey: scattered key batches into O(1) jobs; unindexed files covered") {
    import graft.operators.FileBloomIndex
    import graft.pipeline.WarehouseOps
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_forget_batch").toString
    // hash-scatter the victim across MANY files — the worst layout,
    // where a per-file rewrite loop degrades to ~2 serial jobs per file
    val nFiles = 40
    (0L until 2000L).map(i => (i, i % 20L, s"p$i"))
      .toDF("event_id", "user_id", "payload")
      .repartition(nFiles, col("event_id"))
      .write.parquet(s"$dir/t")
    FileBloomIndex.bloomIndex(spark, s"$dir/t", "user_id", 1000L)
      .write.parquet(s"$dir/idx")
    // late ingest AFTER the index build: a file the stored index never
    // saw — the silent-under-deletion hole the coverage refresh closes
    Seq((9001L, 7L, "late_victim"), (9002L, 8L, "late_other"))
      .toDF("event_id", "user_id", "payload")
      .coalesce(1).write.mode("append").parquet(s"$dir/t")
    val idx = spark.read.parquet(s"$dir/idx")
    val before = spark.read.parquet(s"$dir/t")
    val victimRows = before.filter(col("user_id") === 7L).count()
    assert(victimRows === 101L, "100 scattered rows + the late-ingest one")
    val survivors = before.filter(col("user_id") =!= 7L)
      .select("event_id").collect().map(_.getLong(0)).sorted

    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val res = try {
      val r = WarehouseOps.forgetKey(spark, s"$dir/t", idx, "user_id", 7L,
        expectedItemsPerFile = 1000L)
      org.apache.spark.graftbridge.TestListenerBridge
        .waitUntilListenerBusEmpty(spark.sparkContext)
      r
    } finally spark.sparkContext.removeSparkListener(listener)

    assert(res.rowsRemoved === victimRows,
      "the unindexed late file's victim row must be removed too")
    assert(res.filesRewritten >= 30L, "a scattered key hits most files")
    val after = spark.read.parquet(s"$dir/t")
    assert(after.filter(col("user_id") === 7L).isEmpty, "key fully forgotten")
    assert(after.select("event_id").collect().map(_.getLong(0)).sorted
      .sameElements(survivors), "every other row survives exactly once")
    assert(after.filter(col("event_id") === 9002L).count() === 1L,
      "the late file's non-victim row survives its rewrite")
    // the whole pass is a CONSTANT number of jobs (schema reads, the
    // census, the batched rewrite, two index refresh collects, plus
    // AQE's per-stage sub-jobs) — the per-file loop cost >= 2 jobs per
    // hit file (here >= 80); batched it is bounded regardless of
    // candidate count, the candidates only ever widen TASKS inside jobs
    assert(jobs.get() <= 26,
      s"forgetKey ran ${jobs.get()} jobs for ${res.filesRewritten} rewrites — " +
        "the rewrite loop has degenerated to per-file jobs")
    assert(jobs.get() < res.filesRewritten,
      "job count must not scale with the number of rewritten files")
  }
}
