package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.CorpusQueries

class CorpusSpec extends SparkSpec {

  // Never cache a raw Tables.* frame here: the shared CacheManager
  // substitutes it into every later plan over the same scan, breaking
  // other suites' pushdown assertions (SourcesSpec reads PushedFilters
  // from the documents scan). Query outputs are safe to cache but are
  // released per test.
  private def withCached[A](dfs: DataFrame*)(body: => A): A =
    try { dfs.foreach(_.cache()); body }
    finally dfs.foreach(_.unpersist(blocking = false))

  test("q108 quantization: int8 codes, every vector kept, reconstruction bounded") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val out = CorpusQueries.q108(spark, sf)
    withCached(out) {
      assert(out.count() === emb.count(), "one summary row per vector")
      // codes must fit int8: floor puts y=127·x/scale in [-128, 127]
      assert(out.filter(col("min_q") < -128 || col("max_q") > 127).isEmpty)
      assert(out.filter(col("scale") < 0).isEmpty)
    }
    // elementwise reconstruction bound |x − code·scale/127| ≤ scale/127
    val bad = emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("scale", array_max(transform(col("v"), x => abs(x))))
      .filter(col("scale") > 0)
      .withColumn("viol", org.apache.spark.sql.functions.exists(
        transform(col("v"), x =>
          abs(x - floor(lit(127.0) * x / col("scale")) * col("scale") / 127.0) >
            col("scale") / 127.0 + lit(1e-12)),
        b => b))
      .filter(col("viol"))
    assert(bad.isEmpty, "quantization error must stay within one code step")
  }

  test("q94 chunking: strided cover of every tokenized document") {
    val out = CorpusQueries.q94(spark, sf)
    withCached(out) {
      val docs = graft.sources.Tables.documents(spark, sf)
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"),
          graft.functions.TextFunctions.tokenCount(col("text")).as("n"))
      // chunk token totals reconstruct the stride arithmetic exactly:
      // full chunks cover [start, start+32); the last chunks shrink
      val agg = out.groupBy("doc_id").agg(
        count(lit(1)).as("n_chunks"),
        max("chunk_idx").as("max_idx"),
        min("chunk_idx").as("min_idx"),
        max("n_tokens").as("max_len"))
      val j = agg.join(docs, "doc_id")
      assert(j.filter(col("n_chunks") =!= expr("(n - 1) DIV 16 + 1")).isEmpty,
        "chunk count must be ceil(n/stride) for stride 16")
      assert(j.filter(col("min_idx") =!= 0).isEmpty)
      assert(j.filter(col("max_idx") =!= col("n_chunks") - 1).isEmpty)
      assert(j.filter(col("max_len") > 32).isEmpty, "no chunk exceeds the window")
      assert(out.filter(col("n_tokens") < 1).isEmpty, "no empty chunks")
      // overlap: chunk i's tokens 17..32 == chunk i+1's tokens 1..16 —
      // reconstructing each doc from stride-aligned prefixes gives the text
      val rebuilt = out
        .select(col("doc_id"), col("chunk_idx"),
          when(col("chunk_idx") === 0, col("chunk_text"))
            .otherwise(concat_ws(" ",
              slice(split(col("chunk_text"), " "), 17, 16))).as("piece"))
      // doc 0's chunk pieces concatenated = the trimmed original text
      val d0 = rebuilt.filter(col("doc_id") === 0).orderBy("chunk_idx")
        .collect().map(_.getString(2)).filter(_.nonEmpty).mkString(" ")
      val t0 = spark.read.parquet(s"$sf/documents.parquet")
        .filter(col("doc_id") === 0).head().getAs[String]("text").trim
        .replaceAll("\\s+", " ")
      assert(d0 === t0, "stride-aligned pieces must reassemble the document")
    }
  }

  test("q94 edge shapes: boundary token counts chunk exactly like the reference model") {
    // adversarial shapes around the window (32) and stride (16)
    // boundaries, plus degenerate texts the corpus never exercises
    val shapes = Seq(1, 15, 16, 17, 31, 32, 33, 48, 49, 64, 65)
    val docs =
      shapes.zipWithIndex.map { case (n, i) =>
        (i.toLong, (1 to n).map(t => s"t$t").mkString(" "), "en", "edge", n.toLong)
      } ++ Seq(
        (100L, "", "en", "edge", 0L),          // empty
        (101L, "   \t  ", "en", "edge", 6L),   // whitespace-only
        (102L, "  lone  ", "en", "edge", 8L))  // untrimmed single token
    val dir = java.nio.file.Files.createTempDirectory("graft_edge").toString
    val s = spark
    import s.implicits._
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val out = CorpusQueries.q94(spark, dir)
      .collect().groupBy(_.getLong(0))
    // empty / whitespace-only docs produce no chunks at all
    assert(!out.contains(100L) && !out.contains(101L))
    // the untrimmed single token chunks to exactly itself
    val lone = out(102L)
    assert(lone.length == 1 && lone.head.getString(3) == "lone")
    // driver-side reference model: chunks are toks.drop(16*i).take(32)
    shapes.zipWithIndex.foreach { case (n, i) =>
      val toks = (1 to n).map(t => s"t$t")
      val expected = (0 until n by 16).map(s => toks.slice(s, s + 32))
      val got = out(i.toLong).sortBy(_.getInt(1))
      assert(got.length == expected.length, s"n=$n chunk count")
      got.zip(expected).foreach { case (row, exp) =>
        assert(row.getLong(2) == exp.length, s"n=$n chunk ${row.getInt(1)} length")
        assert(row.getString(3) == exp.mkString(" "), s"n=$n chunk ${row.getInt(1)} text")
      }
    }
  }

  test("q95 canonical docs: cluster members map to one longest representative") {
    val out = CorpusQueries.q95(spark, sf)
    withCached(out) {
      val docs = graft.sources.Tables.documents(spark, sf)
      assert(out.count() === docs.count(), "one verdict per document")
      // canonical ids are themselves kept
      val canon = out.select(col("canonical_id").as("doc_id")).distinct()
      val keptIds = out.filter(col("is_kept") === 1)
        .select("doc_id")
      assert(canon.exceptAll(keptIds).isEmpty, "every canonical doc is kept")
      // a dropped doc's canonical is a different doc with >= its length
      val n = docs.select(col("doc_id"), col("n_chars"))
      val dropped = out.filter(col("is_kept") === 0)
        .join(n.withColumnRenamed("n_chars", "own"), "doc_id")
        .join(n.select(col("doc_id").as("canonical_id"),
          col("n_chars").as("rep")), "canonical_id")
      assert(dropped.filter(col("rep") < col("own")).isEmpty,
        "representative is never shorter than the doc it replaces")
      assert(out.filter(col("is_kept") === 0).count() > 0,
        "the near-dup corpus must produce at least one drop")
    }
  }

  test("q96 vocab/OOV: rates bounded, vocab covers the head of the distribution") {
    val out = CorpusQueries.q96(spark, sf)
    withCached(out) {
      assert(out.filter(col("oov_ppm") < 0 || col("oov_ppm") > 1000000).isEmpty)
      assert(out.filter(col("n_oov") > col("n_tokens")).isEmpty)
      // with a 12-token vocab over a ~31-token vocabulary corpus, both
      // in-vocab and OOV mass must be present
      assert(out.filter(col("n_oov") > 0).count() > 0, "some OOV expected")
      assert(out.filter(col("n_oov") < col("n_tokens")).count() > 0,
        "some in-vocab tokens expected")
      // token conservation vs the independent token counter
      val total = out.agg(sum("n_tokens")).head().getLong(0)
      val expected = graft.sources.Tables.documents(spark, sf)
        .agg(sum(graft.functions.TextFunctions.tokenCount(col("text"))))
        .head().getLong(0)
      assert(total === expected, "every token is classified exactly once")
    }
  }

  test("q97 robust scaling: median maps to 0, IQR to unit interval") {
    val out = CorpusQueries.q97(spark, sf)
    withCached(out) {
      val ev = graft.sources.Tables.events(spark, sf)
      assert(out.count() === ev.count(), "all events scaled (IQR > 0 per type)")
      // per type: the median-valued event lands at |z| ~ 0 and quartile
      // events at ~ +-0.5 (micro fixed-point; quarter-cent stat snap)
      val med = out.groupBy("event_type")
        .agg(expr("percentile(robust_z_micro / 1e6, 0.5)").as("m"),
          expr("percentile(robust_z_micro / 1e6, 0.75) - percentile(robust_z_micro / 1e6, 0.25)").as("spread"))
      assert(med.filter(abs(col("m")) > 0.01).isEmpty,
        "scaled median must be ~0 per type")
      assert(med.filter(abs(col("spread") - 1.0) > 0.01).isEmpty,
        "scaled IQR must be ~1 per type")
    }
  }

  test("q98 sliding distinct: distinct <= events, windows nest the tumbling view") {
    val out = CorpusQueries.q98(spark, sf)
    withCached(out) {
      assert(out.filter(col("n_users") > col("n_events") ||
        col("n_users") < 1).isEmpty)
      // each event lands in exactly 4 windows
      val ev = graft.sources.Tables.events(spark, sf)
      assert(out.agg(sum("n_events")).head().getLong(0) === 4L * ev.count())
      // a window's distinct count >= any contained 15-min tumbling bucket's
      val tumble = ev.groupBy(window(col("ts"), "15 minutes").as("w"))
        .agg(countDistinct("user_id").as("tn"))
        .select(col("w.start").as("ts15"), col("tn"))
      val covered = out.join(tumble,
        col("ts15") >= col("window_start") &&
          col("ts15") < col("window_start") + expr("INTERVAL 1 HOUR"))
      assert(covered.filter(col("tn") > col("n_users")).isEmpty,
        "sliding window distinct dominates its tumbling sub-buckets")
    }
  }

  test("q99 dataset card: totals reconcile with the corpus") {
    val out = CorpusQueries.q99(spark, sf)
    withCached(out) {
      val docs = graft.sources.Tables.documents(spark, sf)
      assert(out.agg(sum("n_docs")).head().getLong(0) === docs.count())
      val chars = docs.agg(sum(length(col("text")).cast("long"))).head().getLong(0)
      assert(out.agg(sum("n_chars_total")).head().getLong(0) === chars)
      assert(out.filter(col("n_dup_docs") > col("n_docs") ||
        col("n_quality") > col("n_docs")).isEmpty)
      // quality gate total matches q29's filter cardinality
      val q29n = graft.queries.TextQueries.q29(spark, sf).count()
      assert(out.agg(sum("n_quality")).head().getLong(0) === q29n)
    }
  }

  test("q100 heavy hitters equal the brute-force GROUP BY / HAVING") {
    val out = CorpusQueries.q100(spark, sf)
    withCached(out) {
      val toks = graft.sources.Tables.documents(spark, sf)
        .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
        .filter(length(col("tok")) > 0).cache()
      val n = toks.count()
      val threshold = math.max(1L, math.floor(0.03125 * n).toLong)
      val brute = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= threshold)
      assert(out.count() > 0, "threshold must keep some heavy hitters")
      assert(out.exceptAll(brute).isEmpty && brute.exceptAll(out).isEmpty)
      toks.unpersist(blocking = false)
    }
  }

  test("Misra-Gries summary is a superset of true heavy hitters even when width < distinct") {
    val s = spark
    import s.implicits._
    // 100 distinct keys forces the decrement/merge-trim paths at width 9;
    // keys 0 and 1 are heavy (>n/10 each), the rest are background noise
    val rows = (0 until 400).map(i => s"hot${i % 2}") ++
      (0 until 600).map(i => s"cold${i % 98}")
    val df = rows.toDF("tok").repartition(8) // multi-partition → real merges
    val summary = df.as[String]
      .select(new graft.operators.HeavyHitters.MisraGries(9).toColumn).head()
    assert(summary.n === 1000)
    assert(summary.counts.size <= 9, "summary must stay width-bounded")
    // every key with true count > n/(width+1) = 100 must be present
    assert(summary.counts.contains("hot0") && summary.counts.contains("hot1"))
    // stored counts are lower bounds within n/(width+1)
    summary.counts.get("hot0").foreach(c => assert(c <= 200 && c >= 200 - 100))
    // and the exact() recount is identical to brute force at a share
    // where the guarantee holds (share > 1/(width+1))
    val out = graft.operators.HeavyHitters.exact(df, share = 0.15, width = 9)
    val brute = df.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 150)
    assert(out.exceptAll(brute).isEmpty && brute.exceptAll(out).isEmpty)
  }

  test("q101 sketch overlap equals exact set algebra below capacity") {
    val out = CorpusQueries.q101(spark, sf)
    withCached(out) {
      val t = graft.sources.Tables.documents(spark, sf)
        .select(col("source"), explode(split(trim(col("text")), "\\s+")).as("tok"))
        .filter(length(col("tok")) > 0)
        .select("source", "tok").distinct().cache()
      val a = t.withColumnRenamed("source", "source_a")
      val b = t.withColumnRenamed("source", "source_b")
      val exactOverlap = a.join(b, Seq("tok"))
        .filter(col("source_a") < col("source_b"))
        .groupBy("source_a", "source_b").agg(count(lit(1)).as("x_overlap"))
      val joined = out.join(exactOverlap, Seq("source_a", "source_b"), "left")
        .withColumn("x_overlap", coalesce(col("x_overlap"), lit(0L)))
      assert(out.count() > 0)
      assert(joined.filter(col("n_overlap") =!= col("x_overlap")).isEmpty,
        "sketch overlap must be exact below capacity")
      val sizes = t.groupBy("source").agg(count(lit(1)).as("x_n"))
      val badN = out.join(sizes, col("source_a") === col("source"))
        .filter(col("n_a") =!= col("x_n"))
      assert(badN.isEmpty, "per-source distinct counts must be exact below capacity")
      t.unpersist(blocking = false)
    }
  }

  test("q103 length batches: full batches, bounded length classes, exact waste") {
    val out = CorpusQueries.q103(spark, sf).cache()
    try {
      val docs = graft.sources.Tables.documents(spark, sf)
      // every document lands in exactly one batch
      assert(out.agg(sum("n_seqs")).head().getLong(0) === docs.count())
      // batches never exceed the target size; within each (bucket, shard)
      // only the LAST batch may be partial
      assert(out.filter(col("n_seqs") > 8 || col("n_seqs") < 1).isEmpty)
      val lastIds = out.groupBy("len_bucket", "shard")
        .agg(max("batch_id").as("last_id"))
      val partialNotLast = out.join(lastIds, Seq("len_bucket", "shard"))
        .filter(col("n_seqs") < 8 && col("batch_id") =!= col("last_id"))
      assert(partialNotLast.isEmpty, "only the trailing batch may be partial")
      // lengths stay inside their class: max_len in [64b, 64b+63], and
      // padding waste is bounded by the class width
      assert(out.filter(col("max_len") < col("len_bucket") * 64 ||
        col("max_len") >= (col("len_bucket") + 1) * 64).isEmpty)
      assert(out.filter(col("pad_waste") < 0 ||
        col("pad_waste") > (col("n_seqs") - 1) * 63).isEmpty,
        "per-batch waste is bounded by (n-1) * (class width - 1)")
    } finally out.unpersist()
  }

  test("heavy-hitters guard refuses a share below the sketch guarantee") {
    val s = spark
    import s.implicits._
    val df = Seq("a", "b").toDF("tok")
    intercept[IllegalArgumentException] {
      graft.operators.HeavyHitters.exact(df, share = 0.01, width = 9)
    }
  }

  test("heavy-hitters guard catches the integer-threshold boundary too") {
    val s = spark
    import s.implicits._
    // share=0.51 passes the real-valued guard (0.51 > 1/2) but
    // floor(0.51·4)=2 lands exactly ON n/(width+1)=2, where the
    // candidate-superset guarantee no longer holds — must refuse
    val df = Seq("a", "a", "b", "c").toDF("tok")
    val e = intercept[IllegalArgumentException] {
      graft.operators.HeavyHitters.exact(df, share = 0.51, width = 1).collect()
    }
    assert(e.getMessage.contains("candidate set may miss"))
  }

  test("heavy hitters ignore null tokens instead of crashing") {
    val s = spark
    import s.implicits._
    val df = Seq(Some("a"), Some("a"), Some("a"), None, Some("b"))
      .toDF("tok")
    val out = graft.operators.HeavyHitters.exact(df, share = 0.5, width = 7)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // n counts only the 4 non-null tokens; a (3) clears ceil-threshold 2
    assert(out === Map("a" -> 3L))
  }

  test("q158 DSIR: target-domain docs outscore the rest; separation on a planted corpus") {
    // on the fixture corpus the target source's own bigram mass must
    // lift its docs' mean importance above the non-target mean
    val out = graft.queries.CorpusQueries.q158(spark, sf)
    val docs = graft.sources.Tables.documents(spark, sf).select("doc_id", "source")
    val means = out.join(docs, "doc_id")
      .groupBy(col("source") === graft.queries.CorpusQueries.DsirTarget)
      .agg(avg("score_micro").as("m")).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(means(true) > means(false),
      s"target mean ${means(true)} must exceed non-target ${means(false)}")
    // planted corpus: target docs speak vocab A, the rest vocab B —
    // every A-doc must outscore every B-doc
    val s2 = spark
    import s2.implicits._
    val synth = ((1L to 5L).map(i => (i, s"alpha beta gamma delta alpha beta", "src0")) ++
      (6L to 20L).map(i => (i, s"one two three four one two three", "other")))
      .toDF("doc_id", "text", "source")
    val dir = java.nio.file.Files.createTempDirectory("dsir").toString
    synth.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val scored = graft.queries.CorpusQueries.q158(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val aMin = (1L to 5L).map(scored).min
    val bMax = (6L to 20L).map(scored).max
    assert(aMin > bMax,
      s"every target-vocab doc ($aMin) must outscore every other ($bMax)")
  }

  test("quantile capacityFor clamps the census to [floor, memory ceiling]") {
    import graft.operators.QuantileSummary.capacityFor
    assert(capacityFor(100L) === 4096, "small census keeps the historical floor")
    assert(capacityFor(200000L) === 200000, "mid census sizes to the group")
    assert(capacityFor(1L << 40) === (1 << 20), "huge census hits the dial ceiling")
    assert(capacityFor(5000L, floor = 8, maxExactCapacity = 1024) === 1024)
    intercept[IllegalArgumentException](capacityFor(1L, floor = 4, maxExactCapacity = 8))
    intercept[IllegalArgumentException](capacityFor(1L, floor = 64, maxExactCapacity = 8))
  }

  test("derived quantile ceiling: heap/tasks/groups model with both clamps") {
    import graft.operators.QuantileSummary.{derivedCeiling, defaultMaxExactCapacity}
    // 48g heap, 32 tasks, 5 groups: 48e9/(96*32*5) ~ 3.1M — above the
    // 2^20 flat default (the sf10 regime this derivation exists for),
    // below the 2^24 cap
    val mid = derivedCeiling(48L << 30, 32, 5L)
    assert(mid > (1 << 20) && mid < (1 << 24), s"mid-range derivation, got $mid")
    assert(mid === ((48L << 30) / (96L * 32 * 5)).toInt)
    // small heap or many groups floors at the historical 2^20 — the
    // derivation may only ever BUY exactness, never regress it
    assert(derivedCeiling(1L << 30, 32, 5L) === (1 << 20))
    assert(derivedCeiling(48L << 30, 32, 1000000L) === (1 << 20))
    // giant heap caps at 2^24 (128 MB/group level-0 buffer)
    assert(derivedCeiling(1L << 50, 1, 1L) === (1 << 24))
    // zero measured groups (empty input) behaves as one group
    assert(derivedCeiling(48L << 30, 32, 0L) === derivedCeiling(48L << 30, 32, 1L))
    intercept[IllegalArgumentException](derivedCeiling(0L, 32, 5L))
    // the spark-bound wrapper resolves local heap/parallelism and stays
    // within the clamp bounds
    val d = defaultMaxExactCapacity(spark, 5L)
    assert(d >= (1 << 20) && d <= (1 << 24))
  }

  test("q107 census sizes capacity above the floor: exact on a 5000-row group") {
    val s = spark
    import s.implicits._
    // one group larger than the 4096 floor with fully distinct values:
    // census-driven capacity must hold every value (no compaction), so
    // p50 is the EXACT rank-2500 order statistic. At a fixed 4096 the
    // deterministic upper-promotion compaction would bias it upward.
    val dir = java.nio.file.Files.createTempDirectory("graft_q107c").toString
    (1 to 5000).map(i => (i.toLong * 1000000000L, "click", i.toDouble))
      .toDF("ts", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val out = CorpusQueries.q107(spark, dir).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_events") === 5000L)
    assert(r.getAs[Double]("p25") === 1250.0 && r.getAs[Double]("p50") === 2500.0 &&
      r.getAs[Double]("p75") === 3750.0 && r.getAs[Double]("p95") === 4750.0,
      s"census-sized capacity must make the 5000-row group exact, got $r")
  }
}
