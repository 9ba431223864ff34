package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtendedQueries

/** Invariant specs for the round-2 widening suite (q41–q48); exact
  * value parity vs DuckDB is the driver's oracle gate.
  */
class ExtendedSpec extends SparkSpec {

  test("q41 range join: every window produces shipped items") {
    val out = ExtendedQueries.q41(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Long]("n_items") > 0))
  }

  test("q42 window suite: quartiles in 1..4, rn dense per customer") {
    val out = ExtendedQueries.q42(spark, sf)
    assert(out.filter(col("quartile") < 1 || col("quartile") > 4).isEmpty)
    val rnMax = out.groupBy("o_custkey")
      .agg(max("rn").as("mx"), count(lit(1)).as("n"))
      .filter(col("mx") =!= col("n"))
    assert(rnMax.isEmpty, "row_number must be dense 1..n per customer")
  }

  test("q43 percentiles are ordered lo <= p25 <= p50 <= p75 <= hi") {
    ExtendedQueries.q43(spark, sf).collect().foreach { r =>
      // lo/hi are cents, quartiles quarter-cents — compare in quarter-cents
      val lo = 4 * r.getAs[Long]("lo_cents"); val hi = 4 * r.getAs[Long]("hi_cents")
      val Seq(p25, p50, p75) =
        Seq("p25_qc", "p50_qc", "p75_qc").map(r.getAs[Long])
      assert(lo <= p25 && p25 <= p50 && p50 <= p75 && p75 <= hi)
    }
  }

  test("q44 set ops: result within building segment, no delinquents") {
    val res = ExtendedQueries.q44(spark, sf)
    val c = graft.sources.Tables.customer(spark, sf)
    val bad = res.join(c, Seq("c_custkey"))
      .filter(col("c_mktsegment") =!= "BUILDING" || col("c_acctbal") < 0)
    assert(bad.isEmpty)
    assert(res.count() === res.distinct().count(), "set semantics: no dups")
  }

  test("q45 correlated subquery: every row above its nation average") {
    // nation_avg_micro floors the exact average: above-average rows can
    // sit within one micro-dollar of the published value, never below it
    val bad = ExtendedQueries.q45(spark, sf)
      .filter(col("c_acctbal") * 1e6 < col("nation_avg_micro"))
    assert(bad.isEmpty)
  }

  test("q46 gap fill: dense grid of days x types, zero-filled") {
    val out = ExtendedQueries.q46(spark, sf)
    val days = out.select("day").distinct().count()
    val types = out.select("event_type").distinct().count()
    assert(out.count() === days * types, "grid must be dense")
    assert(out.filter(col("n_events").isNull).isEmpty,
      "gap rows must be zero-filled, never NULL")
  }

  test("q47 tfidf: at most 5 terms per doc, ranks dense from 1") {
    val out = ExtendedQueries.q47(spark, sf)
    val perDoc = out.groupBy("doc_id").agg(count(lit(1)).as("n"), max("rnk").as("mx"))
    assert(perDoc.filter(col("n") > 5 || col("mx") =!= col("n")).isEmpty)
  }

  test("q49 ivf ann: <= k ranked neighbors per probe, no self-match") {
    val out = ExtendedQueries.q49(spark, sf)
    assert(out.filter(col("probe_id") === col("neighbor_id")).isEmpty)
    val perProbe = out.groupBy("probe_id").agg(count(lit(1)).as("n"), max("rank").as("mx"))
    assert(perProbe.filter(col("n") > 10 || col("mx") =!= col("n")).isEmpty)
  }

  test("q50 keep-first dedup: one row per (user, type), earliest ts") {
    val out = ExtendedQueries.q50(spark, sf)
    assert(out.groupBy("user_id", "event_type").count().filter(col("count") > 1).isEmpty)
    val ev = graft.sources.Tables.events(spark, sf)
    val minTs = ev.groupBy("user_id", "event_type").agg(min("ts").as("first_ts"))
    assert(out.join(minTs, Seq("user_id", "event_type"))
      .filter(out("first_ts") =!= minTs("first_ts")).isEmpty)
  }

  test("q51 centroids: cosine stats bounded in [-1, 1]") {
    val out = ExtendedQueries.q51(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val avg = r.getAs[Long]("avg_cos_micro")
      val mn = r.getAs[Long]("min_cos_micro")
      assert(mn <= avg && avg <= 1000000L && mn >= -1000000L)
    }
  }

  test("q52 sliding windows: each event lands in exactly 4 windows") {
    val total = ExtendedQueries.q52(spark, sf).agg(sum("n_events")).head().getLong(0)
    val n = graft.sources.Tables.events(spark, sf).count()
    assert(total === 4 * n)
  }

  test("q53 histogram: buckets within range, counts cover all orders") {
    val out = ExtendedQueries.q53(spark, sf)
    assert(out.filter(col("bucket") < 0 || col("bucket") > 13).isEmpty)
    assert(out.agg(sum("n_orders")).head().getLong(0) ===
      graft.sources.Tables.orders(spark, sf).count())
  }

  test("q54 argmax: top_order actually has top_price") {
    val o = graft.sources.Tables.orders(spark, sf)
    val bad = ExtendedQueries.q54(spark, sf)
      .join(o, col("top_order") === col("o_orderkey"))
      .filter(col("o_totalprice") =!= col("top_price"))
    assert(bad.isEmpty)
  }

  test("q55 dedup clusters: edges never cross clusters, rep is min") {
    val pairs = graft.operators.Dedup.ngramJaccardPairs(
      graft.sources.Tables.documents(spark, sf).filter(col("doc_id") % 4 === 0),
      "doc_id", "text", k = 3, threshold = 0.65).cache()
    val clusters = graft.operators.Dedup.dedupClusters(pairs, "id_a", "id_b").cache()
    val ca = clusters.withColumnRenamed("node", "id_a").withColumnRenamed("cluster", "cl_a")
    val cb = clusters.withColumnRenamed("node", "id_b").withColumnRenamed("cluster", "cl_b")
    assert(pairs.join(ca, Seq("id_a")).join(cb, Seq("id_b"))
      .filter(col("cl_a") =!= col("cl_b")).isEmpty, "pair endpoints must share a cluster")
    val badRep = clusters.groupBy("cluster").agg(min("node").as("mn"))
      .filter(col("cluster") =!= col("mn"))
    assert(badRep.isEmpty, "cluster id must be the minimum member id")
  }

  test("dedup clusters: distributed pointer-doubling path matches driver union-find") {
    val pairs = graft.operators.Dedup.ngramJaccardPairs(
      graft.sources.Tables.documents(spark, sf).filter(col("doc_id") % 4 === 0),
      "doc_id", "text", k = 3, threshold = 0.65).cache()
    val viaDriver = graft.operators.Dedup.dedupClusters(pairs, "id_a", "id_b")
    spark.conf.set("graft.dedup.maxDriverEdges", "0") // force the iterative path
    try {
      val viaIter = graft.operators.Dedup.dedupClusters(pairs, "id_a", "id_b")
      assert(viaDriver.exceptAll(viaIter).isEmpty && viaIter.exceptAll(viaDriver).isEmpty,
        "both paths must reach the identical min-id labeling")
    } finally spark.conf.unset("graft.dedup.maxDriverEdges")
  }

  test("q56 bpe tokens: finer-grained than whitespace tokens") {
    // blank text is excluded: split("") returns [""], so n_ws = 1 while
    // n_bpe = 0 — the invariant only holds for documents with content
    val docs = graft.sources.Tables.documents(spark, sf)
      .filter(length(trim(col("text"))) > 0).select("doc_id")
    val bad = ExtendedQueries.q56(spark, sf).join(docs, Seq("doc_id"))
      .filter(col("n_bpe") < col("n_ws"))
    assert(bad.isEmpty, "BPE pre-tokenization must split at least as fine as whitespace")
  }

  test("multimodal resize: target dims, proportional bytes, deterministic") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .withColumn("payload", col("text").cast("binary"))
    val out = graft.operators.Multimodal.resizeAll(docs, "doc_id", "payload", 32, 32)
      .toDF().cache()
    assert(out.filter(col("width") =!= 32 || col("height") =!= 32).isEmpty)
    assert(out.filter(col("n_bytes") < 1).isEmpty)
    val again = graft.operators.Multimodal.resizeAll(docs, "doc_id", "payload", 32, 32).toDF()
    assert(out.exceptAll(again).isEmpty, "resize stub must be deterministic")
  }

  test("multimodal byte histogram: 16 bins summing to ~1") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .withColumn("payload", col("text").cast("binary"))
    val out = graft.operators.Multimodal.byteHistogram(docs, "doc_id", "payload").toDF()
    val sums = out.select(expr("aggregate(features, 0.0d, (a, x) -> a + x)").as("s"),
      size(col("features")).as("nb"))
    assert(sums.filter(col("nb") =!= 16).isEmpty)
    assert(sums.filter(abs(col("s") - 1.0) > 1e-9).isEmpty)
  }

  test("multimodal stubs survive empty payloads (ADVICE r2)") {
    val ss = spark; import ss.implicits._
    val docs = Seq((1L, Array.emptyByteArray), (2L, "abc".getBytes))
      .toDF("doc_id", "payload")
    val resized = graft.operators.Multimodal.resizeAll(docs, "doc_id", "payload", 32, 32)
      .toDF().orderBy("doc_id").collect()
    assert(resized.length === 2)
    assert(resized(0).getAs[Long]("n_bytes") === 0L, "empty in -> empty out")
    assert(resized(1).getAs[Long]("n_bytes") > 0L)
    val hist = graft.operators.Multimodal.byteHistogram(docs, "doc_id", "payload")
      .toDF().orderBy("doc_id").collect()
    assert(hist(0).getAs[scala.collection.Seq[Double]]("features").sum === 0.0,
      "empty payload -> all-zero histogram by convention")
    assert(math.abs(hist(1).getAs[scala.collection.Seq[Double]]("features").sum - 1.0) < 1e-9)
  }

  test("q57 frame sampling: every frame is exactly frameBytes long") {
    val frames = graft.operators.Multimodal.frameSample(
      graft.sources.Tables.documents(spark, sf)
        .withColumn("payload", col("text").cast("binary")),
      "doc_id", "payload", frameBytes = 256, strideBytes = 128)
    assert(frames.filter(length(col("frame")) =!= 256).isEmpty)
    assert(frames.count() > 0)
  }

  test("q58 profile: one row per profiled column, nulls+values = rows") {
    val out = ExtendedQueries.q58(spark, sf).collect()
    assert(out.length === 3)
    val n = graft.sources.Tables.lineitem(spark, sf).count()
    out.foreach { r =>
      assert(r.getAs[Long]("n_values") + r.getAs[Long]("n_nulls") === n)
      assert(r.getAs[Double]("vmin") <= r.getAs[Double]("vmax"))
    }
  }

  test("q59 unpivot: pivot round-trip equals direct aggregation") {
    val unpivoted = ExtendedQueries.q59(spark, sf)
    val direct = graft.sources.Tables.events(spark, sf)
      .groupBy("user_id", "event_type")
      .agg(sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
        .cast("double").as("total"))
    assert(unpivoted.count() === direct.count())
    assert(unpivoted.exceptAll(direct).count() === 0)
  }

  test("q60 outliers: every flagged value is beyond 3 sigma") {
    // tolerance 5e-6: the output mean/sd are rounded to 6 decimals while
    // the filter ran unrounded, skewing the re-check by up to ~2e-6
    val out = ExtendedQueries.q60(spark, sf)
    assert(out.filter(abs(col("value") - col("mean")) <= lit(3.0) * col("sd") - 5e-6)
      .isEmpty)
  }

  test("q61 moving aggregate: window bounded at 4, avg consistent") {
    val out = ExtendedQueries.q61(spark, sf)
    assert(out.filter(col("mov_n") < 1 || col("mov_n") > 4).isEmpty)
    assert(out.filter(
      abs(col("mov_avg") * col("mov_n") - col("mov_sum")) > 1e-6).isEmpty)
  }

  test("q48 json extract: groups cover all events exactly once") {
    val out = ExtendedQueries.q48(spark, sf)
    val total = out.agg(sum("n_events")).head().getLong(0)
    assert(total === graft.sources.Tables.events(spark, sf).count())
  }
}
