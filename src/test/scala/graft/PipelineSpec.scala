package graft

import org.apache.spark.sql.functions._

import graft.queries.PipelineQueries

class PipelineSpec extends SparkSpec {

  test("q109 triangles: exact closure of the thresholded edge set, canonical order") {
    val edges = PipelineQueries.q69(spark, sf)
      .filter(col("n_docs") >= PipelineQueries.TriMinSupport)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val w = edges.map { case (a, b, n) => (a, b) -> n }.toMap
    // independent driver-side enumeration
    val expect = (for {
      (a, b) <- w.keys
      c <- w.keys.collect { case (`b`, x) => x }
      if w.contains((a, c))
    } yield (a, b, c, Seq(w((a, b)), w((b, c)), w((a, c))).min)).toSet
    val got = PipelineQueries.q109(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(got === expect, "triangle set must equal the brute-force closure")
    assert(got.forall { case (a, b, c, _) => a < b && b < c },
      "canonical a<b<c — each triangle exactly once")
    assert(got.nonEmpty, "threshold must leave a non-trivial graph at test scale")
  }

  test("q110 weighted sample: k per stratum, higher-weight langs sampled at higher rates") {
    val out = PipelineQueries.q110(spark, sf).cache()
    val docs = graft.sources.Tables.documents(spark, sf)
    try {
      // exactly min(8, stratum size) per source, no duplicate docs
      val sizes = docs.groupBy("source").count()
      val bad = out.groupBy("source")
        .agg(count(lit(1)).as("n"), countDistinct("doc_id").as("nd"))
        .join(sizes, Seq("source"))
        .filter(col("n") =!= least(lit(8L), col("count")) || col("n") =!= col("nd"))
      assert(bad.isEmpty)
      // inclusion rate must order with the weights: en(3) > zh(2) > rest(1)
      val rates = out.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val base = docs.groupBy("lang").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      def rate(l: String) = rates.getOrElse(l, 0L).toDouble / base(l)
      val restAvg = base.keys.filterNot(Set("en", "zh")).map(rate).sum /
        base.keys.count(!Set("en", "zh").contains(_))
      assert(rate("en") > rate("zh") && rate("zh") > restAvg,
        s"weights must order the inclusion rates: en=${rate("en")} zh=${rate("zh")} rest=$restAvg")
    } finally out.unpersist()
  }

  test("q190 leakage-safe split: clusters stay whole, grp is the q55 fixpoint") {
    val out = PipelineQueries.q190(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getString(4)))
    assert(out.nonEmpty)
    // 1. leakage-safety by construction: every grp carries ONE split
    out.groupBy(_._2).foreach { case (g, rows) =>
      assert(rows.map(_._4).distinct.length === 1,
        s"cluster $g torn across splits — the leak this op exists to stop")
      assert(rows.forall(_._3 == rows.length),
        s"n_members wrong for cluster $g")
    }
    // 2. grp equals a driver union-find over the same pair set
    val pairs = graft.operators.Dedup.ngramJaccardPairs(
      graft.sources.Tables.documents(spark, sf)
        .filter(col("doc_id") % 4 === 0),
      "doc_id", "text", k = 3,
      threshold = graft.queries.ExtendedQueries.ClusterT)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    out.foreach { case (id, g, _, _, _) =>
      assert(g === find(id), s"doc $id: grp $g != union-find root ${find(id)}")
    }
    // 3. split is the q62 bucket function applied to grp; naive to the id
    def bucket(x: Long): Long = {
      val m = (x * 2654435761L + 104729L) % 100L
      if (m < 0) m + 100 else m
    }
    def name(b: Long): String =
      if (b < 80) "train" else if (b < 90) "val" else "test"
    out.foreach { case (id, g, _, s, ns) =>
      assert(s === name(bucket(g)) && ns === name(bucket(id)))
    }
    // 4. the contrast is real on test data: at least one multi-member
    // cluster exists, and singleton docs split identically to q62
    assert(out.exists(_._3 > 1), "need a non-trivial cluster at test scale")
    out.filter(_._3 == 1).foreach { case (_, _, _, s, ns) => assert(s === ns) }
  }

  test("q62 hash split: pure (same id -> same split), partitions all docs") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val out = PipelineQueries.q62(spark, sf)
    assert(out.agg(sum("n_docs")).head().getLong(0) === docs.count(),
      "every document lands in exactly one split")
    // purity: recomputing on a reshuffled input yields identical rows
    val again = PipelineQueries.hashSplit(docs.repartition(7), "doc_id", 80, 10)
      .groupBy("lang", "split").agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("q62 split proportions are near 80/10/10 globally") {
    val byPct = PipelineQueries.hashSplit(
        graft.sources.Tables.documents(spark, sf), "doc_id", 80, 10)
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = byPct.values.sum.toDouble
    assert(byPct("train") / n > 0.7 && byPct("train") / n < 0.9)
    assert(byPct.getOrElse("val", 0L) / n < 0.2 && byPct.getOrElse("test", 0L) / n < 0.2)
  }

  test("q63 stratified sample: exactly min(20, stratum size) per lang, no dupes") {
    val out = PipelineQueries.q63(spark, sf).cache()
    val sizes = graft.sources.Tables.documents(spark, sf)
      .groupBy("lang").count()
    val got = out.groupBy("lang").agg(count(lit(1)).as("n"),
      countDistinct("doc_id").as("nd"))
    val bad = got.join(sizes, Seq("lang"))
      .filter(col("n") =!= least(lit(20L), col("count")) || col("n") =!= col("nd"))
    assert(bad.isEmpty)
  }

  test("q64 packing: windows contiguous, sized by n_chars, per-source chain") {
    val out = PipelineQueries.q64(spark, sf).cache()
    assert(out.filter(col("pack_last") < col("pack_first")).isEmpty)
    assert(out.filter(
      col("n_windows") =!= col("pack_last") - col("pack_first") + 1).isEmpty)
    // consecutive docs within a source chain: next.pack_first is the
    // same window as (or the one after) prev.pack_last
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
    val chained = out.withColumn("prev_last", lag("pack_last", 1).over(w))
      .filter(col("prev_last").isNotNull)
      .filter(col("pack_first") < col("prev_last") ||
        col("pack_first") > col("prev_last") + 1)
    assert(chained.isEmpty, "packing must chop a contiguous concatenation")
  }

  test("q65 funnel: stage timestamps strictly ordered, monotone counts") {
    val out = PipelineQueries.q65(spark, sf).cache()
    assert(out.filter(col("t_click").isNotNull && col("t_click") <= col("t_view")).isEmpty)
    assert(out.filter(col("t_purchase").isNotNull &&
      col("t_purchase") <= col("t_click")).isEmpty)
    val nV = out.count()
    val nC = out.filter(col("t_click").isNotNull).count()
    val nP = out.filter(col("t_purchase").isNotNull).count()
    assert(nV >= nC && nC >= nP, "funnel stages can only narrow")
  }

  test("q66 retention: week 0 exists for every cohort, users bounded by cohort size") {
    val out = PipelineQueries.q66(spark, sf).cache()
    assert(out.filter(col("week_n") < 0).isEmpty)
    val w0 = out.filter(col("week_n") === 0).select("cohort_day")
    val all = out.select("cohort_day").distinct()
    assert(all.exceptAll(w0.distinct()).isEmpty, "every cohort has week-0 activity")
    val w0n = out.filter(col("week_n") === 0)
      .select(col("cohort_day"), col("n_users").as("w0"))
    val bad = out.join(w0n, Seq("cohort_day")).filter(col("n_users") > col("w0"))
    assert(bad.isEmpty, "no week can retain more users than the cohort started with")
  }

  test("q67 debounce: at most one survivor per (user, type, 5-min bucket), earliest wins") {
    val out = PipelineQueries.q67(spark, sf).cache()
    val rebucketed = out.withColumn("bucket", expr("unix_micros(ts) div 300000000"))
    val dupes = rebucketed.groupBy("user_id", "event_type", "bucket")
      .count().filter(col("count") > 1)
    assert(dupes.isEmpty)
    // survivors are a subset of events and each is the bucket's min ts
    val ev = graft.sources.Tables.events(spark, sf)
      .withColumn("bucket", expr("unix_micros(ts) div 300000000"))
      .groupBy("user_id", "event_type", "bucket").agg(min("ts").as("min_ts"))
    val bad = rebucketed.join(ev, Seq("user_id", "event_type", "bucket"))
      .filter(col("ts") =!= col("min_ts"))
    assert(bad.isEmpty)
  }

  test("q68 ann recall: probe coverage and recall within [0, 1]") {
    val out = PipelineQueries.q68(spark, sf).cache()
    val nProbes = graft.sources.Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 50).count()
    assert(out.count() === nProbes, "one recall row per probe")
    assert(out.filter(col("recall_at_10") < 0 || col("recall_at_10") > 1).isEmpty)
  }

  test("q70 z-order: buckets cover all rows; locality beats 1-D sort on the 2nd dim") {
    val out = PipelineQueries.q70(spark, sf).cache()
    val orders = graft.sources.Tables.orders(spark, sf)
    assert(out.agg(sum("n_rows")).head().getLong(0) === orders.count())
    // locality: average per-bucket o_orderkey span under z-order must be
    // far below the span of custkey-sorted buckets of equal count (where
    // orderkey is unclustered → span ~ full range)
    val zSpan = out.filter(col("n_rows") > 1)
      .agg(avg(col("max_o_orderkey") - col("min_o_orderkey"))).head().getDouble(0)
    val full = orders.agg(max("o_orderkey") - min("o_orderkey")).head().getLong(0).toDouble
    assert(zSpan < full * 0.5,
      s"z-order bucket orderkey span $zSpan should be well under the full range $full")
  }

  test("q76 decontamination flags only corpus docs that truly share an eval 5-gram") {
    val out = PipelineQueries.q76(spark, sf).cache()
    assert(out.count() > 0, "corpus must contain contaminated docs (near-dups of eval)")
    assert(out.filter(col("doc_id") % 11 === 0).isEmpty, "eval docs must not self-flag")
    assert(out.filter(col("n_contaminated") < 1).isEmpty)
    // independent driver-side cross-check of one flagged doc
    def grams(text: String): Set[String] = {
      val w = text.trim.toLowerCase.split("\\s+")
      if (w.length < 5) Set.empty
      else (0 to w.length - 5).map(i => w.slice(i, i + 5).mkString(" ")).toSet
    }
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val flagged = out.collect()(0).getAs[Long]("doc_id")
    val evalGrams = docs.collect { case (id, t) if id % 11 == 0 => grams(t) }
      .foldLeft(Set.empty[String])(_ ++ _)
    assert(grams(docs(flagged)).intersect(evalGrams).nonEmpty,
      s"doc $flagged flagged but shares no 5-gram with the eval set")
  }

  test("zorder zvalue: interleave is a bijection on the masked domain") {
    import graft.operators.ZOrder
    val df = spark.range(0, 1024).toDF("x")
      .withColumn("y", (col("x") * 7 + 3) % 1024)
      .withColumn("z", ZOrder.zvalue(Seq(col("x"), col("y")), 10))
    // 10-bit x recovered from even bit positions, y from odd
    val xBack = (0 until 10).map(i =>
      shiftleft(shiftright(col("z"), 2 * i).bitwiseAND(lit(1L)), i))
      .reduce(_ bitwiseOR _)
    val yBack = (0 until 10).map(i =>
      shiftleft(shiftright(col("z"), 2 * i + 1).bitwiseAND(lit(1L)), i))
      .reduce(_ bitwiseOR _)
    assert(df.filter(xBack =!= col("x") || yBack =!= col("y")).isEmpty)
  }

  test("q71 bigrams: total pairs = total tokens - docs with content") {
    val out = PipelineQueries.q71(spark, sf)
    val docs = graft.sources.Tables.documents(spark, sf)
    val toks = split(trim(lower(col("text"))), "\\s+")
    val expected = docs.select(size(toks).as("n"))
      .filter(col("n") > 1 || (col("n") === 1 && length(trim(col("text"))) > 0))
      .agg(sum(col("n") - 1)).head().getLong(0)
    assert(out.agg(sum("n_pairs")).head().getLong(0) === expected,
      "each document with t tokens contributes exactly t-1 bigrams")
  }

  test("q69 cooccurrence: symmetric-free pairs, df bounded by corpus size") {
    val out = PipelineQueries.q69(spark, sf).cache()
    assert(out.filter(col("tok_a") >= col("tok_b")).isEmpty)
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(out.filter(col("n_docs") > nDocs || col("n_docs") < 1).isEmpty)
    // the bounded-vocabulary contract is code, not convention
    val toks = out.select(col("tok_a").as("tok"))
      .unionByName(out.select(col("tok_b").as("tok"))).distinct().count()
    assert(toks <= PipelineQueries.CoocTopK,
      s"$toks distinct tokens exceed the CoocTopK=${PipelineQueries.CoocTopK} prune")
  }

  test("q102 sample sketch is row-identical to q63's window formulation") {
    val sketch = PipelineQueries.q102(spark, sf).cache()
    try {
      val window = PipelineQueries.q63(spark, sf)
      assert(sketch.count() > 0)
      assert(sketch.exceptAll(window).isEmpty && window.exceptAll(sketch).isEmpty,
        "bounded-summary sample must equal the exact row_number sample")
    } finally sketch.unpersist()
  }

  test("q102 sample sketch is partitioning-invariant") {
    import org.apache.spark.sql.Encoders
    val samp = udaf(new graft.operators.GroupSample.GroupSampleAgg(20),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
    val base = graft.sources.Tables.documents(spark, sf)
      .select(col("lang"),
        pmod(col("doc_id") * lit(48271L) + lit(12821L), lit(1000003L)).as("skey"),
        col("doc_id"))
    def run(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("lang").agg(samp(col("skey"), col("doc_id")).as("s"))
        .select(col("lang"), posexplode(col("s.ids")))
    val a = run(base)
    val b = run(base.repartition(13))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
