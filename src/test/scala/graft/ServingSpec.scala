package graft

import org.apache.spark.sql.functions._

import graft.queries.ServingQueries

class ServingSpec extends SparkSpec {

  test("q155 phrase search equals a driver-side scan of every document") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
    val expect = docs.flatMap { r =>
      val ws = r.getString(1).trim.toLowerCase.split("\\s+")
      val hits = (0 until ws.length - 1).filter(i =>
        ws(i) == ServingQueries.PhraseA && ws(i + 1) == ServingQueries.PhraseB)
      if (hits.isEmpty) None
      else Some((r.getLong(0), hits.length.toLong, hits.head.toLong + 1))
    }.toSet
    val got = ServingQueries.q155(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expect, "HOF adjacency scan must equal the brute scan")
    assert(expect.nonEmpty, "the fixture phrase must occur in the corpus")
  }

  test("q155 plan: no join/agg shuffle — matching happens in the scan stage") {
    // executedPlan is AQE-wrapped (AdaptiveSparkPlanExec is a leaf to
    // collect), so assert on the rendered tree. ONE Exchange is
    // expected and deliberate: Tables.parallelized round-robin-spreads
    // the small single-split fixture scan (a no-op at corpus scale);
    // what the phrase scan must never introduce is a HASH/RANGE
    // exchange — the signature of a posting self-join or aggregation.
    val s = ServingQueries.q155(spark, sf).queryExecution.executedPlan.toString
    assert(s.contains("phrase_scan"), s"codegen'd matcher missing from:\n$s")
    assert(!s.contains("hashpartitioning") && !s.contains("rangepartitioning"),
      s"phrase search must not hash/range shuffle:\n$s")
    assert(!s.contains("SortMergeJoin") && !s.contains("BroadcastHashJoin"),
      s"phrase search must not join:\n$s")
  }

  test("q156 delta-join algebra equals the full recompute") {
    val full = graft.sources.Tables.orders(spark, sf)
      .join(graft.sources.Tables.lineitem(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("total_cents"),
        count(lit(1)).as("n_lines"))
    val inc = ServingQueries.q156(spark, sf)
    assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty,
      "state + three delta terms must equal the full join recompute")
    // the cut must actually split the data — otherwise the algebra is
    // vacuously the state term and the test proves nothing
    val cut = lit(ServingQueries.DeltaCut).cast("date")
    val o = graft.sources.Tables.orders(spark, sf)
    assert(o.filter(col("o_orderdate").cast("date") < cut).count() > 0)
    assert(o.filter(col("o_orderdate").cast("date") >= cut).count() > 0)
  }

  test("q157 target encoding: out-of-fold means, self-exclusion verified") {
    val out = ServingQueries.q157(spark, sf).cache()
    try {
      val p = graft.sources.Tables.events(spark, sf)
        .filter(col("value").isNotNull)
        .select(col("event_id"), col("event_type"),
          round(col("value") * 100).cast("long").as("cents"))
        .withColumn("fold",
          expr(s"((event_id * 48271) % 2147483647) % ${ServingQueries.Folds}"))
        .cache()
      // every encodable row is present exactly once
      assert(out.count() === p.count())
      assert(out.groupBy("event_id").count().filter(col("count") > 1).isEmpty)
      // recompute one (type, fold) cell by hand and compare
      val probe = out.head()
      val (et, fd) = (probe.getString(1), probe.getLong(2))
      val others = p.filter(col("event_type") === et && col("fold") =!= fd)
        .agg(sum("cents").as("s"), count(lit(1)).as("n")).head()
      val expect = (others.getLong(0) * 10000L) / others.getLong(1)
      assert(probe.getLong(3) === expect,
        s"enc for ($et, fold $fd) must be the mean of the OTHER folds")
      // leakage structure: within a type, rows of the SAME fold share
      // one encoding, and some type has fold-dependent encodings
      // (constant-across-folds would mean the fold exclusion is dead)
      val perCell = out.groupBy("event_type", "fold")
        .agg(countDistinct("enc_micro").as("d"))
      assert(perCell.filter(col("d") =!= 1).isEmpty,
        "one encoding per (type, fold) cell")
      val varies = out.groupBy("event_type")
        .agg(countDistinct("enc_micro").as("d"))
        .filter(col("d") > 1)
      assert(varies.count() > 0,
        "out-of-fold exclusion must move at least one type's encoding")
      p.unpersist()
    } finally out.unpersist()
  }

  test("q163 retraction algebra equals the direct recompute, and retracts something") {
    val out = ServingQueries.q163(spark, sf)
    val cut = lit(ServingQueries.DeltaCut).cast("date")
    val l = graft.sources.Tables.lineitem(spark, sf)
    val retracted = l.filter(col("l_returnflag") === "R" &&
      col("l_shipdate").cast("date") >= cut)
    assert(retracted.count() > 0, "the fixture must contain late returns")
    val direct = graft.sources.Tables.orders(spark, sf)
      .join(l.filter(!(col("l_returnflag") === "R" &&
          col("l_shipdate").cast("date") >= cut)),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("net_cents"),
        count(lit(1)).as("n_live"))
    assert(out.exceptAll(direct).isEmpty && direct.exceptAll(out).isEmpty,
      "state merged with negated retraction partials must equal exclusion")
  }
}
