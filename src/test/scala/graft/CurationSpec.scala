package graft

import org.apache.spark.sql.functions._

import graft.operators.{BpeEncoder, BpeTrainer, CompressionStats}
import graft.queries.CurationQueries

class CurationSpec extends SparkSpec {

  private def docTokens: Map[Long, Seq[String]] =
    graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), lower(col("text")).as("t")).collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq.filter(_.nonEmpty))
      .toMap

  test("q114 bm25: dense ranks, hits only, scores ordered and driver-recomputed") {
    val out = CurationQueries.q114(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 50)
    assert(out.map(_.getInt(3)).sorted.toSeq === (1 to out.length))
    val toks = docTokens
    val terms = CurationQueries.Bm25Terms.toSet
    // every retrieved doc contains at least one query term; n_terms_hit exact
    out.foreach { r =>
      val hit = toks(r.getLong(0)).toSet.intersect(terms)
      assert(hit.nonEmpty && hit.size === r.getLong(1))
    }
    // scores are non-increasing in rank order
    val byRank = out.sortBy(_.getInt(3)).map(_.getLong(2))
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    // independent BM25 recomputation for the top doc, in the query's
    // exact fixed-point form: floor(1e6·score_t) per term, summed as
    // integers (same double op order as the Spark expression; ±1
    // micro-unit slack covers a possible libm-vs-StrictMath ln ulp)
    val n = toks.size.toDouble
    val avgdl = toks.values.map(_.length).sum / n
    val dfreq = terms.map(t => t -> toks.values.count(_.contains(t)).toDouble).toMap
    def bm25fp(id: Long): Long = {
      val ws = toks(id)
      terms.toSeq.map { t =>
        val tf = ws.count(_ == t).toDouble
        if (tf == 0) 0L
        else {
          val idf = StrictMath.log(1.0 + (n - dfreq(t) + 0.5) / (dfreq(t) + 0.5))
          math.floor(1e6 * idf * tf * (CurationQueries.Bm25K1 + 1) /
            (tf + CurationQueries.Bm25K1 * (1 - CurationQueries.Bm25B +
              CurationQueries.Bm25B * ws.length / avgdl))).toLong
        }
      }.sum
    }
    val top = out.minBy(_.getInt(3))
    assert(math.abs(bm25fp(top.getLong(0)) - top.getLong(2)) <= 1L)
  }

  test("q115 relational division: complete characterization vs driver token sets") {
    val got = CurationQueries.q115(spark, sf).collect().map(_.getLong(0)).toSet
    val expect = docTokens.collect {
      case (id, ws) if CurationQueries.DivisionTerms.forall(ws.contains) => id
    }.toSet
    assert(got === expect, "division must return exactly the docs containing ALL terms")
    assert(expect.nonEmpty, "probe terms should match at least one sf0.001 doc")
  }

  test("q116 deflate ratio: deterministic, bounded, orders repetition below noise") {
    val a = CurationQueries.q116(spark, sf).collect().sortBy(_.getLong(0))
    val b = CurationQueries.q116(spark, sf).collect().sortBy(_.getLong(0))
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq, "deflate must be a pure function")
    a.foreach { r =>
      val (nb, nd) = (r.getLong(1), r.getLong(2))
      assert(nb > 0 && nd > 0 && r.getDouble(3) > 0)
      assert(nd <= nb + 11, "stored-block overhead bound: deflate never inflates past 11B+5/16k")
    }
    // a repetitive text must compress strictly better than high-entropy text
    val s = spark
    import s.implicits._
    val synth = Seq(
      (1L, "spark " * 200),
      (2L, (1 to 200).map(i => (i * 2654435761L).toHexString).mkString(" "))
    ).toDF("doc_id", "text")
    val m = CompressionStats.deflateStats(synth, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(m(1L) < m(2L))
    // empty text: no ratio, zero sizes
    val e = CompressionStats.deflateStats(
      Seq((9L, "")).toDF("doc_id", "text"), "doc_id", "text").collect()(0)
    assert(e.getLong(1) === 0L && e.isNullAt(3))
  }

  test("q117 rolling folds: counts equal a driver recomputation; embargo holds") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("ts"), col("user_id")).collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1)))
    val t0 = ev.map(_._1).min
    val day = 86400000L
    val expect = (for {
      f <- 1 to 3
      split <- Seq("train", "test")
    } yield {
      val in = ev.filter { case (ts, _) =>
        if (split == "train") ts < t0 + 7L * f * day
        else ts >= t0 + (7L * f + 1) * day && ts < t0 + (7L * f + 8) * day
      }
      ((f, split), (in.length.toLong, in.map(_._2).distinct.length.toLong))
    }).filter(_._2._1 > 0).toMap
    val got = CurationQueries.q117(spark, sf).collect()
      .map(r => ((r.getInt(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(got === expect)
    // temporal hygiene: each fold's train count grows with the horizon
    val trains = (1 to 3).flatMap(f => got.get((f, "train")).map(_._1))
    assert(trains.zip(trains.tail).forall { case (a, b) => a <= b })
  }

  test("q119 concentration: bounded top-k aggregator equals the window formulation") {
    // driver recomputation IS the rank-window formulation: per-user
    // cents sorted by (cents desc, user asc), take 10 — the TopPairsAgg
    // plan must reproduce it exactly, plus the floor-ppm share
    val ev = graft.sources.Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("user_id"), col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1), math.round(r.getDouble(2) * 100)))
    val expect = ev.groupBy(_._1).map { case (t, rows) =>
      val perUser = rows.groupBy(_._2).map { case (u, rs) => (u, rs.map(_._3).sum) }.toSeq
      val top10 = perUser.sortBy { case (u, v) => (-v, u) }.take(10).map(_._2).sum
      val total = perUser.map(_._2).sum
      (t, perUser.size.toLong, total, top10,
        if (total == 0) null else math.floor(1e6 * top10.toDouble / total.toDouble).toLong)
    }.toSet
    val got = graft.queries.CurationQueries.q119(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) null else r.getLong(4))).toSet
    assert(got === expect)
  }

  test("q120 MAD outliers: medians and outlier counts equal a driver recomputation") {
    val ev = graft.sources.Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    def rankStat(xs: Seq[Double]): Double = {
      val sorted = xs.sorted
      sorted(((50 * xs.size + 99) / 100 - 1).max(0))
    }
    val expect = ev.groupBy(_._1).map { case (t, rows) =>
      val vs = rows.map(_._2).toSeq
      val med = rankStat(vs)
      val ds = vs.map(v => math.abs(v - med))
      val mad = rankStat(ds)
      (t, vs.size.toLong, med, mad, ds.count(_ > 3 * mad).toLong)
    }.toSet
    val got = graft.queries.CurationQueries.q120(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4))).toSet
    assert(got === expect)
    // robustness: MAD-based outlier counts exist and are a small minority
    got.foreach { case (t, n, _, _, k) => assert(k < n / 4, s"$t flags too much") }
  }

  test("q121 containment: complete characterization and the asymmetric catch") {
    // driver all-pairs containment on distinct word-4-grams
    val toks = docTokens
    val sets = toks.map { case (id, ws) =>
      id -> ws.sliding(4).filter(_.size == 4).map(_.mkString(" ")).toSet
    }.filter(_._2.nonEmpty)
    val ids = sets.keys.toSeq.sorted
    val expect = (for {
      i <- ids; j <- ids if i < j
      ni = sets(i).intersect(sets(j)).size
      minSz = math.min(sets(i).size, sets(j).size)
      if ni >= 0.8 * minSz
    } yield (i, j, ni.toLong)).toSet
    val got = graft.queries.CurationQueries.q121(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expect, "pruned pipeline must equal all-pairs containment here")
    assert(expect.nonEmpty, "sf0.001 must contain containment pairs")
    // the asymmetric case Jaccard misses: a short doc quoted inside a long one
    val s2 = spark
    import s2.implicits._
    val synth = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      // DISTINCT filler tokens: repetition would collapse the long doc's
      // shingle set and push Jaccard back up
      (2L, (1 to 100).map(i => s"w$i").mkString(" ") +
        " alpha beta gamma delta epsilon")
    ).toDF("doc_id", "text")
    val pair = graft.operators.Dedup.containmentPairs(synth, "doc_id", "text", 4, 0.8)
      .collect()
    assert(pair.length == 1 && pair(0).getLong(5) == 1000000L,
      "full quote inclusion must score containment 1.0 (1e6 ppm)")
    val (szA, szB) = (pair(0).getLong(3), pair(0).getLong(4))
    val jaccard = pair(0).getLong(2).toDouble / (szA + szB - pair(0).getLong(2))
    assert(jaccard < 0.1, "the same pair is invisible to a Jaccard threshold")
    // the posting-df dial prunes hot shingles (candidates can only shrink)
    spark.conf.set("graft.dedup.maxPostingDf", "1")
    try {
      val pruned = graft.queries.CurationQueries.q121(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(pruned.subsetOf(got))
    } finally spark.conf.unset("graft.dedup.maxPostingDf")
  }

  test("q122 IVF recall: complete probe coverage with a measured floor") {
    val out = graft.queries.CurationQueries.q122(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.size === 50, "one recall row per probe")
    out.values.foreach(v => assert(v >= 0.0 && v <= 1.0))
    val mean = out.values.sum / out.size
    assert(mean >= 0.5,
      f"IVF nProbe=4/16 must find at least half the true neighbors (got $mean%.3f)")
  }

  test("q123 funnel latency: driver-recomputed weekly exact percentiles") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val firstView = ev.filter(_._2 == "view").groupBy(_._1)
      .map { case (u, rs) => u -> rs.map(_._3).min }
    val lats = ev.filter(_._2 == "purchase")
      .flatMap { case (u, _, us) =>
        firstView.get(u).filter(us >= _).map(v => (u, v, us))
      }
      .groupBy(_._1)
      .map { case (u, rs) =>
        val v = rs.head._2
        (u, v, (rs.map(_._3).min - v) / 1e6)
      }.toSeq
    assert(lats.nonEmpty)
    def weekOf(us: Long): Long = {
      // ISO-Monday truncation in µs, mirroring date_trunc('week')
      val day = 86400000000L
      val d = Math.floorDiv(us, day)
      (d - Math.floorMod(d + 3, 7L)) * day // epoch day 0 = Thursday → +3
    }
    val expect = lats.groupBy(t => weekOf(t._2)).map { case (wk, rs) =>
      val sorted = rs.map(_._3).sorted
      def pct(p: Int) = sorted(((p * rs.size + 99) / 100 - 1).max(0))
      (wk, rs.size.toLong, pct(50), pct(90))
    }.toSet
    val got = graft.queries.CurationQueries.q123(spark, sf)
      .select(unix_micros(col("week").cast("timestamp")), col("n_conversions"),
        col("p50_s"), col("p90_s")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    assert(got === expect)
  }

  test("q124 session paths: top-20 equals a driver sessionization recomputation") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val gap = 30L * 60 * 1000000
    val paths = ev.groupBy(_._1).values.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      val sessions = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer.empty[String])
      var prev = Long.MinValue
      sorted.foreach { case (_, us, _, tpe) =>
        if (prev != Long.MinValue && us > prev + gap)
          sessions += scala.collection.mutable.ArrayBuffer.empty[String]
        sessions.last += tpe
        prev = us
      }
      sessions.map(_.mkString(">"))
    }.toSeq
    val counts = paths.groupBy(identity).map { case (p, ps) => (p, ps.size.toLong) }
    val expect = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
      .zipWithIndex.map { case ((p, n), i) => (p, n, i + 1) }.toSet
    val got = graft.queries.CurationQueries.q124(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === expect)
  }

  test("q125 FD profile: exact keys show zero violations, driver-recomputed") {
    val rows = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("source")).collect()
      .map(r => (r.getLong(0).toString, r.getString(1), r.getString(2)))
    def profile(det: (String, String, String) => String,
                dep: (String, String, String) => String): (Long, Long, Long) = {
      val images = rows.groupBy(r => det(r._1, r._2, r._3))
        .map { case (_, rs) => rs.map(r => dep(r._1, r._2, r._3)).distinct.size }
      (images.size.toLong, images.count(_ > 1).toLong, images.max.toLong)
    }
    val expect = Map(
      ("doc_id", "lang")   -> profile((id, _, _) => id, (_, l, _) => l),
      ("doc_id", "source") -> profile((id, _, _) => id, (_, _, s) => s),
      ("source", "lang")   -> profile((_, _, s) => s, (_, l, _) => l),
      ("lang", "source")   -> profile((_, l, _) => l, (_, _, s) => s))
    val got = graft.queries.CurationQueries.q125(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got === expect)
    // the id key is exact; the source→lang dependency is genuinely broken
    assert(got(("doc_id", "lang"))._2 === 0L)
    assert(got(("source", "lang"))._2 > 0L)
  }

  test("q126 gini: exact integers match a driver recomputation; bounds hold") {
    val ev = graft.sources.Tables.events(spark, sf)
      .filter(col("value").isNotNull && col("value") >= 0)
      .select(col("event_type"), col("event_id"), col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1), math.round(r.getDouble(2) * 100)))
    val expect = ev.groupBy(_._1).map { case (t, rows) =>
      val cs = rows.sortBy(r => (r._3, r._2)).map(_._3)
      val n = cs.length.toLong
      val tot = cs.sum
      val rankMass = cs.zipWithIndex.map { case (c, i) => (i + 1L) * c }.sum
      (t, n, tot, 2 * rankMass - (n + 1) * tot, n * tot)
    }.toSet
    val got = graft.queries.CurationQueries.q126(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got === expect)
    // Gini lives in [0, 1) — in fixed-point ppm, [0, 1e6); and the ppm
    // column is exactly floor(1e6·num/den) of the exact integer pair
    graft.queries.CurationQueries.q126(spark, sf).collect().foreach { r =>
      val g = r.getLong(5)
      assert(g >= 0L && g < 1000000L, s"gini_ppm out of range: $g")
      assert(g === math.floor(1e6 * r.getLong(3).toDouble / r.getLong(4).toDouble).toLong)
    }
  }

  test("q127 heatmap: calendar cells cover every event exactly once") {
    val out = graft.queries.CurationQueries.q127(spark, sf).collect()
    val total = graft.sources.Tables.events(spark, sf).count()
    assert(out.map(_.getLong(3)).sum === total)
    out.foreach { r =>
      assert(r.getInt(1) >= 1 && r.getInt(1) <= 7)
      assert(r.getInt(2) >= 0 && r.getInt(2) <= 23)
    }
    // the engine-proof arithmetic keys must agree with the calendar
    // builtins under the UTC session (epoch day 0 = Thursday → dow 5
    // on the 1=Sunday convention) — pins the (day+4)%7+1 derivation
    val mism = graft.sources.Tables.events(spark, sf)
      .select(
        expr("CAST((unix_micros(ts) div 86400000000 + 4) % 7 + 1 AS INT)").as("adow"),
        dayofweek(col("ts")).as("cdow"),
        expr("CAST(unix_micros(ts) div 3600000000 % 24 AS INT)").as("ahr"),
        hour(col("ts")).as("chr"))
      .filter(col("adow") =!= col("cdow") || col("ahr") =!= col("chr"))
      .count()
    assert(mism === 0L, "arithmetic dow/hr diverged from the calendar builtins")
  }

  test("q128 changepoint: CUSUM argmax equals a driver recomputation") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).cast("string")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expect = ev.groupBy(_._1).map { case (t, rows) =>
      val daily = rows.groupBy(_._2).map { case (d, rs) => (d, rs.size.toLong) }
        .toSeq.sortBy(_._1)
      val nDays = daily.size.toLong
      val nTotal = daily.map(_._2).sum
      var s = 0L
      val cusum = daily.map { case (d, n) => s += n * nDays - nTotal; (d, s) }
      val (day, sAt) = cusum.minBy { case (d, v) => (-math.abs(v), d) }
      (t, day, sAt, math.abs(sAt), nDays, nTotal)
    }.toSet
    val got = graft.queries.CurationQueries.q128(spark, sf)
      .select(col("event_type"), col("change_day").cast("string"),
        col("cusum_s"), col("cusum_abs"), col("n_days"), col("n_total"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got === expect)
    // S over the full period telescopes to zero by construction, so a
    // nonzero argmax means a genuine mid-period level shift
    expect.foreach { case (t, _, _, sAbs, nDays, _) =>
      assert(nDays > 1 && sAbs >= 0, s"degenerate period for $t")
    }
  }

  test("containmentPairs equals brute force on random corpora (seeded)") {
    val s3 = spark
    import s3.implicits._
    val rnd = new scala.util.Random(7L)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    (1 to 5).foreach { round =>
      val docs = (1L to 12L).map { id =>
        val n = 4 + rnd.nextInt(10)
        (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val sets = docs.map { case (id, t) =>
        id -> t.split(" ").toSeq.sliding(3).filter(_.size == 3)
          .map(_.mkString(" ")).toSet
      }.toMap
      val expect = (for {
        a <- docs.map(_._1); b <- docs.map(_._1) if a < b
        ni = sets(a).intersect(sets(b)).size
        if ni >= 0.7 * math.min(sets(a).size, sets(b).size) && ni > 0
      } yield (a, b, ni.toLong)).toSet
      val got = graft.operators.Dedup
        .containmentPairs(docs.toDF("doc_id", "text"), "doc_id", "text", 3, 0.7)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === expect, s"random corpus #$round diverged from brute force")
    }
  }

  test("containment screen census gate flips with the dial, output unchanged") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") % 4 === 0)
    def run(): Set[(Long, Long, Long)] = graft.operators.Dedup
      .containmentPairs(docs, "doc_id", "text", 4, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val key = "graft.dedup.screenMinCandidatesPerDoc"
    val withScreen = try { spark.conf.set(key, "0"); run() }
    finally spark.conf.unset(key)
    val withoutScreen = try { spark.conf.set(key, "1e18"); run() }
    finally spark.conf.unset(key)
    assert(withScreen === withoutScreen,
      "the census gate is performance-only: the screen is a pre-filter")
    val defaulted = run()
    assert(defaulted === withScreen)
  }

  test("targetPairsPerTask: wall budget over measured pair cost; dials win") {
    // defaults: 2000 ms / 500 ns = 4.0e6 pairs per task (within 5% of
    // the historical flat 4·2^20 — tunings and censuses unchanged)
    assert(graft.operators.Dedup.targetPairsPerTask(spark) === 4000000L)
    // a slower measured per-pair cost shrinks the task target
    val slow = try {
      spark.conf.set("graft.dedup.measuredNanosPerPair", "2000")
      graft.operators.Dedup.targetPairsPerTask(spark)
    } finally spark.conf.unset("graft.dedup.measuredNanosPerPair")
    assert(slow === 1000000L)
    // a bigger wall budget grows it
    val wide = try {
      spark.conf.set("graft.dedup.targetTaskMillis", "4000")
      graft.operators.Dedup.targetPairsPerTask(spark)
    } finally spark.conf.unset("graft.dedup.targetTaskMillis")
    assert(wide === 8000000L)
    // the explicit pairs dial overrides the derivation entirely
    val explicit = try {
      spark.conf.set("graft.dedup.targetPairsPerTask", "123")
      spark.conf.set("graft.dedup.measuredNanosPerPair", "2000")
      graft.operators.Dedup.targetPairsPerTask(spark)
    } finally {
      spark.conf.unset("graft.dedup.targetPairsPerTask")
      spark.conf.unset("graft.dedup.measuredNanosPerPair")
    }
    assert(explicit === 123L)
  }

  test("posting cap budget: largest affordable rung, legacy floor when broke") {
    val masses = graft.operators.Dedup.PostingCapLadder.zipWithIndex
      .map { case (c, i) => c -> (i + 1) * 100L } // ascending mass per rung
    // budget admits the first four rungs → pick the fourth (largest ≤ 400)
    assert(graft.operators.Dedup.postingCapForBudget(masses, 400L) ===
      (4096L, 400L))
    // budget admits everything → top rung
    assert(graft.operators.Dedup.postingCapForBudget(masses, Long.MaxValue)._1
      === 1048576L)
    // budget below even the floor rung's mass → legacy 64, never lower
    assert(graft.operators.Dedup.postingCapForBudget(masses, 1L) ===
      (64L, 100L))
  }

  test("containment pair budget prunes hot shingles; big budget restores them") {
    val s2 = spark
    import s2.implicits._
    // 80 near-identical docs (4 of each one's 5 shingles shared, df=80
    // each — containment 4/5 ≥ 0.5, so every hot pair QUALIFIES) plus a
    // genuine containment pair on cold grams. The ladder floor (64)
    // cannot admit df=80, so any budget below the 256-rung mass excludes
    // the hot shingles — and the 3160 hot pairs VISIBLY vanish from the
    // output — while a budget that affords the 256 rung restores them.
    // (An earlier fixture's hot pairs failed verification either way, so
    // a regression that ignored the budget entirely still passed.)
    val docs = ((1L to 80L).map(i => (i, s"x y z a b c t$i")) :+
      (100L, "p q r s t") :+ (101L, "p q r s t extra")).toDF("doc_id", "text")
    def run(): Set[(Long, Long)] = graft.operators.Dedup
      .containmentPairs(docs, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val key = "graft.dedup.maxContainmentPairs"
    val broke = try { spark.conf.set(key, "100"); run() }
    finally spark.conf.unset(key)
    val rich = try { spark.conf.set(key, "1000000"); run() }
    finally spark.conf.unset(key)
    val coldPair = (100L, 101L)
    val hotPairs = (for {
      a <- 1L to 80L; b <- (a + 1) to 80L
    } yield (a, b)).toSet
    assert(broke === Set(coldPair),
      "under-budget run must keep only the cold-shingle pair")
    assert(rich === hotPairs + coldPair,
      "an affordable budget must restore the hot-shingle pairs")
    // and an explicit legacy dial still wins over any budget
    val dialed = try {
      spark.conf.set("graft.dedup.maxPostingDf", "80")
      spark.conf.set(key, "1"); run()
    } finally { spark.conf.unset("graft.dedup.maxPostingDf"); spark.conf.unset(key) }
    assert(dialed === hotPairs + coldPair,
      "the explicit posting-df dial must override the budget")
  }

  test("salt gate keys on ADMITTED max df: a pruned hot shingle cannot trip it") {
    val s4 = spark
    import s4.implicits._
    // one boilerplate 3-gram shared by 40 docs (df=40, pair mass 780)
    // plus cold grams (df<=2, mass<=1 per shingle)
    val docs = ((1L to 40L).map(i => (i, s"x y z u$i v$i w$i")) :+
      (100L, "p q r s t") :+ (101L, "p q r s t tail")).toDF("doc_id", "text")
    def planOf(): String = {
      val df = graft.operators.Dedup
        .containmentPairs(docs, "doc_id", "text", 3, 0.5)
      df.queryExecution.executedPlan.toString
    }
    val keys = Seq("graft.dedup.maxPostingDf" -> "8",
      "graft.dedup.targetPairsPerTask" -> "100")
    // cap=8 PRUNES the df=40 shingle: admitted max df is 2, mass 1 <=
    // target, so the legacy semi-join shape must stand — no explode.
    // Under the old min(cap, global max df) gate this flipped salted.
    val coldPlan = try {
      keys.foreach { case (k, v) => spark.conf.set(k, v) }; planOf()
    } finally keys.foreach { case (k, _) => spark.conf.unset(k) }
    assert(!coldPlan.contains("__salt"),
      "pruned hot shingle must not trip the salted shape")
    // cap=64 ADMITS it: mass 780 > target 100 — salted shape engages
    val hotKeys = Seq("graft.dedup.maxPostingDf" -> "64",
      "graft.dedup.targetPairsPerTask" -> "100")
    val hotPlan = try {
      hotKeys.foreach { case (k, v) => spark.conf.set(k, v) }; planOf()
    } finally hotKeys.foreach { case (k, _) => spark.conf.unset(k) }
    assert(hotPlan.contains("__salt"),
      "an admitted hot shingle must engage the salted shape")
  }

  test("containment salted posting join equals brute force under a tiny target") {
    val s3 = spark
    import s3.implicits._
    val rnd = new scala.util.Random(11L)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    val docs = (1L to 15L).map { id =>
      val nw = 4 + rnd.nextInt(8)
      (id, Seq.fill(nw)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val sets = docs.map { case (id, t) =>
      id -> t.split(" ").toSeq.sliding(3).filter(_.size == 3)
        .map(_.mkString(" ")).toSet
    }.toMap
    val expect = (for {
      a <- docs.map(_._1); b <- docs.map(_._1) if a < b
      ni = sets(a).intersect(sets(b)).size
      if ni >= 0.6 * math.min(sets(a).size, sets(b).size) && ni > 0
    } yield (a, b)).toSet
    // target=1 forces g(df) > 1 on every shared shingle — the salted
    // replication path — and must not lose or duplicate any pair
    val got = try {
      spark.conf.set("graft.dedup.targetPairsPerTask", "1")
      graft.operators.Dedup
        .containmentPairs(docs.toDF("doc_id", "text"), "doc_id", "text", 3, 0.6)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    } finally spark.conf.unset("graft.dedup.targetPairsPerTask")
    assert(got === expect, "salted posting join diverged from brute force")
  }

  test("bpe encodeWord: merges apply lowest-rank-first, all occurrences at once") {
    val ranks = Map(("a", "b") -> 1, ("ab", "c") -> 2, ("c", "d") -> 3)
    assert(BpeEncoder.encodeWord("abcd", ranks).toSeq === Seq("abc", "d"))
    // rank 1 consumes both 'ab's before rank 3 can see 'cd'
    assert(BpeEncoder.encodeWord("abab", ranks).toSeq === Seq("ab", "ab"))
    assert(BpeEncoder.encodeWord("xyz", ranks).toSeq === Seq("x", "y", "z"))
    assert(BpeEncoder.encodeWord("", ranks).toSeq === Seq.empty)
  }

  test("q118: encoding the training corpus reproduces the trainer's final symbols") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val mergeRows = BpeTrainer.learn(docs, "text", 12).orderBy("rank").collect()
    val merges = mergeRows.map(r => (r.getString(1), r.getString(2))).toSeq
    val ranks = merges.zipWithIndex.map { case (p, i) => p -> (i + 1) }.toMap
    // trainer replay on the word-frequency table = encoder output per word
    val words = docTokens.values.flatten.toSeq.distinct
    words.foreach { w =>
      var syms: Array[String] = w.map(_.toString).toArray
      merges.foreach { case (l, r) =>
        val ns = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
            ns += l + r; i += 2
          } else { ns += syms(i); i += 1 }
        }
        syms = ns.toArray
      }
      assert(BpeEncoder.encodeWord(w, ranks).toSeq === syms.toSeq,
        s"encode('$w') must equal the trainer's replace-all replay")
    }
    // corpus-level invariants from the summary frame
    val out = graft.queries.CurationQueries.q118(spark, sf).collect()
    val toks = docTokens
    out.foreach { r =>
      val ws = toks(r.getLong(0))
      assert(r.getLong(1) === ws.length.toLong)
      val chars = ws.map(_.length).sum.toLong
      assert(r.getLong(2) <= chars && r.getLong(2) >= r.getLong(1),
        "token count bounded by chars below, words above")
      assert(r.getLong(3) <= r.getLong(2))
    }
    // with no merges, every token is a single character
    val plain = BpeEncoder.encode(docs, "doc_id", "text", Seq.empty).collect()
    plain.foreach { r =>
      val chars = toks(r.getLong(0)).map(_.length).sum.toLong
      assert(r.getLong(2) === chars && r.getLong(3) === 0L)
    }
    // the token STREAM aggregates back to the summary, with dense positions
    val stream = BpeEncoder.encodeTokens(docs, "doc_id", "text", merges)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), min("pos").as("mn"), max("pos").as("mx"),
        sum(when(length(col("token")) > 1, 1L).otherwise(0L)).as("n_fused"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getAs[Int]("mn"), r.getAs[Int]("mx"), r.getLong(4))).toMap
    out.foreach { r =>
      if (r.getLong(2) > 0) {
        val (nt, mn, mx, nf) = stream(r.getLong(0))
        assert(nt === r.getLong(2) && nf === r.getLong(3),
          "token stream must aggregate to the summary")
        assert(mn === 0 && mx.toLong === nt - 1, "positions must be dense from 0")
      }
    }
  }
}
