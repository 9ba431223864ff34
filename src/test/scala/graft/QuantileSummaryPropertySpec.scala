package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QuantileSummary.{QBuf, QuantileAgg}

/** Property-based invariants for the quantile-summary ALGEBRA, on
  * reduce/merge directly (no Spark session), over arbitrary streams,
  * capacities, partition splits, and merge trees — the guarantee that
  * makes the Aggregator safe under Spark's nondeterministic partial
  * aggregation. Two regimes:
  *  - n ≤ capacity: EXACT type-1 order statistics for any merge tree
  *    (nothing ever compacts, so the summary is the multiset).
  *  - n > capacity: the answer is a genuine stream element whose true
  *    rank sits within an ε·n envelope of the target (deterministic
  *    Munro-Paterson compaction; ε here is an empirical envelope well
  *    above the theoretical bound for these sizes).
  */
class QuantileSummaryPropertySpec extends AnyFunSuite {

  private val percents = Seq(10, 25, 50, 75, 90, 99)

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i =>
      g.apply(Gen.Parameters.default.withSize(60), Seed(977L + i)))

  private def sketchOf(agg: QuantileAgg, stream: List[Double],
                       nParts: Int, balanced: Boolean): QBuf = {
    val parts = stream.grouped(math.max(1, stream.size / nParts)).toList
    val partials = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
    if (partials.isEmpty) agg.zero
    else if (balanced) partials.reduce(agg.merge)
    else partials.foldLeft(agg.zero)(agg.merge)
  }

  private def exactRank(sorted: Vector[Double], p: Int): Double =
    sorted(((p.toLong * sorted.size + 99L) / 100L).toInt - 1)

  test("below capacity: exact type-1 quantiles for any stream and merge tree") {
    val gen = for {
      n <- Gen.choose(1, 400)
      vals <- Gen.listOfN(n, Gen.choose(-1e6, 1e6))
      nParts <- Gen.choose(1, 7)
      balanced <- Gen.oneOf(true, false)
    } yield (vals, nParts, balanced)

    samples(gen, 40).foreach { case (vals, nParts, balanced) =>
      val agg = new QuantileAgg(512, percents)
      val out = agg.finish(sketchOf(agg, vals, nParts, balanced))
      val sorted = vals.sorted.toVector
      assert(out.n_events === vals.size.toLong)
      percents.zip(out.qs).foreach { case (p, got) =>
        assert(got === exactRank(sorted, p),
          s"p$p of ${vals.size} values must be the exact order statistic")
      }
    }
  }

  test("above capacity: answers are stream elements with bounded rank error") {
    val gen = for {
      n <- Gen.choose(3000, 12000)
      // mix a heavy-tailed and a uniform regime so compaction sees both
      heavy <- Gen.oneOf(true, false)
      nParts <- Gen.choose(1, 9)
      balanced <- Gen.oneOf(true, false)
      seed <- Gen.choose(0L, Long.MaxValue)
    } yield (n, heavy, nParts, balanced, seed)

    samples(gen, 12).foreach { case (n, heavy, nParts, balanced, seed) =>
      val rnd = new scala.util.Random(seed)
      val vals = List.fill(n)(
        if (heavy) math.exp(rnd.nextGaussian() * 3) else rnd.nextDouble())
      val cap = 256
      val agg = new QuantileAgg(cap, percents)
      val out = agg.finish(sketchOf(agg, vals, nParts, balanced))
      val sorted = vals.sorted.toVector
      assert(out.n_events === n.toLong)
      val eps = 0.08 // empirical envelope for c=256, n ≤ 12k (theory ~log²(n/c)/c)
      percents.zip(out.qs).foreach { case (p, got) =>
        assert(sorted.contains(got), s"p$p answer must be a genuine element")
        val target = (p.toLong * n + 99L) / 100L
        // true rank range of the returned value (ties make it a range)
        val lo = sorted.indexWhere(_ >= got) + 1L
        val hi = sorted.lastIndexWhere(_ <= got) + 1L
        assert(lo - eps * n <= target && target <= hi + eps * n,
          s"p$p: returned value's rank [$lo,$hi] misses target $target by > ${eps}n (n=$n)")
      }
    }
  }

  test("weight conservation: count survives any merge tree even with compaction") {
    val vals = List.tabulate(5000)(i => (i * 2654435761L % 100003L).toDouble)
    (1 to 6).foreach { nParts =>
      val agg = new QuantileAgg(64, Seq(50))
      val buf = sketchOf(agg, vals, nParts, balanced = nParts % 2 == 0)
      val totalWeight = (0 until buf.levels.length).map { l =>
        if (buf.levels(l) == null) 0L else buf.sizes(l).toLong << l
      }.sum
      assert(buf.count === 5000L && totalWeight === 5000L,
        "compaction must preserve total weight exactly")
    }
  }
}
