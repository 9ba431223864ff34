package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KmvSketch.{KmvAgg, KmvSummary}

/** Property-based invariants for the KMV sketch algebra, driven directly
  * on reduce/merge (no Spark session). The load-bearing property is
  * MERGE-TREE INDEPENDENCE: the k smallest of a set do not depend on
  * arrival order, partitioning, or merge shape — the sketch from any
  * split is BIT-IDENTICAL to the single-fold sketch, which is what makes
  * the Aggregator deterministic (and q101 oracle-checkable) under
  * Spark's partial aggregation.
  */
class KmvSketchPropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i =>
      g.apply(Gen.Parameters.default.withSize(60), Seed(777L + i)))

  private def sketch(agg: KmvAgg, xs: Seq[Long], nParts: Int): KmvSummary = {
    val parts = xs.grouped(math.max(1, xs.size / nParts)).toList
    val partials = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
    agg.finish(
      if (partials.isEmpty) agg.zero else partials.reduce(agg.merge))
  }

  test("any partition split yields the bit-identical sketch") {
    val gen = for {
      xs <- Gen.listOf(Gen.choose(Long.MinValue, Long.MaxValue))
      dup <- Gen.someOf(xs) // re-inject duplicates
      k <- Gen.choose(2, 64)
      nParts <- Gen.choose(2, 9)
    } yield (xs ++ dup, k, nParts)
    samples(gen, 40).foreach { case (xs, k, nParts) =>
      val single = sketch(new KmvAgg(k), xs, 1)
      val split = sketch(new KmvAgg(k), xs, nParts)
      assert(single.mins === split.mins, s"merge tree changed the sketch (k=$k)")
      assert(split.mins.size <= k)
      // ascending unsigned, no duplicates
      split.mins.sliding(2).foreach {
        case Seq(a, b) => assert(java.lang.Long.compareUnsigned(a, b) < 0)
        case _ => ()
      }
    }
  }

  test("below capacity every count and set operation is exact") {
    val gen = for {
      a <- Gen.listOf(Gen.choose(0L, 400L))
      b <- Gen.listOf(Gen.choose(200L, 600L))
    } yield (a, b)
    samples(gen, 30).foreach { case (a, b) =>
      val agg = new KmvAgg(2048) // far above the value range: exact regime
      // hash stand-in: values used directly (KMV only needs distinct longs)
      val ka = sketch(agg, a, 3)
      val kb = sketch(agg, b, 4)
      assert(ka.distinct === a.distinct.size.toDouble)
      assert(kb.distinct === b.distinct.size.toDouble)
      val (u, o) = ka.setOps(kb)
      assert(u === (a ++ b).distinct.size.toDouble)
      assert(o === a.toSet.intersect(b.toSet).size.toDouble)
    }
  }

  test("at capacity the distinct estimate lands within sketch error") {
    // uniform 64-bit hashes (seeded) — the regime the estimator assumes;
    // k=256 → stderr ~1/sqrt(254) ≈ 6.3%; assert 4 sigma for the fixed seeds
    val rng = new scala.util.Random(42L)
    val truth = 20000
    val xs = Seq.fill(truth)(rng.nextLong()).distinct
    val est = sketch(new KmvAgg(256), xs, 8).distinct
    val rel = math.abs(est - xs.size) / xs.size
    assert(rel < 0.25, s"estimate $est vs ${xs.size}: rel error $rel")
  }
}
