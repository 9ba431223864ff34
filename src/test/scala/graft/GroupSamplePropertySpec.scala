package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GroupSample.{GroupSampleAgg, SampleBuf}

/** Property-based invariants for the GroupSample ALGEBRA — exercised
  * directly on reduce/merge over arbitrary inputs, capacities, and
  * merge trees (same harness style as [[HeavyHittersPropertySpec]]).
  * The wired query (q102) is hash-checked against the exact window
  * oracle by CORRECTNESS; this spec proves the property that makes
  * that equality safe under Spark's nondeterministic partial
  * aggregation: the k smallest pairs are invariant to partitioning and
  * merge-tree shape.
  */
class GroupSamplePropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i =>
      g.apply(Gen.Parameters.default.withSize(60), Seed(4321L + i)))

  // pairs with deliberately colliding keys (small key domain) so the
  // id tiebreak and multiset paths are exercised
  private val pairsGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(0, 400)
    keys <- Gen.listOfN(n, Gen.choose(0L, 50L))
    ids <- Gen.listOfN(n, Gen.choose(0L, 10000L))
  } yield keys.zip(ids)

  private def sketchOf(agg: GroupSampleAgg, xs: List[(Long, Long)],
                       nParts: Int, balanced: Boolean): SampleBuf = {
    val parts = xs.grouped(math.max(1, xs.size / nParts)).toList
    val partials = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
    if (partials.isEmpty) agg.zero
    else if (balanced) partials.reduce(agg.merge)
    else partials.foldLeft(agg.zero)(agg.merge)
  }

  test("sample equals sorted-take-k for any input, capacity, and merge tree") {
    val gen = for {
      xs <- pairsGen
      k <- Gen.choose(1, 30)
      nParts <- Gen.choose(1, 7)
      balanced <- Gen.oneOf(true, false)
    } yield (xs, k, nParts, balanced)

    samples(gen, 200).foreach { case (xs, k, nParts, balanced) =>
      val agg = new GroupSampleAgg(k)
      val got = agg.finish(sketchOf(agg, xs, nParts, balanced)).ids
      val want = xs.sorted.take(k).map(_._2)
      assert(got == want,
        s"k=$k nParts=$nParts balanced=$balanced xs=${xs.take(20)}...")
    }
  }

  test("merge is associative across a three-way split") {
    val gen = for {
      xs <- pairsGen if xs.size >= 3
      k <- Gen.choose(1, 20)
    } yield (xs, k)

    samples(gen, 100).foreach { case (xs, k) =>
      val agg = new GroupSampleAgg(k)
      val third = math.max(1, xs.size / 3)
      val List(a, b, c) =
        List(xs.take(third), xs.slice(third, 2 * third), xs.drop(2 * third))
          .map(p => p.foldLeft(agg.zero)(agg.reduce))
      // (a+b)+c vs a+(b+c): rebuild fresh buffers since merge mutates
      def fold(ps: List[List[(Long, Long)]]) =
        ps.map(p => p.foldLeft(agg.zero)(agg.reduce))
      val List(a1, b1, c1) = fold(List(xs.take(third),
        xs.slice(third, 2 * third), xs.drop(2 * third)))
      val left = agg.finish(agg.merge(agg.merge(a, b), c)).ids
      val right = agg.finish(agg.merge(a1, agg.merge(b1, c1))).ids
      assert(left == right, s"k=$k")
    }
  }
}
