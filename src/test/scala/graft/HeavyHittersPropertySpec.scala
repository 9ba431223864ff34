package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.HeavyHitters.{MGBuf, MisraGries}

/** Property-based invariants for the Misra-Gries sketch ALGEBRA —
  * exercised directly on reduce/merge (no Spark session needed), over
  * arbitrary streams, widths, and partition splits. The Spark-side specs
  * (CorpusSpec, StreamingSpec) check the wired queries; this one checks
  * that the summary's guarantees hold for ANY merge tree, which is what
  * makes the Aggregator safe under Spark's nondeterministic partial
  * aggregation order. (Raw scalacheck Gen with fixed seeds — the
  * scalatestplus bridge isn't in the offline dependency cache.)
  */
class HeavyHittersPropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i =>
      g.apply(Gen.Parameters.default.withSize(60), Seed(1234L + i)))

  // a skewed stream: few hot keys + a long tail, in arbitrary order
  private val streamGen: Gen[List[String]] = for {
    hotMass <- Gen.choose(50, 300)
    tailMass <- Gen.choose(50, 500)
    hot = List.fill(hotMass)(List("h1", "h2")).flatten
    tail = (0 until tailMass).map(i => s"t${i % 97}").toList
    shuffled <- scalacheckShuffle(hot ++ tail)
  } yield shuffled

  // Gen.pick-based deterministic shuffle
  private def scalacheckShuffle[A](xs: List[A]): Gen[List[A]] =
    Gen.choose(0L, Long.MaxValue).map { s =>
      new scala.util.Random(s).shuffle(xs)
    }

  private val widthGen: Gen[Int] = Gen.choose(1, 40)

  /** Fold a stream through reduce with an arbitrary partition split and
    * an arbitrary (left-leaning vs balanced) merge tree.
    */
  private def sketchOf(mg: MisraGries, stream: List[String],
                       nParts: Int, balanced: Boolean): MGBuf = {
    val parts = stream.grouped(math.max(1, stream.size / nParts)).toList
    val partials = parts.map(p => p.foldLeft(mg.zero)(mg.reduce))
    if (partials.isEmpty) mg.zero
    else if (balanced) partials.reduce(mg.merge)
    else partials.foldLeft(mg.zero)(mg.merge)
  }

  test("superset + lower-bound + width invariants hold for any stream, width, and merge tree") {
    val gen = for {
      stream <- streamGen
      width <- widthGen
      nParts <- Gen.choose(1, 7)
      balanced <- Gen.oneOf(true, false)
    } yield (stream, width, nParts, balanced)

    samples(gen, 40).foreach { case (stream, width, nParts, balanced) =>
      val mg = new MisraGries(width)
      val buf = sketchOf(mg, stream, nParts, balanced)
      val summary = mg.finish(buf)
      val exact = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val n = stream.size.toLong
      val bound = n.toDouble / (width + 1)

      assert(summary.n === n, "stream length must be preserved")
      assert(summary.counts.size <= width, "summary must stay width-bounded")
      summary.counts.foreach { case (k, c) =>
        val ex = exact.getOrElse(k, 0L)
        assert(c <= ex, s"$k: stored $c exceeds exact $ex — not a lower bound")
        assert(c >= ex - bound,
          s"$k: stored $c under-counts exact $ex past n/(width+1)=$bound")
      }
      exact.foreach { case (k, ex) =>
        if (ex > bound)
          assert(summary.counts.contains(k),
            s"$k has exact count $ex > $bound but is missing — superset violated")
      }
    }
  }

  test("merging with an empty partial is identity on the counts") {
    val mg = new MisraGries(8)
    val buf = List("a", "a", "b").foldLeft(mg.zero)(mg.reduce)
    val viaEmptyRight = mg.finish(mg.merge(buf, mg.zero))
    assert(viaEmptyRight.counts === Map("a" -> 2L, "b" -> 1L))
    val buf2 = List("a", "a", "b").foldLeft(mg.zero)(mg.reduce)
    val viaEmptyLeft = mg.finish(mg.merge(mg.zero, buf2))
    assert(viaEmptyLeft.counts === Map("a" -> 2L, "b" -> 1L))
  }
}
