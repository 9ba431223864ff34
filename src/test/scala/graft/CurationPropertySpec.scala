package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{BinHistogram, BpeEncoder, BpeTrainer}

/** Property-based invariants for the round-7 operator ALGEBRA —
  * exercised directly, no Spark session, over arbitrary inputs and
  * merge orders (the HeavyHittersPropertySpec pattern; raw scalacheck
  * Gen with fixed seeds — the scalatestplus bridge isn't in the
  * offline dependency cache).
  */
class CurationPropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i =>
      g.apply(Gen.Parameters.default.withSize(60), Seed(4321L + i)))

  // --- BPE: encode over arbitrary corpora and learned merge tables ---

  private val wordGen: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))

  private val corpusGen: Gen[List[String]] =
    Gen.chooseNum(1, 30).flatMap(n => Gen.listOfN(n, wordGen))

  test("bpe: encoding with learned merges equals the trainer's sequential replay") {
    samples(corpusGen, 40).foreach { corpus =>
      val wf = corpus.groupBy(identity).map { case (w, ws) =>
        (w.map(_.toString).toArray, ws.size.toLong)
      }.toArray
      val merges = BpeTrainer.learnFromWordFreq(wf, 8)
        .map(m => (m.left, m.right))
      val ranks = merges.zipWithIndex.map { case (p, i) => p -> (i + 1) }.toMap
      corpus.distinct.foreach { w =>
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
          s"lowest-rank-first must equal sequential replay for '$w'")
      }
    }
  }

  test("bpe: token concatenation reproduces the word, for any rank map") {
    val ranksGen: Gen[Map[(String, String), Int]] =
      Gen.listOfN(6, for {
        l <- Gen.oneOf("a", "b", "c", "ab", "bc", "cd")
        r <- Gen.oneOf("a", "b", "c", "d", "ab", "cd")
      } yield (l, r)).map(_.distinct.zipWithIndex.map { case (p, i) => p -> (i + 1) }.toMap)
    samples(Gen.zip(wordGen, ranksGen), 150).foreach { case (w, ranks) =>
      val toks = BpeEncoder.encodeWord(w, ranks)
      assert(toks.mkString === w, "BPE is a segmentation — lossless by construction")
      assert(toks.forall(_.nonEmpty))
    }
  }

  // --- BinHistogram: merge-tree independence, mass conservation ---

  private val binStreamGen: Gen[List[Long]] =
    Gen.chooseNum(0, 400).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-5L, 30L)))

  test("histogram: any partition split and merge order yields the same summary") {
    val agg = new BinHistogram.HistAgg(20)
    samples(Gen.zip(binStreamGen, Gen.chooseNum(1, 7)), 60).foreach {
      case (stream, nParts) =>
        val sequential = stream.foldLeft(agg.zero)(agg.reduce)
        val parts = stream.grouped(math.max(1, (stream.size + nParts - 1) / nParts))
          .map(_.foldLeft(agg.zero)(agg.reduce)).toList
        val merged = parts match {
          case Nil     => agg.zero
          case p :: ps => ps.foldLeft(p)(agg.merge)
        }
        assert(agg.finish(merged) === agg.finish(sequential))
        val s = agg.finish(sequential)
        assert(s.n === stream.size.toLong, "mass conserved")
        assert(s.bins.sum === s.n, "every input lands in exactly one bin")
        // clamping: out-of-range values land in the edge bins
        val below = stream.count(_ < 0)
        val above = stream.count(_ >= 20)
        assert(s.bins.head >= below && s.bins.last >= above)
    }
  }

  test("histogram: drift numerator is zero iff the distributions are proportional") {
    val agg = new BinHistogram.HistAgg(10)
    samples(binStreamGen.suchThat(_.nonEmpty), 40).foreach { stream =>
      val h = agg.finish(stream.foldLeft(agg.zero)(agg.reduce))
      // doubling every count is the same distribution — exact zero drift
      val doubled = h.bins.map(_ * 2)
      val num = h.bins.indices.map(i =>
        math.abs(h.bins(i) * doubled.sum - doubled(i) * h.n)).sum
      assert(num === 0L, "proportional histograms must show zero TV numerator")
    }
  }
}
