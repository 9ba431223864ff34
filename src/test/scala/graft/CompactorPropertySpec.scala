package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants for the two round-9 primitives whose
  * guarantees must hold for ANY input, not just the test tables:
  * Compactor's prefix-sum bin assignment (checked here against a
  * direct sequential packer) and NgramOps.charNgrams (checked against
  * a code-point sliding window over arbitrary unicode, including
  * 4-byte astral code points). (Raw scalacheck Gen with fixed seeds — the
  * scalatestplus bridge isn't in the offline dependency cache.)
  */
class CompactorPropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i =>
      g.apply(Gen.Parameters.default.withSize(60), Seed(77L + i)))

  // --- Compactor.plan's bin rule, checked as pure arithmetic: the
  // greedy packer that walks chunks in order and opens a new bin when
  // the running payload would pass the target must produce EXACTLY
  // bin = cum_before DIV target (what the window computes). This is the
  // algebraic identity that lets the plan run as one prefix-sum window
  // instead of a sequential loop.
  private val chunksGen: Gen[List[Long]] = for {
    n <- Gen.choose(1, 60)
    sizes <- Gen.listOfN(n, Gen.choose(1L, 500000L))
  } yield sizes

  test("prefix-sum bin = the sequential greedy packer, for any chunk sizes") {
    for {
      sizes <- samples(chunksGen, 40)
      target <- Seq(1L, 1000L, 262144L)
    } {
      // sequential reference: fill bins in order, never splitting
      var cum = 0L
      val viaWindow = sizes.map { sz =>
        val bin = cum / target
        cum += sz
        bin
      }
      var curBin = 0L
      var binStart = 0L // cum bytes at the current bin's opening
      var cum2 = 0L
      val viaGreedy = sizes.map { sz =>
        // a chunk belongs to the bin whose [k*target, (k+1)*target)
        // interval its starting offset falls in
        if (cum2 - binStart >= target) {
          curBin += (cum2 - binStart) / target
          binStart += ((cum2 - binStart) / target) * target
        }
        cum2 += sz
        curBin
      }
      assert(viaWindow === viaGreedy, s"target=$target sizes=$sizes")
      // bins are nondecreasing and start at 0
      assert(viaWindow.head === 0L)
      assert(viaWindow.zip(viaWindow.tail).forall { case (a, b) => a <= b })
      // every bin's payload is < target + its last chunk (never splits)
      sizes.zip(viaWindow).groupBy(_._2).values.foreach { cs =>
        val total = cs.map(_._1).sum
        assert(total < target + cs.map(_._1).max)
      }
    }
  }

  // --- charNgrams vs a code-point sliding window over arbitrary
  // strings drawn from a unicode alphabet with 1-, 2-, 3-, AND 4-byte
  // UTF-8 code points (the 4-byte astral char is a UTF-16 surrogate
  // pair — String.sliding would split it; both engines count it as
  // one char, so the reference must walk code points).
  private val alphabetCps: Seq[String] =
    "ab \tzé√ß中本語0😀𝕏".codePoints().toArray
      .map(cp => new String(Character.toChars(cp))).toSeq

  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 80)
    cs <- Gen.listOfN(n, Gen.oneOf(alphabetCps))
  } yield cs.mkString

  test("charNgrams equals the code-point sliding window for any text and n") {
    import org.apache.spark.unsafe.types.UTF8String
    for {
      text <- samples(textGen, 60)
      n <- 1 to 5
    } {
      val got = graft.functions.NgramOps
        .charNgrams(UTF8String.fromString(text), n)
      val gotList = (0 until got.numElements())
        .map(i => got.getUTF8String(i).toString).toList
      val want = text.codePoints().toArray
        .map(cp => new String(Character.toChars(cp))).toList
        .sliding(n).filter(_.length == n).map(_.mkString).toList
      assert(gotList === want, s"n=$n text='$text'")
    }
  }
}
