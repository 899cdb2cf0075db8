package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** PROPERTY-BASED recall proof for m8's 4×16-bit band decomposition:
  * for ANY 64-bit hash pair within Hamming distance 3, at least one
  * band must match (the pigeonhole claim the banded join's exactness
  * rests on), and for any pair past the threshold the verification
  * filter must reject — so end-to-end the banded join returns exactly
  * the ≤3 pairs, on random inputs rather than the corpus' handful.
  * (MultimodalSpec's banded ≡ naive test pins the Spark expressions to
  * this arithmetic on real data; this spec pins the math itself.)
  * Pure JVM — no Spark session. */
class BandingPropertySpec extends AnyFunSuite {

  // the same packing/band arithmetic m8PhashNeardup's Column expressions
  // compute: two non-negative 32-bit words, four 16-bit band values
  private def bands(hi: Long, lo: Long): Seq[Long] =
    Seq((hi >>> 16) & 0xffffL, hi & 0xffffL, (lo >>> 16) & 0xffffL, lo & 0xffffL)

  private def hamming(h1: (Long, Long), h2: (Long, Long)): Int =
    java.lang.Long.bitCount(h1._1 ^ h2._1) + java.lang.Long.bitCount(h1._2 ^ h2._2)

  private def flip(h: (Long, Long), bit: Int): (Long, Long) =
    if (bit < 32) (h._1 ^ (1L << bit), h._2) else (h._1, h._2 ^ (1L << (bit - 32)))

  private var seed = Seed(20260815L)
  private def next[T](g: Gen[T]): T = {
    var out: Option[T] = None
    while (out.isEmpty) { seed = seed.next; out = g(Gen.Parameters.default, seed) }
    out.get
  }

  private val genHash: Gen[(Long, Long)] = for {
    hi <- Gen.chooseNum(0L, 0xffffffffL)
    lo <- Gen.chooseNum(0L, 0xffffffffL)
  } yield (hi, lo)

  private def genFlips(k: Int): Gen[Set[Int]] =
    Gen.pick(k, 0 until 64).map(_.toSet)

  test("≤3 flipped bits always leave at least one of the 4 bands intact (2000 random cases)") {
    for (_ <- 1 to 2000) {
      val h = next(genHash)
      val k = next(Gen.chooseNum(0, 3))
      val flipped = next(genFlips(k)).foldLeft(h)(flip)
      assert(hamming(h, flipped) === k)
      val shared = bands(h._1, h._2).zip(bands(flipped._1, flipped._2))
        .count { case (a, b) => a == b }
      assert(shared >= 1,
        s"pigeonhole violated: $h vs $flipped at hamming $k shares no band")
    }
  }

  test("two-word Hamming arithmetic ≡ a per-bit reference across the whole flip range (4000 random cases)") {
    // pins the PACKING side the pigeonhole test takes for granted: the
    // word-split XOR+popcount (the arithmetic the Spark verify filter
    // and this spec's own hamming() compute) must equal a bit-by-bit
    // count over the 64 logical dHash positions — a packing/shift bug
    // (wrong word boundary, sign-extended shift, swapped words) breaks
    // THIS even when each word's popcount is individually right. Also
    // confirms flips past the threshold keep producing band collisions
    // (the candidate class only the Hamming verify removes).
    def bitAt(h: (Long, Long), b: Int): Long =
      if (b < 32) (h._1 >>> b) & 1L else (h._2 >>> (b - 32)) & 1L
    var pastThresholdCandidates = 0
    for (_ <- 1 to 4000) {
      val h = next(genHash)
      val k = next(Gen.chooseNum(0, 64))
      val flipped = next(genFlips(k)).foldLeft(h)(flip)
      val perBit = (0 until 64).count(b => bitAt(h, b) != bitAt(flipped, b))
      assert(hamming(h, flipped) === perBit, s"word-split vs per-bit at k=$k")
      assert(perBit === k, s"flip construction must move exactly k=$k bits")
      val shared = bands(h._1, h._2).zip(bands(flipped._1, flipped._2))
        .count { case (a, b) => a == b }
      if (shared >= 1 && k > 3) pastThresholdCandidates += 1
    }
    assert(pastThresholdCandidates > 0,
      "degenerate test: no past-threshold pair ever collided in a band — " +
        "the verify filter's precision role is never exercised")
  }
}
