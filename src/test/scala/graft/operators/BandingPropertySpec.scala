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

  test("past-threshold pairs are rejected by the Hamming verify even when a band collides (2000 random cases)") {
    var bandCollisions = 0
    for (_ <- 1 to 2000) {
      val h = next(genHash)
      val k = next(Gen.chooseNum(4, 64))
      val flipped = next(genFlips(k)).foldLeft(h)(flip)
      assert(hamming(h, flipped) === k)
      // a band MAY still collide (that's why the residual check exists) —
      // but the verify filter must classify the pair as past-threshold
      val shared = bands(h._1, h._2).zip(bands(flipped._1, flipped._2))
        .count { case (a, b) => a == b }
      if (shared > 0) bandCollisions += 1
      assert(hamming(h, flipped) > 3, "the verify filter must reject it")
    }
    // the second half of the argument only bites if candidate collisions
    // actually occur past the threshold — make sure the test saw some
    assert(bandCollisions > 0,
      "degenerate test: no past-threshold pair ever collided in a band")
  }
}
