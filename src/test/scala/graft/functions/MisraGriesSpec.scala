package graft.functions

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.MisraGriesAgg.misraGries

/** Misra–Gries summary: the superset guarantee (every item with true
  * frequency > n/k survives) and the bounded-buffer contract — the two
  * properties t14 builds its exact two-pass heavy hitters on. Exercised
  * on SKEWED streams (the synthetic corpus is uniform, so the sketch's
  * discriminating behavior — candidates ≪ vocabulary — only shows here),
  * across partition counts to also pin merge correctness. */
class MisraGriesSpec extends SparkSpec {

  /** Zipf-ish skewed stream: item i has weight ~ 1/(i+1). */
  private def zipfStream(n: Int, vocab: Int, seed: Long): Seq[String] = {
    val rnd = new Random(seed)
    val weights = Array.tabulate(vocab)(i => 1.0 / (i + 1))
    val cum = weights.scanLeft(0.0)(_ + _).tail
    val total = cum.last
    Seq.fill(n) {
      val x = rnd.nextDouble() * total
      val i = cum.indexWhere(_ >= x)
      s"item_${if (i < 0) vocab - 1 else i}"
    }
  }

  private def exactCounts(xs: Seq[String]): Map[String, Long] =
    xs.groupBy(identity).view.mapValues(_.size.toLong).toMap

  for (parts <- Seq(1, 4, 13); k <- Seq(10, 50)) {
    test(s"superset guarantee holds (parts=$parts, k=$k)") {
      val s = spark
      import s.implicits._
      val xs = zipfStream(20000, 500, seed = 7 * parts + k)
      val n = xs.size.toLong
      val exact = exactCounts(xs)
      val mustSurvive = exact.filter { case (_, c) => c * k > n }.keySet
      val cand = xs.toDF("tok").repartition(parts)
        .agg(misraGries(col("tok"), k).as("cand"))
        .head().getSeq[String](0).toSet
      assert(mustSurvive.subsetOf(cand),
        s"lost heavy hitters: ${mustSurvive -- cand}")
      assert(cand.size <= k - 1, s"buffer bound violated: ${cand.size} >= $k")
    }
  }

  test("sketch discriminates: candidates << vocabulary on skewed data") {
    val s = spark
    import s.implicits._
    val xs = zipfStream(50000, 5000, seed = 42)
    val cand = xs.toDF("tok").repartition(8)
      .agg(misraGries(col("tok"), 20).as("cand"))
      .head().getSeq[String](0).toSet
    val vocab = xs.distinct.size
    assert(cand.size <= 19 && vocab > 1000,
      s"expected <= 19 candidates from a $vocab-type vocabulary, got ${cand.size}")
  }

  test("two-pass heavy hitters are EXACT on skewed data (t14's shape)") {
    val s = spark
    import s.implicits._
    val k = 25
    val xs = zipfStream(30000, 2000, seed = 11)
    val n = xs.size.toLong
    val expected = exactCounts(xs)
      .filter { case (_, c) => c * k > n }
      .toSeq.sortBy { case (t, c) => (-c, t) }
    val toks = xs.toDF("tok").repartition(6)
    val summary = toks.agg(misraGries(col("tok"), k).as("cand"),
      count(lit(1)).as("n"))
    val cand = summary.select(explode(col("cand")).as("tok"), col("n"))
    val got = toks.join(broadcast(cand), "tok")
      .groupBy(col("tok"), col("n"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(k.toLong) > col("n"))
      .select(col("tok"), col("cnt"))
      .orderBy(desc("cnt"), col("tok"))
      .as[(String, Long)].collect().toSeq
    assert(got == expected)
  }

  test("merge keeps at most k-1 survivors and the superset under adversarial splits") {
    // Hand-merge many singleton-partition summaries (worst case for the
    // mergeable path: every update buffer is near-capacity before merge).
    val s = spark
    import s.implicits._
    val k = 8
    val xs = (1 to 1000).map(i => s"rare_$i") ++ Seq.fill(400)("heavy")
    val shuffled = new Random(3).shuffle(xs)
    val n = shuffled.size.toLong
    val cand = shuffled.toDF("tok").repartition(32)
      .agg(misraGries(col("tok"), k).as("cand"))
      .head().getSeq[String](0).toSet
    assert(cand.size <= k - 1)
    assert(cand.contains("heavy"), // freq 400 > 1400/8 = 175
      s"heavy hitter lost after 32-way merge: $cand")
  }
}
