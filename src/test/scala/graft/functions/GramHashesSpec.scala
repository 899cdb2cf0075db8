package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.PolyHash.polyHashFast
import graft.functions.TextFunctions.P31

/** The native GramHashes expression (one pass over the text bytes) must
  * be element-for-element identical to the HOF chain it replaced in the
  * span-dedup gram stage — `transform(sequence(0, n_toks − k), j =>
  * polyHash(concat_ws(" ", slice(toks, j+1, k))))` — including the
  * byte-level edge cases its substring identity relies on: runs of
  * spaces (empty tokens), leading/trailing spaces, multi-byte UTF-8,
  * and texts shorter than k tokens. Likewise the 2-gram Shingles swap
  * in t13 must reproduce the zip_with bigram strings. */
class GramHashesSpec extends SparkSpec {

  private val fixtures = Seq(
    "the quick brown fox jumps over the lazy dog again and again and again",
    "a b c d e f g h i j",            // exactly k tokens for k=10
    "a b c d e f g h i",              // one short of k=10
    "",                               // empty text
    "single",                         // one token
    "double  space   runs hide empty tokens a b c d e f",
    " leading and trailing spaces pad the token list a b c ",
    "unicode tökens — mixed ∂elta bytes £ ¥ § ® a b c d",
    "x " * 40 + "x"                   // long repetitive text
  )

  test("gramHashesFast == transform(slice+concat_ws+polyHash) chain") {
    import spark.implicits._
    for (k <- Seq(2, 3, 10)) {
      val df = fixtures.toDF("text")
        .select(col("text"), split(col("text"), " ", -1).as("toks"))
      val fast = df.select(col("text"),
        Shingles.gramHashesFast(col("text"), k, P31).as("hs"))
      val hof = df.select(col("text"),
        when(size(col("toks")) >= k,
          transform(sequence(lit(0), size(col("toks")) - k),
            j => polyHashFast(
              concat_ws(" ", slice(col("toks"), j + 1, lit(k))), P31)))
          .otherwise(array().cast("array<bigint>")).as("hs"))
      val pairs = fast.as("f").join(hof.as("h"), "text")
        .select(col("f.hs").as("fh"), col("h.hs").as("hh")).collect()
      pairs.foreach { r =>
        assert(r.getSeq[Long](0) === r.getSeq[Long](1), s"k=$k")
      }
    }
  }

  test("2-gram shinglesFast == zip_with bigram chain (t13's swap)") {
    import spark.implicits._
    val df = fixtures.toDF("text")
    val toks = split(col("text"), " ")
    val n = size(toks)
    val hofBigrams = zip_with(
      slice(toks, lit(1), greatest(n - 1, lit(0))),
      slice(toks, lit(2), greatest(n - 1, lit(0))),
      (a, b) => concat_ws(" ", a, b))
    val rows = df.select(
      Shingles.shinglesFast(col("text"), 2).as("fast"),
      hofBigrams.as("hof")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1))
    }
  }
}
