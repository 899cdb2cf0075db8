package graft.operators

import org.apache.spark.sql.Row

import graft.SparkSpec

/** Scale-hygiene proofs for the dedup operators:
  *  - d5's tiled block-nested-loop partitions the pair space exactly:
  *    many small broadcast tiles produce the identical result set as a
  *    single tile covering the whole corpus.
  *  - d2's posting-list frequency cap drops hot-shingle fan-out without
  *    touching pairs whose overlap lives in cold shingles.
  */
class DedupScaleSpec extends SparkSpec {

  test("d5 tiled (many tiles) == d5 single tile, bit-identical") {
    val dir = sf("sf0.001")
    val multi = Dedup.d5EmbedNearDupTiled(spark, dir, tileRows = 64).collect()
    val single = Dedup.d5EmbedNearDupTiled(spark, dir, tileRows = Long.MaxValue).collect()
    assert(multi.length == single.length)
    assert(multi.sameElements(single))
    assert(multi.nonEmpty) // the corpus has planted near-dups; empty would vacuously pass
  }

  test("d5 is memoized: re-construction replays no tile jobs") {
    val dir = sf("sf0.001")
    val a = Dedup.d5EmbedNearDupTiled(spark, dir, tileRows = 64)
    val b = Dedup.d5EmbedNearDupTiled(spark, dir, tileRows = 64)
    assert(a eq b, "same (session, dir, tileRows, fingerprint) must return the cached plan")
  }

  test("d6 ANN prefilter: precision 1 vs exact d5; recall on the planted corpus") {
    val dir = sf("sf0.001")
    val exact = Dedup.d5EmbedNearDupTiled(spark, dir, tileRows = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val ann = Dedup.d6EmbedNearDupAnn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.nonEmpty)
    // exact-cosine re-check with identical fold order + rounding ⇒ every
    // ANN pair is a true pair with the identical score
    assert(ann.subsetOf(exact), s"ANN must be a subset: ${(ann -- exact).take(3)}")
    // this corpus's 0.4 threshold sits near the random-noise floor — the
    // hardest regime for sign-LSH (measured ≈ 0.47 here, ≈ 0.54 at
    // sf0.01; ≥ 0.99 analytically for the realistic ≥ 0.9-cosine
    // near-dup regime). The floor is set ~3σ under the measurement (66
    // pairs ⇒ σ ≈ 0.06 across corpus reseeds) so it fails on a genuine
    // banding regression (recall ≈ 0), not on a regenerated corpus.
    val recall = ann.size.toDouble / exact.size
    assert(recall >= 0.3, s"recall $recall collapsed below the regression floor")
  }

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = tmpDir("graft-capspec")
    import spark.implicits._
    rows.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  test("d2 frequency cap: cold-shingle near-dups survive, hot fan-out is dropped") {
    // Docs 1/2: identical text, all shingles cold (freq 2) -> jac 1.0.
    // Docs 100..299: every one contains the hot phrase "the quick brown fox"
    // (so its shingles have freq 200, far over any reasonable cap) plus a
    // unique tail, so no pair among them reaches 0.8.
    val nearDup = "alpha beta gamma delta epsilon zeta eta theta"
    val corpus = Seq(1L -> nearDup, 2L -> nearDup) ++
      (100L until 300L).map(i => i -> s"the quick brown fox u$i v$i w$i x$i y$i z$i")
    val dir = writeDocs(corpus)

    val uncapped = Dedup.ngramJaccardPairs(spark, dir).collect()
    val capped = Dedup.ngramJaccardPairs(spark, dir, Some(Dedup.D2MaxShingleFreq)).collect()
    assert(uncapped.toSet == capped.toSet)
    assert(capped.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))

    // cap = 1 prunes every posting list (freq >= 2 wherever a pair exists),
    // proving the cap actually gates pair generation.
    assert(Dedup.ngramJaccardPairs(spark, dir, Some(1L)).collect().isEmpty)
  }

  test("d2b oracle-equivalence precondition: corpus max shingle freq below cap") {
    // d2b's oracle assumes d2b == d2 on the test corpus; this pins the
    // precondition so a regenerated corpus that violates it fails loudly
    // here instead of as a silent driver hash mismatch.
    import org.apache.spark.sql.functions._
    import graft.functions.Shingles.shinglesDistinctFast
    val maxFreq = graft.Tables.load(spark, sf("sf0.01"), "documents")
      .select(col("doc_id"), explode(shinglesDistinctFast(col("text"))).as("s"))
      .groupBy("s").count().agg(max("count")).head().getLong(0)
    assert(maxFreq <= Dedup.D2MaxShingleFreq)
  }
}
