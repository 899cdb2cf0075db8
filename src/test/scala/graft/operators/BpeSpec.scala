package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The distributed BPE trainer must be EXACTLY the sequential algorithm:
  * same merge table, same encodings — distribution changes the shuffle
  * geometry, never the result. The reference implementation below is the
  * classic in-memory formulation (word-frequency map, pair Counter,
  * argmax with the same tie-break, leftmost non-overlapping merge). */
class BpeSpec extends SparkSpec {

  /** Sequential reference trainer. */
  private def referenceTrain(corpus: Seq[String], numMerges: Int)
      : (Seq[(String, String)], Map[String, Int]) = {
    val freq = corpus.flatMap(_.split(" ", -1)).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    var words: Map[String, (Long, IndexedSeq[String])] =
      freq.map { case (w, f) => w -> (f, w.map(_.toString).toIndexedSeq) }
    val merges = Seq.newBuilder[(String, String)]
    var done = false
    var round = 0
    while (round < numMerges && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      words.values.foreach { case (f, syms) =>
        syms.sliding(2).foreach {
          case scala.collection.Seq(a, b) =>
            counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ => ()
        }
      }
      if (counts.isEmpty || counts.values.max < 2) done = true
      else {
        // argmax with (count desc, a asc, b asc) under the DOCUMENTED
        // unsigned-UTF-8-byte order (what Spark's string sort uses)
        implicit val o: Ordering[String] = Bpe.utf8ByteOrder
        val ((a, b), _) = counts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.head
        merges += ((a, b))
        words = words.map { case (w, (f, syms)) =>
          w -> (f, Bpe.applyMerge(syms, a, b))
        }
      }
      round += 1
    }
    (merges.result(), words.map { case (w, (_, syms)) => w -> syms.length }.toMap)
  }

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = tmpDir("bpe-spec")
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("distributed trainer == sequential reference (merges and encodings)") {
    val corpus = Seq(
      1L -> "low low low low low lower lower newest newest newest newest newest newest",
      2L -> "widest widest widest new new new newer lowest",
      3L -> "the quick brown fox the quick brown dog the lazy dog")
    val dir = writeDocs(corpus)
    val (refMerges, refEnc) = referenceTrain(corpus.map(_._2), 25)
    assert(refMerges.nonEmpty && refMerges.length >= 10)
    // the gated entry point (sequential path at this vocab size)
    val (gotMerges, gotEnc) = Bpe.train(spark, dir, 25)
    assert(gotMerges === refMerges, "merge tables must be identical, in order")
    assert(gotEnc === refEnc, "per-word token counts must be identical")
    // the distributed loop — the beyond-driver-gate path — is the SAME
    // algorithm under a different shuffle geometry
    import spark.implicits._
    val wt = graft.Tables.load(spark, dir, "documents")
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(col("text"), " ", -1)).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("f"))
      .as[(String, Long)]
    val (distMerges, distEnc) = Bpe.trainDistributed(spark, wt, 25)
    assert(distMerges === refMerges, "distributed path: identical merges")
    assert(distEnc === refEnc, "distributed path: identical encodings")
    // the classic corpus learns real subwords: 'newest' fuses fully
    assert(gotEnc("newest") === 1)
  }

  test("t11 invariants on the real corpus: words <= bpe tokens <= chars") {
    val out = Bpe.t11BpeTokens(spark, sf("sf0.001")).collect()
    assert(out.length > 0)
    val docs = graft.Tables.load(spark, sf("sf0.001"), "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val (id, nw, nb) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val chars = docs(id).split(" ", -1).filter(_.nonEmpty).map(_.length.toLong).sum
      assert(nb >= nw, s"doc $id: a word is at least one token")
      assert(nb <= chars, s"doc $id: merging never exceeds character count")
    }
    // BPE must actually compress: corpus-wide tokens strictly below chars
    val totB = out.map(_.getLong(2)).sum
    val totC = docs.values.map(_.split(" ", -1).filter(_.nonEmpty).map(_.length.toLong).sum).sum
    assert(totB < totC, "learned merges should compress the corpus")
  }
}
