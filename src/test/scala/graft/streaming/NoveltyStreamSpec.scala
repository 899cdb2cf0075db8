package graft.streaming

import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.storage.GraftTable

/** Streaming novelty ≡ the batch t18 under the incremental family's
  * batch-vs-corpus convention, and the corpus vocabulary refreshes
  * mid-stream through the shared delta-refreshed index. */
class NoveltyStreamSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  test("batch scoring ≡ t18 over corpus∪batch; within-batch sharing is the documented divergence") {
    import spark.implicits._
    val corpus = Seq((1L, "a b c d e f"), (2L, "p q r s t"))
    // batch: doc 10 reuses corpus grams + adds new; doc 11 all-new;
    // docs 20/21 SHARE a corpus-new gram (the semantic divergence pin)
    val batch = Seq((10L, "a b c d x y"), (11L, "m n o p2 q2"),
      (20L, "w1 w2 w3"), (21L, "w1 w2 w3 z1"))
    val idx = DecontaminateStream.buildIndex(corpus.toDF("doc_id", "text"))
    val got = NoveltyStream.score(idx, batch.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    idx.release()

    // t18 over the union table (corpus ids < batch ids) — for batch
    // docs NOT sharing new grams with other batch docs, the stream's
    // corpus-only score equals t18's intake-order score
    val dir = tmpDir("novelty-union")
    (corpus ++ batch).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val t18 = graft.operators.TextAnalysis.t18NgramNovelty(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(10L) === t18(10L), s"stream ≡ t18 for doc 10: $got vs $t18")
    assert(got(11L) === t18(11L), s"stream ≡ t18 for doc 11: $got vs $t18")
    // doc 10: grams abc,bcd,cdx,dxy — 2 known, 2 novel
    assert(got(10L) === ((4L, 2L, 500000L)))
    // the divergence: w1w2w3 is corpus-NEW; t18 credits it to doc 20
    // only, the stream (corpus-only) scores it novel for BOTH
    assert(got(20L) === ((1L, 1L, 1000000L)))
    assert(got(21L)._2 === 2L, s"both sharers score the new gram: $got")
    assert(t18(21L)._2 === 1L, "t18 credits the shared gram to doc 20 alone")
  }

  test("withinBatch=true closes the sharing gap: score ≡ t19's declarative composition, sketch path included") {
    import spark.implicits._
    val corpus = Seq((1L, "a b c d e f"), (2L, "p q r s t"))
    // docs 20/21 share the corpus-new gram w1w2w3 — the shape the
    // default semantics admit twice; 21 also carries its own new gram
    val batch = Seq((10L, "a b c d x y"), (11L, "m n o p2 q2"),
      (20L, "w1 w2 w3"), (21L, "w1 w2 w3 z1"))
    val corpusDf = corpus.toDF("doc_id", "text")
    val batchDf = batch.toDF("doc_id", "text")
    val idx = DecontaminateStream.buildIndex(corpusDf)
    val got = NoveltyStream.score(idx, batchDf, withinBatch = true)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    idx.release()
    // the shared corpus-new gram is credited to doc 20 ALONE now
    assert(got(20L) === ((1L, 1L, 1000000L)))
    assert(got(21L) === ((2L, 1L, 500000L)),
      s"doc 21 keeps only its own gram z-tail: $got")
    // …and the whole map equals t19's declarative body (the oracle's
    // form: vocab anti-join + min-doc rule), sketch prefilter and all
    val want = graft.operators.TextAnalysis
      .batchNoveltyCore(corpusDf, batchDf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === want, "stream withinBatch ≡ t19 batchNoveltyCore")
    // empty corpus: every gram novel, min-doc rule still applies
    val emptyIdx = DecontaminateStream.buildIndex(
      spark.emptyDataset[(Long, String)].toDF("doc_id", "text"))
    val gotEmpty = NoveltyStream.score(emptyIdx, batchDf, withinBatch = true)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    emptyIdx.release()
    assert(gotEmpty(20L) === 1L && gotEmpty(21L) === 1L,
      "empty corpus: the shared gram still lands on doc 20 alone")
  }

  test("refreshable vocabulary: a doc ACCEPTED mid-stream stops being novel for later batches; delta path exercised") {
    import spark.implicits._
    val textA = "alpha beta gamma delta epsilon"
    val textB = "one two three four five six"
    val corpusLoc = tmpDir("novelty-refresh") + "/corpus"
    val corpusT = GraftTable.create(spark, corpusLoc, docSchema)
    corpusT.append(Seq((100L, textA)).toDF("doc_id", "text"))

    val src = tmpDir("novelty-src")
    Seq((1L, textB)).toDF("doc_id", "text").write.parquet(s"$src/part=a")
    val incoming = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", 1)
      .option("recursiveFileLookup", "true").parquet(src)
    val dstLoc = tmpDir("novelty-dst") + "/t"
    val dst = GraftTable.create(spark, dstLoc, StructType(Seq(
      StructField("doc_id", LongType), StructField("n_grams", LongType),
      StructField("n_novel", LongType), StructField("novelty_micro", LongType))))
    val q = NoveltyStream.startRefreshable(spark, corpusLoc, incoming,
      dst, tmpDir("novelty-ckpt"),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(250L))
    def await(n: Long, what: String): Unit = {
      val t0 = System.nanoTime()
      while (dst.read().count() < n) {
        assert((System.nanoTime() - t0) / 1e9 < 90,
          s"timed out waiting for $what (have ${dst.read().count()}, want $n)")
        Thread.sleep(250)
      }
    }
    try {
      await(1L, "the first batch's score")
      // doc B unseen: fully novel against the v1 corpus
      val first = dst.read().filter("doc_id = 1").head()
      assert(first.getAs[Long]("novelty_micro") === 1000000L)
      // B is ACCEPTED into the corpus (append-only tick → delta path:
      // only B is shingled; its hashes OR into the serving sketch)
      corpusT.append(Seq((101L, textB)).toDF("doc_id", "text"))
      Seq((2L, textB)).toDF("doc_id", "text").write.parquet(s"$src/part=c")
      await(2L, "the post-accept score")
      val second = dst.read().filter("doc_id = 2").head()
      assert(second.getAs[Long]("novelty_micro") === 0L,
        "an accepted doc must stop being novel WITHOUT a restart")
      assert(second.getAs[Long]("n_novel") === 0L)
    } finally q.stop()
    GraftTable.drop(corpusLoc); GraftTable.drop(dstLoc)
  }
}
