package graft.streaming

import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.storage.GraftTable

/** Streaming quality gate ≡ the batch c20 (corpus-threshold serving
  * semantics), and corpus ticks move the bar mid-stream through the
  * refreshable threshold map. */
class GateStreamSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("source", StringType),
    StructField("text", StringType)))

  // measured relative quality is asserted, not assumed, in each test
  private val hiText = "The quick brown fox jumps over the lazy dog and " +
    "then settles quietly beside the river bank to watch the evening sky."
  private val loText = "zz zz zz !!! ### zz !!!"

  private def scoreOf(text: String): Long = {
    import spark.implicits._
    GateStream.gate(Map.empty,
      Seq((1L, "probe", text)).toDF("doc_id", "source", "text"))
      .collect().head.getLong(2)
  }

  test("the per-batch gate is shuffle-free: score + map-literal lookup, no Exchange") {
    import spark.implicits._
    val plan = GateStream.gate(Map("s1" -> 5L, "s2" -> 7L),
      Seq((1L, "s1", hiText)).toDF("doc_id", "source", "text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"the batch gate must be a narrow map-side filter, got:\n$plan")
  }

  test("the wide-cardinality fallback (broadcast join) ≡ the literal-map path") {
    import spark.implicits._
    val batch = Seq((1L, "s1", hiText), (2L, "s1", loText),
      (3L, "unseen", loText)).toDF("doc_id", "source", "text")
    val mid = (scoreOf(hiText) + scoreOf(loText)) / 2
    val thr = Map("s1" -> mid, "s2" -> 0L)
    def rows(literal: Boolean) =
      GateStream.gateImpl(thr, batch, literal).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    val lit = rows(literal = true)
    assert(lit === rows(literal = false),
      "both gate plans must keep exactly the same rows")
    assert(lit.map(_._1) === Seq(1L, 3L),
      "hi clears the bar, lo does not, the unseen source passes whole")
  }

  test("drained gate ≡ c20's thresholdGateCore; an unseen source passes whole") {
    import spark.implicits._
    assert(scoreOf(hiText) > scoreOf(loText), "probe texts must separate")
    val corpus = (0 until 8).map(i =>
      (100L + i, "s1", if (i % 2 == 0) hiText else loText)) ++
      (0 until 4).map(i => (200L + i, "s2", loText))
    val batch = Seq((1L, "s1", hiText), (2L, "s1", loText),
      (3L, "s2", loText), (4L, "brand_new", loText))
    val corpusDf = corpus.toDF("doc_id", "source", "text")
    val batchDf = batch.toDF("doc_id", "source", "text")

    val corpusLoc = tmpDir("gate-eq") + "/corpus"
    GraftTable.create(spark, corpusLoc, docSchema).append(corpusDf)
    val src = tmpDir("gate-eq-src")
    batchDf.write.parquet(s"$src/part=a")
    val incoming = spark.readStream.schema(docSchema)
      .option("recursiveFileLookup", "true").parquet(src)
    val dstLoc = tmpDir("gate-eq-dst") + "/t"
    val dst = GraftTable.create(spark, dstLoc, StructType(Seq(
      StructField("doc_id", LongType), StructField("source", StringType),
      StructField("quality_micro", LongType))))
    val q = GateStream.startRefreshable(spark, corpusLoc, incoming, dst,
      tmpDir("gate-eq-ckpt"))
    try require(q.awaitTermination(120000), "gate drain timed out")
    finally q.stop()

    val got = dst.read().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1).toSeq
    val want = graft.operators.Sampling.thresholdGateCore(corpusDf, batchDf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(got === want, "stream gate ≡ c20 core")
    // and the semantics are the intended ones: hi passes s1's bar, lo
    // does not (s1's quartile boundary is a hi score); s2 (all-lo
    // corpus) keeps its lo doc; the corpus-unseen source passes whole
    val ids = got.map(_._1).toSet
    assert(ids === Set(1L, 3L, 4L), s"kept $ids")
    GraftTable.drop(corpusLoc); GraftTable.drop(dstLoc)
  }

  test("a corpus tick RAISES the bar mid-stream: the same lo doc passes before, drops after") {
    import spark.implicits._
    assert(scoreOf(hiText) > scoreOf(loText), "probe texts must separate")
    val corpusLoc = tmpDir("gate-tick") + "/corpus"
    val corpusT = GraftTable.create(spark, corpusLoc, docSchema)
    // v1: four lo docs → one keeper (ceil(4/4)), threshold = lo score
    corpusT.append((0 until 4).map(i => (100L + i, "s1", loText))
      .toDF("doc_id", "source", "text"))

    val src = tmpDir("gate-tick-src")
    Seq((1L, "s1", loText)).toDF("doc_id", "source", "text")
      .write.parquet(s"$src/part=a")
    val incoming = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", 1)
      .option("recursiveFileLookup", "true").parquet(src)
    val dstLoc = tmpDir("gate-tick-dst") + "/t"
    val dst = GraftTable.create(spark, dstLoc, StructType(Seq(
      StructField("doc_id", LongType), StructField("source", StringType),
      StructField("quality_micro", LongType))))
    val q = GateStream.startRefreshable(spark, corpusLoc, incoming, dst,
      tmpDir("gate-tick-ckpt"),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(250L))
    def awaitIds(want: Set[Long], what: String): Unit = {
      val t0 = System.nanoTime()
      def ids() = dst.read().collect().map(_.getLong(0)).toSet
      while (ids() != want) {
        assert((System.nanoTime() - t0) / 1e9 < 90,
          s"timed out on $what: have ${ids()}, want $want")
        Thread.sleep(250)
      }
    }
    try {
      // lo clears the all-lo corpus bar
      awaitIds(Set(1L), "the pre-tick keep")
      // twelve hi docs accepted → s1's keepers are all hi → bar = hi
      corpusT.append((200 until 212).map(i => (i.toLong, "s1", hiText))
        .toDF("doc_id", "source", "text"))
      Seq((2L, "s1", loText), (3L, "s1", hiText))
        .toDF("doc_id", "source", "text").write.parquet(s"$src/part=b")
      // doc 3 (hi) passes the raised bar; doc 2 (lo) must never land
      awaitIds(Set(1L, 3L), "the post-tick gate")
      Thread.sleep(1000)
      assert(dst.read().collect().map(_.getLong(0)).toSet === Set(1L, 3L),
        "the lo doc must stay dropped after the tick")
    } finally q.stop()
    GraftTable.drop(corpusLoc); GraftTable.drop(dstLoc)
  }

  test("affected-source delta ≡ full rebuild, untouched sources keep their entry, and the recompute reads ∝ the touched source") {
    import spark.implicits._
    val corpusLoc = tmpDir("gate-delta") + "/corpus"
    val t = GraftTable.create(spark, corpusLoc, docSchema)
    // source b is the BULK of the corpus, committed in its own append
    // so its files carry only b (source-clustered — the zone-map shape
    // a curation pipeline's per-source intake produces naturally)
    t.append((0 until 3000).map(i => (1000L + i, "b", hiText))
      .toDF("doc_id", "source", "text").repartition(8))
    t.append(Seq((1L, "a", loText), (2L, "a", loText), (3L, "a", loText),
      (4L, "a", loText)).toDF("doc_id", "source", "text"))
    val v0 = t.version
    val cur = GateStream.thresholds(
      GraftTable.openVersion(spark, corpusLoc, v0).read())
    // the tick: hi docs accepted into source a ONLY
    val delta = (20 until 32).map(i => (i.toLong, "a", hiText))
      .toDF("doc_id", "source", "text")
    t.append(delta)
    val records = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null)
            records.addAndGet(e.taskMetrics.inputMetrics.recordsRead)
      })
    records.set(0L)
    val got = GateStream.deltaThresholds(spark, corpusLoc, cur, delta,
      t.version)
    Thread.sleep(1000) // listener bus drains asynchronously
    val deltaReads = records.get()
    val want = GateStream.thresholds(
      GraftTable.openVersion(spark, corpusLoc, t.version).read())
    assert(got === Some(want), "delta must equal the full rebuild")
    assert(got.get("a") > cur("a"), "source a's bar must rise")
    assert(got.get("b") === cur("b"), "source b's entry is untouched")
    // the recompute scans source a's rows (16, a few plan passes),
    // never the 3000-row bulk: the source filter prunes b's files by
    // their zone maps before any row is read
    assert(deltaReads < 500L,
      s"an a-only tick read $deltaReads records — it must not scan " +
        "source b's 3000-row corpus mass")
    // an empty delta is a no-op; a backfill-wide one falls back
    assert(GateStream.deltaThresholds(spark, corpusLoc, cur,
      delta.limit(0), t.version) === Some(cur))
    GraftTable.drop(corpusLoc)
  }
}
