package graft.streaming

import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.operators.Sampling
import graft.storage.GraftTable

/** Streaming decontamination must equal the batch operator (c9 ≡ c2) on
  * the same corpus, across throttled micro-batches, exactly-once, with
  * the eval side built exactly once. */
class DecontaminateStreamSpec extends SparkSpec {

  test("stream ≡ batch across micro-batches; eval subtree builds once; exactly-once") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val docs = graft.Tables.load(spark, dir, "documents")
    val evalDocs = 5

    // the batch oracle twin: c9 on the same corpus and split
    val expected = Sampling.c9BloomDecontaminate(spark, dir, evalDocs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val srcLoc = tmpDir("decon-src") + "/t"
    val dstLoc = tmpDir("decon-dst") + "/t"
    val src = GraftTable.create(spark, srcLoc, StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType))))
    val dst = GraftTable.create(spark, dstLoc, StructType(Seq(
      StructField("doc_id", LongType), StructField("n_shared", LongType))))

    // two appends = two source versions; throttled to one per trigger
    val incoming = docs.filter(s"doc_id >= $evalDocs")
      .select("doc_id", "text").as[(Long, String)].collect()
    val (h1, h2) = incoming.splitAt(incoming.length / 2)
    src.append(h1.toSeq.toDF("doc_id", "text"))
    src.append(h2.toSeq.toDF("doc_id", "text"))

    // the eval subtree must execute only during buildIndex, never again
    val scans = spark.sparkContext.longAccumulator("eval-scans")
    val evalCounted = docs.filter(s"doc_id < $evalDocs")
      .select("doc_id", "text").as[(Long, String)]
      .mapPartitions { it => scans.add(1); it }.toDF("doc_id", "text")

    val q = DecontaminateStream.start(
      spark.readStream.format("graft")
        .option("maxVersionsPerTrigger", "1").load(srcLoc),
      evalDocs = evalCounted, dest = dst, checkpoint = tmpDir("decon-ckpt"))
    try {
      val afterBuild = scans.value
      assert(afterBuild > 0, "start() must materialize the eval index first")
      assert(q.awaitTermination(180000), "AvailableNow stream must drain")
      assert(q.exception.isEmpty, q.exception.map(_.toString).getOrElse(""))
      assert(scans.value === afterBuild,
        "the eval subtree must execute exactly once across all micro-batches")
    } finally if (q.isActive) q.stop()

    val got = dst.read().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected,
      s"stream/batch divergence: missing=${(expected -- got).take(3)} " +
        s"extra=${(got -- expected).take(3)}")
    assert(dst.read().count() === expected.size.toLong, "exactly-once")
    GraftTable.drop(srcLoc); GraftTable.drop(dstLoc)
  }

  test("refreshable eval side: an eval doc ACCEPTED mid-stream contaminates later batches; scores equal the batch scorer") {
    import spark.implicits._
    val textA = "alpha beta gamma delta epsilon zeta"
    val textB = "one two three four five six seven"
    // v1 committed eval suite: doc A only
    val evalLoc = tmpDir("decon-refresh") + "/eval"
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val evalT = GraftTable.create(spark, evalLoc, docSchema)
    evalT.append(Seq((100L, textA)).toDF("doc_id", "text"))
    // stream: batch a = a copy of eval doc A (hits against v1); the
    // eval EXTENSION (doc B) is accepted mid-stream, then batch c — a
    // copy of B — must hit WITHOUT a restart
    val src = tmpDir("decon-refresh-src")
    Seq((1L, textA)).toDF("doc_id", "text").write.parquet(s"$src/part=a")
    val incoming = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", 1)
      .option("recursiveFileLookup", "true").parquet(src)
    val dstLoc = tmpDir("decon-refresh-dst") + "/t"
    val dst = GraftTable.create(spark, dstLoc, StructType(Seq(
      StructField("doc_id", LongType), StructField("n_shared", LongType))))
    val q = DecontaminateStream.startRefreshable(spark, evalLoc, incoming,
      dst, tmpDir("decon-refresh-ckpt"), minShared = 3,
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
      await(1L, "the v1 contamination hit")
      // benchmark suite extended mid-stream: version ticks
      evalT.append(Seq((101L, textB)).toDF("doc_id", "text"))
      Seq((2L, textB)).toDF("doc_id", "text").write.parquet(s"$src/part=c")
      await(2L, "the post-extension hit")
    } finally q.stop()
    // c9 ≡ c2 preserved: the streamed scores equal the batch scorer
    // over the FINAL eval snapshot
    val idx = DecontaminateStream.buildIndex(evalT.read())
    val expected2 = DecontaminateStream.score(idx,
      Seq((1L, textA), (2L, textB)).toDF("doc_id", "text"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    idx.release()
    val got2 = dst.read().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got2 === expected2 && got2.map(_._1) === Set(1L, 2L),
      s"the accepted eval doc must contaminate later batches without a " +
        s"restart: got=$got2 expected=$expected2")
    GraftTable.drop(dstLoc)
  }

  test("eval-side delta merge ≡ full rebuild at ∝-delta read cost (VERDICT r15 #3)") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val all = graft.Tables.load(spark, dir, "documents")
      .select("doc_id", "text")
    val evalLoc = tmpDir("decon-delta") + "/eval"
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val evalT = GraftTable.create(spark, evalLoc, docSchema)
    evalT.append(all.filter("doc_id < 200"))

    val records = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null)
            records.addAndGet(e.taskMetrics.inputMetrics.recordsRead)
      })

    // the refreshable wiring, instrumented like RefreshableStaticSpec
    var builds = 0
    val rs = new RefreshableStatic[DecontaminateStream.EvalIndex](evalLoc,
      docs => { builds += 1; DecontaminateStream.buildIndex(docs) },
      _.release(),
      applyDelta = Some((cur, d, _) =>
        DecontaminateStream.applyDeltaIndex(cur, d)))

    records.set(0L)
    rs.get(spark)
    Thread.sleep(1000)
    val fullReads = records.get()
    assert(builds === 1 && fullReads >= 200L,
      s"the full build reads the 200-doc suite (read $fullReads)")

    // the delta: one doc REUSING v1 shingles (the dup-inflation trap —
    // a blind union would double-count its shingles in n_shared) plus
    // one brand-new doc (the sketch OR must admit its shingles)
    val reusedText = all.filter("doc_id = 0").head.getString(1)
    val novelText = "qq ww ee rr tt yy uu ii oo pp aa ss dd ff gg hh"
    evalT.append(Seq((900L, reusedText), (901L, novelText))
      .toDF("doc_id", "text"))
    records.set(0L)
    val merged = rs.get(spark)
    Thread.sleep(1000)
    val deltaReads = records.get()
    assert(builds === 1, "an append-only eval tick must NOT full-rebuild")
    assert(deltaReads < fullReads / 3,
      s"the delta tick read $deltaReads records vs the full build's " +
        s"$fullReads — it must not re-shingle the whole suite")

    // delta ≡ full rebuild: identical scores on probes that hit the
    // old suite, the novel delta doc, and the reused-shingle doc
    val probes = Seq((1L, reusedText), (2L, novelText),
      (3L, "totally unrelated probe text zz xx cc vv bb nn mm"))
      .toDF("doc_id", "text")
    def scores(ix: DecontaminateStream.EvalIndex) =
      DecontaminateStream.score(ix, probes, 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotDelta = scores(merged)
    val fullIx = DecontaminateStream.buildIndex(evalT.read())
    val gotFull = scores(fullIx)
    assert(gotDelta === gotFull,
      s"delta-merged index diverged from the full rebuild: " +
        s"delta=$gotDelta full=$gotFull")
    assert(gotFull.exists(_._1 == 2L),
      "the novel eval doc's shingles must be admitted by the OR'd sketch")
    fullIx.release()
    rs.close()
    GraftTable.drop(evalLoc)
  }
}
