package graft.streaming

import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.operators.Dedup
import graft.storage.GraftTable

/** Continuous span dedup: a multi-batch document stream must produce
  * exactly d15's batch results against the same corpus, land them
  * exactly-once, and replay nothing on restart. */
class SpanStreamSpec extends SparkSpec {

  test("streamed spans equal batch d15; replay appends nothing") {
    import spark.implicits._
    val shared = (1 to 20).map(i => s"x$i")
    val other = (1 to 25).map(i => s"z$i")
    val dirP = tmpDir("span-stream-data")
    // corpus (ids % 10 != 7) + two batch docs (ids % 10 == 7), one per
    // micro-batch: doc 17 shares a span with corpus doc 1, doc 27 with
    // corpus doc 2; corpus docs 3/4 duplicate EACH OTHER only
    val corpusDup = (1 to 18).map(i => s"y$i").mkString(" ")
    val all = Seq(
      1L -> ((1 to 10).map(i => s"a$i") ++ shared).mkString(" "),
      2L -> (other ++ (1 to 6).map(i => s"b$i")).mkString(" "),
      3L -> corpusDup, 4L -> corpusDup,
      17L -> (shared ++ (1 to 8).map(i => s"c$i")).mkString(" "),
      27L -> ((1 to 5).map(i => s"d$i") ++ other).mkString(" "))
    all.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dirP/documents.parquet")
    val expected = Dedup.d15IncrementalSpans(spark, dirP).collect()
    assert(expected.length === 2, expected.mkString(";"))
    val corpusDocs = spark.read.parquet(s"$dirP/documents.parquet")
      .filter($"doc_id" % 10 =!= 7)
    // the batch docs arrive as a 2-batch stream
    val src = tmpDir("span-stream-src")
    all.filter(_._1 == 17L).toDF("doc_id", "text")
      .write.parquet(s"$src/part=a")
    all.filter(_._1 == 27L).toDF("doc_id", "text")
      .write.parquet(s"$src/part=b")
    val dschema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def incoming = spark.readStream.schema(dschema)
      .option("maxFilesPerTrigger", 1)
      .option("recursiveFileLookup", "true")
      .parquet(src)
    val destLoc = tmpDir("span-stream-dest") + "/t"
    val dest = GraftTable.create(spark, destLoc,
      Dedup.d15IncrementalSpans(spark, dirP).schema)
    val ckpt = tmpDir("span-stream-ckpt")
    val q = SpanStream.start(incoming, corpusDocs, dest, ckpt)
    assert(q.awaitTermination(120000), "span stream drain timed out")
    val streamed = dest.read()
      .orderBy("doc_a", "doc_b", "pos_a", "pos_b").collect()
    assert(streamed.map(_.toSeq).toSeq ===
      expected.map(_.toSeq).toSeq,
      "the continuous span check must equal batch d15")
    // restart on the same checkpoint: replay must be a no-op
    val q2 = SpanStream.start(incoming, corpusDocs, dest, ckpt)
    assert(q2.awaitTermination(120000))
    assert(dest.read().count() === expected.length.toLong,
      "replay must be a no-op")
    GraftTable.drop(destLoc)
  }

  test("delta-grammed corpus union serves exactly the full re-gram (the round-15 merge's lossless claim)") {
    import spark.implicits._
    val spanX = (1 to 20).map(i => s"x$i")
    val spanY = (1 to 20).map(i => s"y$i")
    // base corpus: doc 1 carries spanX; delta: doc 3 carries spanY;
    // the batch doc shares a long span with EACH — one hit must come
    // from the base frame, one from the delta frame
    val base = Seq(
      (1L, ((1 to 5).map(i => s"a$i") ++ spanX).mkString(" ")),
      (2L, (1 to 30).map(i => s"b$i").mkString(" ")))
      .toDF("doc_id", "text")
    val delta = Seq(
      (3L, (spanY ++ (1 to 5).map(i => s"c$i")).mkString(" ")))
      .toDF("doc_id", "text")
    val batch = Seq(
      (107L, (spanX ++ (1 to 3).map(i => s"d$i") ++ spanY).mkString(" ")))
      .toDF("doc_id", "text")
    val stacked = Dedup.corpusSpanGrams(base)
      .unionByName(Dedup.corpusSpanGrams(delta))
    val full = Dedup.corpusSpanGrams(base.unionByName(delta))
    val bg = Dedup.batchSpanGrams(batch)
    def res(corpus: org.apache.spark.sql.DataFrame) =
      Dedup.spanMatchAgainst(corpus, bg)
        .orderBy("doc_a", "doc_b", "pos_a", "pos_b")
        .collect().map(_.toSeq).toSeq
    val got = res(stacked)
    assert(got === res(full), "stacked grams ≡ full re-gram")
    assert(got.map(_(0)).distinct.toSet === Set(1L, 3L),
      s"hits must come from BOTH the base and the delta frame: $got")
  }

  test("refreshable corpus side: a doc committed MID-STREAM is span-checked against later batches without a restart") {
    import spark.implicits._
    val spanX = (1 to 20).map(i => s"x$i")
    val spanY = (1 to 20).map(i => s"y$i")
    val corpusLoc = tmpDir("ss-refresh") + "/corpus"
    val corpusT = GraftTable.create(spark, corpusLoc, StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType))))
    corpusT.append(Seq(
      (1L, ((1 to 6).map(i => s"a$i") ++ spanX).mkString(" ")))
      .toDF("doc_id", "text"))
    val src = tmpDir("ss-refresh-src")
    Seq((17L, (spanX ++ (1 to 5).map(i => s"c$i")).mkString(" ")))
      .toDF("doc_id", "text").write.parquet(s"$src/part=a")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val incoming = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .option("recursiveFileLookup", "true").parquet(src)
    val destLoc = tmpDir("ss-refresh-dest") + "/t"
    val dest = GraftTable.create(spark, destLoc, StructType(Seq(
      StructField("doc_a", LongType), StructField("doc_b", LongType),
      StructField("pos_a", LongType), StructField("pos_b", LongType),
      StructField("span_tokens", LongType))))
    val ckpt = tmpDir("ss-refresh-ckpt")
    val q = SpanStream.startRefreshable(corpusLoc, incoming, dest, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(250L))
    def await(n: Long): Unit = {
      val t0 = System.nanoTime()
      while (dest.read().count() < n) {
        assert((System.nanoTime() - t0) / 1e9 < 90,
          s"timed out (have ${dest.read().count()}, want $n)")
        Thread.sleep(250)
      }
    }
    await(1L)
    // mid-stream: a new corpus doc carrying span Y; batch B shares it
    corpusT.append(Seq(
      (2L, ((1 to 4).map(i => s"b$i") ++ spanY).mkString(" ")))
      .toDF("doc_id", "text"))
    Seq((27L, (spanY ++ (1 to 7).map(i => s"d$i")).mkString(" ")))
      .toDF("doc_id", "text").write.parquet(s"$src/part=b")
    await(2L)
    q.stop()
    val got = dest.read().orderBy("doc_a").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSeq
    assert(got === Seq((1L, 17L, 20L), (2L, 27L, 20L)),
      s"the mid-stream doc's spans must reach later batches without a restart: $got")
    // exactly-once across a restart on the same checkpoint
    val q2 = SpanStream.startRefreshable(corpusLoc, incoming, dest, ckpt)
    assert(q2.awaitTermination(120000))
    assert(dest.read().count() === 2L, "replay must append nothing")
    GraftTable.drop(corpusLoc); GraftTable.drop(destLoc)
  }
}
