package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.Tables
import graft.operators.Dedup
import graft.storage.GraftTable

/** Streaming incremental near-dup detection: micro-batches of incoming
  * documents scored against a static index must produce exactly the
  * batch operator's rows — across multiple throttled micro-batches,
  * into a graft table, with no duplicates. */
class DedupStreamSpec extends SparkSpec {

  test("streamed batch-vs-index scoring == batch d12, across micro-batches") {
    val dir = sf("sf0.001")
    val all = Tables.load(spark, dir, "documents").select("doc_id", "text")
    val isNew = col("doc_id") % 10 === 7
    val incoming = all.filter(isNew)
    val index = all.filter(!isNew)

    // the expected result is the BATCH operator on the same split
    val expected = Dedup.nearDupAgainstIndex(incoming, index)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(expected.nonEmpty, "corpus must have cross-split near-dups")

    val srcLoc = tmpDir("dds") + "/incoming"
    val dstLoc = tmpDir("dds") + "/scores"
    val src = GraftTable.create(spark, srcLoc, StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType))))
    val dst = GraftTable.create(spark, dstLoc, StructType(Seq(
      StructField("doc_b", LongType), StructField("doc_a", LongType),
      StructField("jac", DoubleType))))
    // two appends = two source versions; the throttle forces the scores
    // to arrive across (at least) two micro-batches
    val rows = incoming.collect()
    val (h1, h2) = rows.splitAt(rows.length / 2)
    import spark.implicits._
    src.append(h1.map(r => (r.getLong(0), r.getString(1))).toSeq.toDF("doc_id", "text"))
    src.append(h2.map(r => (r.getLong(0), r.getString(1))).toSeq.toDF("doc_id", "text"))

    // count executions of the index subtree: every task over the index
    // corpus bumps the accumulator, so a second shingling of the index
    // (the per-batch-recompute bug) shows up as growth after the build
    val scans = spark.sparkContext.longAccumulator("index-scans")
    val indexCounted = index.as[(Long, String)]
      .mapPartitions { it => scans.add(1); it }.toDF("doc_id", "text")

    val q = DedupStream.start(
      spark.readStream.format("graft")
        .option("maxVersionsPerTrigger", "1").load(srcLoc),
      indexDocs = indexCounted, dest = dst, checkpoint = tmpDir("dds-ckpt"))
    val afterBuild = scans.value
    assert(afterBuild > 0, "start() must materialize the index before the stream")
    assert(q.awaitTermination(180000), "AvailableNow stream must drain")
    assert(q.exception.isEmpty, q.exception.map(_.toString).getOrElse(""))
    assert(scans.value === afterBuild,
      "the index subtree must execute exactly once across all micro-batches")

    val got = dst.read().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === expected,
      s"stream/batch divergence: missing=${(expected -- got).take(3)} " +
        s"extra=${(got -- expected).take(3)}")
    // exactly-once: no duplicate pair rows across micro-batches
    assert(dst.read().count() === expected.size.toLong)
    GraftTable.drop(srcLoc); GraftTable.drop(dstLoc)
  }

  test("PostingsIndex.withDocs (the delta merge) serves exactly the full-rebuild scores") {
    import spark.implicits._
    def words(p: String) = (1 to 20).map(i => s"$p$i").mkString(" ")
    val a = Seq((1L, words("a")), (2L, words("b"))).toDF("doc_id", "text")
    val b = Seq((3L, words("c"))).toDF("doc_id", "text")
    val batch = Seq((107L, words("a")), (307L, words("c")))
      .toDF("doc_id", "text")
    val stacked = Dedup.PostingsIndex.build(a).withDocs(b)
    val full = Dedup.PostingsIndex.build(a.unionByName(b))
    def scores(ix: Dedup.PostingsIndex) =
      Dedup.nearDupAgainstIndex(batch, ix)
        .orderBy("doc_b", "doc_a").collect().map(_.toSeq).toSeq
    val got = scores(stacked)
    assert(got === scores(full), "stacked ≡ full rebuild")
    assert(got.map(_.head) === Seq(107L, 307L),
      s"the delta doc's match must be served from the stack: $got")
    stacked.release(); full.release()
  }

  test("refreshable index side: a doc committed MID-STREAM dedups later batches without a restart") {
    import spark.implicits._
    def words(p: String) = (1 to 20).map(i => s"$p$i").mkString(" ")
    val corpusLoc = tmpDir("dds-refresh") + "/corpus"
    val corpusT = GraftTable.create(spark, corpusLoc, StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType))))
    corpusT.append(Seq((1L, words("a"))).toDF("doc_id", "text"))
    val src = tmpDir("dds-refresh-src")
    // batch A duplicates corpus doc 1; batch B (written mid-stream)
    // duplicates doc 2, which is only committed AFTER the stream starts
    Seq((107L, words("a"))).toDF("doc_id", "text")
      .write.parquet(s"$src/part=a")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val incoming = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .option("recursiveFileLookup", "true").parquet(src)
    val dstLoc = tmpDir("dds-refresh-dst") + "/t"
    val dst = GraftTable.create(spark, dstLoc, StructType(Seq(
      StructField("doc_b", LongType), StructField("doc_a", LongType),
      StructField("jac", DoubleType))))
    val ckpt = tmpDir("dds-refresh-ckpt")
    val q = DedupStream.startRefreshable(corpusLoc, incoming, dst, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(250L))
    def await(n: Long): Unit = {
      val t0 = System.nanoTime()
      while (dst.read().count() < n) {
        assert((System.nanoTime() - t0) / 1e9 < 90,
          s"timed out (have ${dst.read().count()}, want $n)")
        Thread.sleep(250)
      }
    }
    await(1L)
    corpusT.append(Seq((2L, words("b"))).toDF("doc_id", "text"))
    Seq((207L, words("b"))).toDF("doc_id", "text")
      .write.parquet(s"$src/part=b")
    await(2L)
    q.stop()
    val got = dst.read().orderBy("doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === Seq((107L, 1L, 1.0), (207L, 2L, 1.0)),
      s"the mid-stream doc must serve later batches without a restart: $got")
    // exactly-once across a restart on the same checkpoint: a replayed
    // batch re-scores against the NEWER index but appends nothing
    val q2 = DedupStream.startRefreshable(corpusLoc, incoming, dst, ckpt)
    assert(q2.awaitTermination(120000))
    assert(dst.read().count() === 2L, "replay must append nothing")
    GraftTable.drop(corpusLoc); GraftTable.drop(dstLoc)
  }
}
