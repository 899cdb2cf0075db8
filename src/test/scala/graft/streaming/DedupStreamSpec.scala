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
}
