package graft.streaming

import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.operators.TextAnalysis
import graft.storage.GraftTable

/** The streaming token-vote scorer must equal batch t17 (minus the
  * teacher columns) on the same corpus, across throttled micro-batches,
  * exactly-once, with the teacher subtree trained exactly once. */
class TokenVoteStreamSpec extends SparkSpec {

  test("stream ≡ batch t17; model trains once; exactly-once") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val docs = graft.Tables.load(spark, dir, "documents")

    // the batch twin: t17's own output, teacher columns dropped
    val expected = TextAnalysis.t17TokenVotes(spark, dir)
      .select("doc_id", "n_voters", "score", "keep_pred")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet

    val srcLoc = tmpDir("tvote-src") + "/t"
    val dstLoc = tmpDir("tvote-dst") + "/t"
    val src = GraftTable.create(spark, srcLoc, StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType))))
    val dst = GraftTable.create(spark, dstLoc, StructType(Seq(
      StructField("doc_id", LongType), StructField("n_voters", LongType),
      StructField("score", LongType), StructField("keep_pred", BooleanType))))

    // two appends = two source versions; throttled to one per trigger
    val incoming = docs.select("doc_id", "text").as[(Long, String)].collect()
    val (h1, h2) = incoming.splitAt(incoming.length / 2)
    src.append(h1.toSeq.toDF("doc_id", "text"))
    src.append(h2.toSeq.toDF("doc_id", "text"))

    // the teacher subtree must execute only during buildModel, never again
    val scans = spark.sparkContext.longAccumulator("teacher-scans")
    val teacherCounted = docs.select("doc_id", "text").as[(Long, String)]
      .mapPartitions { it => scans.add(1); it }.toDF("doc_id", "text")

    val q = TokenVoteStream.start(
      spark.readStream.format("graft")
        .option("maxVersionsPerTrigger", "1").load(srcLoc),
      teacherDocs = teacherCounted, dest = dst,
      checkpoint = tmpDir("tvote-ckpt"))
    try {
      val afterBuild = scans.value
      assert(afterBuild > 0, "start() must train the model first")
      assert(q.awaitTermination(180000), "AvailableNow stream must drain")
      assert(q.exception.isEmpty, q.exception.map(_.toString).getOrElse(""))
      assert(scans.value === afterBuild,
        "the teacher subtree must execute exactly once across all micro-batches")
    } finally if (q.isActive) q.stop()

    val got = dst.read().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    assert(got === expected,
      s"stream/batch divergence: missing=${(expected -- got).take(3)} " +
        s"extra=${(got -- expected).take(3)}")
    assert(dst.read().count() === expected.size.toLong, "exactly-once")
    GraftTable.drop(srcLoc); GraftTable.drop(dstLoc)
  }
}
