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
}
