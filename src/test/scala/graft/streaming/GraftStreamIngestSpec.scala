package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.storage.GraftTable

/** Exactly-once streaming ingest: replayed micro-batches must not
  * double-ingest, across both the direct appendStream surface and a real
  * restarted MemoryStream query sharing one checkpoint. */
class GraftStreamIngestSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  test("appendStream dedupes a replayed batch atomically") {
    import spark.implicits._
    val loc = tmpDir("graft-stream") + "/tbl"
    val t = GraftTable.create(spark, loc, schema)
    assert(t.appendStream(Seq((1L, "a")).toDF("id", "v"), "q1", 0L) === 1L)
    assert(t.appendStream(Seq((2L, "b")).toDF("id", "v"), "q1", 1L) === 1L)
    // checkpoint replay: same (query, batch) — must be a no-op
    assert(t.appendStream(Seq((2L, "b")).toDF("id", "v"), "q1", 1L) === 0L)
    // an OLDER batch id is also a replay
    assert(t.appendStream(Seq((1L, "a")).toDF("id", "v"), "q1", 0L) === 0L)
    // a different query's batch 1 is independent
    assert(t.appendStream(Seq((3L, "c")).toDF("id", "v"), "q2", 1L) === 1L)
    assert(t.read().count() === 3L)
    // the watermark survives reopen (it rides the metadata commit)
    val reopened = GraftTable.open(spark, loc)
    assert(reopened.appendStream(Seq((9L, "x")).toDF("id", "v"), "q1", 1L) === 0L)
    assert(reopened.read().count() === 3L)
    // the wiped-checkpoint escape hatch: resetting the txn re-admits
    // batch ids from 0
    reopened.resetStreamTxn("q1")
    assert(reopened.appendStream(Seq((4L, "d")).toDF("id", "v"), "q1", 0L) === 1L)
    assert(reopened.read().count() === 4L)
    GraftTable.drop(loc)
  }

  test("restarted pipeline with a grown upstream schema evolves the table (mergeSchema)") {
    import spark.implicits._
    val loc = tmpDir("graft-stream-evo") + "/tbl"
    val chk = tmpDir("graft-stream-evo-chk")
    val src = tmpDir("graft-stream-evo-src")
    val t = GraftTable.create(spark, loc, schema)
    // phase 1: original shape
    Seq((1L, "a")).toDF("id", "v").coalesce(1).write.mode("append").parquet(src)
    val q1 = GraftStreamIngest.start(
      spark.readStream.schema(schema).parquet(src), t, chk,
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
    assert(q1.awaitTermination(120000))
    // phase 2: upstream grew a field; restart with mergeSchema — the
    // first post-restart batch ADDs the column atomically with its rows
    val wide = StructType(schema.fields :+ StructField("tag", StringType))
    Seq((2L, "b", "t2")).toDF("id", "v", "tag")
      .coalesce(1).write.mode("append").parquet(src)
    val q2 = GraftStreamIngest.start(
      spark.readStream.schema(wide).parquet(src), t, chk,
      org.apache.spark.sql.streaming.Trigger.AvailableNow(), mergeSchema = true)
    assert(q2.awaitTermination(120000))
    val rows = t.read().orderBy("id").collect()
    assert(t.read().schema.fieldNames.toSeq === Seq("id", "v", "tag"))
    assert(rows.map(r => Option(r.getString(2)).orNull).toSeq === Seq(null, "t2"),
      "pre-evolution rows NULL, evolved batch carries its values")
    // exactly-once watermark carried through the evolution: re-running
    // the same AvailableNow drain ingests nothing new
    val q3 = GraftStreamIngest.start(
      spark.readStream.schema(wide).parquet(src), t, chk,
      org.apache.spark.sql.streaming.Trigger.AvailableNow(), mergeSchema = true)
    assert(q3.awaitTermination(120000))
    assert(t.read().count() === 2L)
    GraftTable.drop(loc)
  }

  test("a crash-replayed micro-batch does not double-ingest (commit-log injection)") {
    import spark.implicits._
    val loc = tmpDir("graft-stream-e2e") + "/tbl"
    val chk = tmpDir("graft-stream-chk")
    val src = tmpDir("graft-stream-src")
    GraftTable.create(spark, loc, schema)
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(src)

    def run(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(src)
      GraftStreamIngest.start(stream, loc, chk).awaitTermination(120000)
      ()
    }
    run()
    assert(GraftTable.open(spark, loc).read().count() === 2L)

    // crash injection: delete the checkpoint's batch-0 COMMIT marker, so
    // the restarted query replays batch 0 through foreachBatch — the
    // exact "sink wrote, commit log didn't" failure exactly-once is about
    val commit0 = java.nio.file.Paths.get(chk, "commits", "0")
    assert(java.nio.file.Files.exists(commit0), "expected a commit marker")
    java.nio.file.Files.delete(commit0)
    // the local checkpoint FS is checksummed: drop the crc sidecar too,
    // or the replayed commit write trips over the stale checksum
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(chk, "commits", ".0.crc"))
    run()
    val rows = GraftTable.open(spark, loc).read()
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq === Seq((1L, "a"), (2L, "b")),
      s"replayed batch must not double-ingest: ${rows.toSeq}")
    assert(GraftTable.open(spark, loc).rowCountFromMetadata() === 2L)
    GraftTable.drop(loc)
  }
}
