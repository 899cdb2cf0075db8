package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.storage.GraftTable

/** Exactly-once streaming UPSERT (CDC-into-table): replayed micro-batches
  * must not double-apply, updates and inserts land atomically per batch,
  * and a downstream stream over the table sees exactly the inserted keys
  * (merge commits declare their insert files stream-visible). */
class GraftStreamUpsertSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", IntegerType), StructField("v", StringType)))

  test("mergeStream dedupes a replayed batch atomically") {
    import spark.implicits._
    val loc = tmpDir("graft-upsert") + "/tbl"
    val t = GraftTable.create(spark, loc, schema)
    t.append(Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v"))

    // batch 0: update k=2, insert k=10
    assert(t.mergeStream(Seq((2, "b0"), (10, "j0")).toDF("k", "v"),
      Seq("k"), "u1", 0L) === ((1L, 1L)))
    // checkpoint replay of batch 0 — must be a no-op
    assert(t.mergeStream(Seq((2, "b0"), (10, "j0")).toDF("k", "v"),
      Seq("k"), "u1", 0L) === ((0L, 0L)))
    // batch 1 advances; an older batch id replays as a no-op after it
    assert(t.mergeStream(Seq((3, "c1")).toDF("k", "v"), Seq("k"), "u1", 1L)
      === ((1L, 0L)))
    assert(t.mergeStream(Seq((3, "zzz")).toDF("k", "v"), Seq("k"), "u1", 0L)
      === ((0L, 0L)))
    // a different pipeline's batch numbering is independent
    assert(t.mergeStream(Seq((20, "q2")).toDF("k", "v"), Seq("k"), "u2", 0L)
      === ((0L, 1L)))
    val state = t.read().as[(Int, String)].collect().toMap
    assert(state === Map(1 -> "a", 2 -> "b0", 3 -> "c1", 10 -> "j0", 20 -> "q2"))
    // the watermark rides the metadata commit: survives reopen
    assert(GraftTable.open(spark, loc)
      .mergeStream(Seq((9, "x")).toDF("k", "v"), Seq("k"), "u1", 1L) === ((0L, 0L)))
    GraftTable.drop(loc)
  }

  test("end-to-end upsert stream: updates apply once, inserts stream downstream") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val loc = tmpDir("graft-upsert-e2e") + "/tbl"
    val chk = tmpDir("graft-upsert-chk")
    val t = GraftTable.create(spark, loc, schema)
    t.append(Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v"))

    // downstream reader stream BEFORE the upserts: it must receive the
    // seed rows plus exactly the inserted keys, never updated carries
    val downChk = tmpDir("graft-upsert-down")
    val down = spark.readStream.format("graft").load(loc)
      .writeStream.format("memory").queryName("upsert_down")
      .option("checkpointLocation", downChk).start()
    try {
      down.processAllAvailable()

      val src = MemoryStream[(Int, String)]
      val q = GraftStreamUpsert.start(src.toDF().toDF("k", "v"), t, Seq("k"),
        chk, Trigger.AvailableNow())
      src.addData((2, "b1"), (50, "n50"))
      q.awaitTermination()
      assert(t.read().as[(Int, String)].collect().toMap ===
        Map(1 -> "a", 2 -> "b1", 3 -> "c", 50 -> "n50"))

      // second trigger run on the same checkpoint: new batch applies once
      val q2 = GraftStreamUpsert.start(src.toDF().toDF("k", "v"), t, Seq("k"),
        chk, Trigger.AvailableNow())
      src.addData((50, "n51"), (60, "n60"))
      q2.awaitTermination()
      assert(t.read().as[(Int, String)].collect().toMap ===
        Map(1 -> "a", 2 -> "b1", 3 -> "c", 50 -> "n51", 60 -> "n60"))

      down.processAllAvailable()
      val seen = spark.table("upsert_down").select("k")
        .collect().map(_.getInt(0)).sorted.toSeq
      assert(seen === Seq(1, 2, 3, 50, 60),
        s"downstream must see seeds + inserts exactly once, got $seen")
    } finally down.stop()
    GraftTable.drop(loc)
  }
}
