package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.storage.GraftTable

/** Graft table as a STREAMING SOURCE: micro-batches keyed by snapshot
  * versions. Appends stream exactly their new rows; compaction rewrites
  * are never re-delivered (row count unchanged ⇒ skipped); restart from
  * the checkpoint resumes at the committed version with no duplicates. */
class GraftStreamSourceSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType), StructField("v", StringType)))

  test("version-offset micro-batches: appends stream, compaction does not") {
    import spark.implicits._
    val loc = tmpDir("gss") + "/t"
    val ckpt = tmpDir("gss-ckpt")
    val t = GraftTable.create(spark, loc, schema)
    t.append(Seq((1, "a"), (2, "b")).toDF("id", "v"))

    val q = spark.readStream.format("graft").load(loc)
      .writeStream.format("memory").queryName("gss_sink")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(spark.table("gss_sink").count() === 2L)

      // a second append streams exactly its rows
      t.append(Seq((3, "c")).toDF("id", "v"))
      q.processAllAvailable()
      assert(spark.table("gss_sink").orderBy("id").select("id")
        .collect().map(_.getInt(0)).toSeq === Seq(1, 2, 3))

      // compaction rewrites all rows into new files at the same row
      // count — the stream must NOT re-deliver them
      assert(t.compact() >= 1)
      q.processAllAvailable()
      assert(spark.table("gss_sink").count() === 3L,
        "compaction must not re-deliver rows")

      // and appends after compaction still stream
      t.append(Seq((4, "d")).toDF("id", "v"))
      q.processAllAvailable()
      assert(spark.table("gss_sink").count() === 4L)
    } finally q.stop()
    GraftTable.drop(loc)
  }

  test("segmented (manifest-form) table: the raw-snapshot walk delivers exactly, across manifest compaction and a throttled backlog") {
    import spark.implicits._
    val loc = tmpDir("gss-seg") + "/t"
    val ckpt = tmpDir("gss-seg-ckpt")
    val t = GraftTable.create(spark, loc, schema)
    // past InlineStatsMax: every snapshot carries only segment REFS,
    // so the forward walk exercises commitFileDelta's extension path
    // (round 16) rather than inline lists
    t.append((0 until 200).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(20))
    assert(GraftTable.readHistoryRaw(loc,
      GraftTable.committedVersion(loc)).manifest.nonEmpty,
      "must be segment form")

    val q = spark.readStream.format("graft")
      .option("maxVersionsPerTrigger", "1").load(loc)
      .writeStream.format("memory").queryName("gss_seg_sink")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(spark.table("gss_seg_sink").count() === 200L)
      // a BACKLOG of appends, with a small-file compaction commit in
      // the middle (the manifest rewrite the extension walk cannot
      // express → the per-pair hydration fallback) — drained one
      // version per trigger, delivery must be exact, nothing twice
      t.append(Seq((200, "x")).toDF("id", "v").coalesce(1))
      t.append(Seq((201, "y")).toDF("id", "v").coalesce(1))
      assert(t.compactSmall() > 0, "the small-file tail must fold")
      t.append(Seq((202, "z")).toDF("id", "v").coalesce(1))
      q.processAllAvailable()
      val got = spark.table("gss_seg_sink").select("id")
        .collect().map(_.getInt(0)).sorted.toSeq
      assert(got === (0 to 202), s"exact delivery: got ${got.size} rows, " +
        s"dupes=${got.groupBy(identity).count(_._2.size > 1)}")
    } finally q.stop()
    GraftTable.drop(loc)
  }

  test("row-level mutations: MERGE streams only its inserts; DELETE/UPDATE stream nothing") {
    import spark.implicits._
    val loc = tmpDir("gss-mut") + "/t"
    val ckpt = tmpDir("gss-mut-ckpt")
    val t = GraftTable.create(spark, loc, schema)
    t.append(Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v"))

    val q = spark.readStream.format("graft").load(loc)
      .writeStream.format("memory").queryName("gss_mut_sink")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(spark.table("gss_mut_sink").count() === 3L)

      // MERGE rewrites the candidate files (carried + updated rows) AND
      // appends one insert — the stream must deliver ONLY the insert,
      // never the rewritten carries (they were already delivered)
      val (u, i) = t.merge(Seq((2, "b2"), (9, "new")).toDF("id", "v"), Seq("id"))
      assert((u, i) === (1L, 1L))
      q.processAllAvailable()
      val afterMerge = spark.table("gss_mut_sink").select("id")
        .collect().map(_.getInt(0)).sorted.toSeq
      assert(afterMerge === Seq(1, 2, 3, 9),
        s"MERGE must stream only its inserted rows, got $afterMerge")

      // UPDATE (no row growth) and DELETE (shrink) stream nothing
      assert(t.update(Map("v" -> lit("upd")),
        Seq(org.apache.spark.sql.sources.EqualTo("id", Integer.valueOf(1)))) === 1L)
      assert(t.delete(
        Seq(org.apache.spark.sql.sources.EqualTo("id", Integer.valueOf(3)))) === 1L)
      q.processAllAvailable()
      assert(spark.table("gss_mut_sink").count() === 4L,
        "UPDATE/DELETE commits must not re-deliver rows")

      // appends after the mutations still stream exactly their rows
      t.append(Seq((10, "j")).toDF("id", "v"))
      q.processAllAvailable()
      assert(spark.table("gss_mut_sink").count() === 5L)
    } finally q.stop()
    GraftTable.drop(loc)
  }

  test("a net-shrinking CDC batch still streams its inserted rows") {
    import spark.implicits._
    val loc = tmpDir("gss-cdc-shrink") + "/t"
    val t = GraftTable.create(spark, loc, schema)
    t.append(Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")).toDF("id", "v"))

    val q = spark.readStream.format("graft").load(loc)
      .writeStream.format("memory").queryName("gss_cdc_shrink")
      .option("checkpointLocation", tmpDir("gss-cdc-shrink-ckpt")).start()
    try {
      q.processAllAvailable()
      assert(spark.table("gss_cdc_shrink").count() === 4L)

      // CDC batch: 3 deletes + 1 brand-new insert → the commit's row
      // count SHRINKS (4 → 2), yet the insert files are declared in
      // emitFiles. The declaration is authoritative: the stream must
      // deliver id=9 — a row-growth gate alone would silently drop it
      // (the exactly-once violation this test pins down).
      val cdc = Seq((1, "x", "D"), (2, "x", "D"), (3, "x", "D"), (9, "new", "U"))
        .toDF("id", "v", "op")
      val (up, ins, del) = t.applyCdc(cdc, Seq("id"), "op", "D")
      assert((up, ins, del) === (0L, 1L, 3L))
      assert(t.rowCountFromMetadata() === 2L)
      q.processAllAvailable()
      val got = spark.table("gss_cdc_shrink").select("id")
        .collect().map(_.getInt(0)).sorted.toSeq
      assert(got === Seq(1, 2, 3, 4, 9),
        s"the shrinking CDC commit's insert must stream exactly once, got $got")
    } finally q.stop()
    GraftTable.drop(loc)
  }

  test("maxVersionsPerTrigger throttles a backlog into bounded micro-batches") {
    import spark.implicits._
    val loc = tmpDir("gss-throttle") + "/t"
    val t = GraftTable.create(spark, loc, schema)
    for (i <- 1 to 4) t.append(Seq((i, s"v$i")).toDF("id", "v"))
    val q = spark.readStream.format("graft")
      .option("maxVersionsPerTrigger", "1")
      .load(loc)
      .writeStream.format("memory").queryName("gss_throttle")
      .option("checkpointLocation", tmpDir("gss-throttle-ckpt"))
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("gss_throttle").count() === 4L)
      // the 4-append backlog drained one commit per micro-batch: at
      // least 4 batches ran (vs 1 giant batch unthrottled)
      assert(q.recentProgress.count(_.numInputRows > 0) >= 4,
        q.recentProgress.map(_.numInputRows).mkString(","))
    } finally q.stop()
    GraftTable.drop(loc)
  }

  test("fresh stream on a history-expired table: oldest retained snapshot is the initial load") {
    import spark.implicits._
    val loc = tmpDir("gss-exp") + "/t"
    val t = GraftTable.create(spark, loc, schema)
    t.append(Seq((1, "a")).toDF("id", "v"))
    t.append(Seq((2, "b")).toDF("id", "v"))
    t.append(Seq((3, "c")).toDF("id", "v"))
    assert(t.expireHistory(keepLast = 2) > 0) // v0..v1 gone; v2, v3 retained
    val q = spark.readStream.format("graft").load(loc)
      .writeStream.format("memory").queryName("gss_exp")
      .option("checkpointLocation", tmpDir("gss-exp-ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000))
    // initial batch = all of v2's files, then v3's delta — the full table
    assert(spark.table("gss_exp").orderBy("id").select("id")
      .collect().map(_.getInt(0)).toSeq === Seq(1, 2, 3))
    GraftTable.drop(loc)
  }

  test("fresh throttled stream on a history-expired table jumps past the expired prefix") {
    import spark.implicits._
    val loc = tmpDir("gss-exp-thr") + "/t"
    val t = GraftTable.create(spark, loc, schema)
    for (i <- 1 to 4) t.append(Seq((i, s"v$i")).toDF("id", "v"))
    assert(t.expireHistory(keepLast = 2) > 0) // only v3, v4 retained
    // With maxVersionsPerTrigger=1, the naive first end would be version
    // 1 — inside the expired prefix — so the first batch would be empty,
    // the checkpoint would commit an unservable offset, and the next
    // batch would fail with 'no snapshot'. The source must instead jump
    // the fresh stream to the oldest retained version.
    val q = spark.readStream.format("graft")
      .option("maxVersionsPerTrigger", "1")
      .load(loc)
      .writeStream.format("memory").queryName("gss_exp_thr")
      .option("checkpointLocation", tmpDir("gss-exp-thr-ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), q.exception.map(_.toString).getOrElse(""))
    assert(q.exception.isEmpty, q.exception.map(_.toString).getOrElse(""))
    assert(spark.table("gss_exp_thr").orderBy("id").select("id")
      .collect().map(_.getInt(0)).toSeq === Seq(1, 2, 3, 4))
    GraftTable.drop(loc)
  }

  test("Trigger.AvailableNow drains the source and stops") {
    import spark.implicits._
    val loc = tmpDir("gss-an") + "/t"
    val t = GraftTable.create(spark, loc, schema)
    t.append(Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v"))
    val q = spark.readStream.format("graft").load(loc)
      .writeStream.format("memory").queryName("gss_an")
      .option("checkpointLocation", tmpDir("gss-an-ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "AvailableNow query must terminate")
    assert(spark.table("gss_an").count() === 3L)
    GraftTable.drop(loc)
  }

  test("mid-stream ADD COLUMN: batches keep the stream's start schema, consistently") {
    import spark.implicits._
    val loc = tmpDir("gss-evolve") + "/t"
    val t = GraftTable.create(spark, loc, schema)
    t.append(Seq((1, "a")).toDF("id", "v"))
    val q = spark.readStream.format("graft").load(loc)
      .writeStream.format("memory").queryName("gss_evolve")
      .option("checkpointLocation", tmpDir("gss-evolve-ckpt")).start()
    try {
      q.processAllAvailable()
      // widen the table mid-stream, then append rows carrying the new column
      t.addColumn("flag", IntegerType, default = 7)
      GraftTable.open(spark, loc)
        .append(Seq((2, "b", 9)).toDF("id", "v", "flag"))
      q.processAllAvailable()
      assert(q.exception.isEmpty, q.exception.map(_.toString).getOrElse(""))
      // post-ALTER rows are served in the START schema: present, with
      // exactly the start columns — never a torn or widened batch
      val sink = spark.table("gss_evolve")
      assert(sink.columns.toSeq === Seq("id", "v"))
      assert(sink.orderBy("id").collect().map(r => (r.getInt(0), r.getString(1)))
        .toSeq === Seq((1, "a"), (2, "b")))
    } finally q.stop()
    GraftTable.drop(loc)
  }

  test("mid-stream type change of a read column fails the batch with a clear error") {
    import spark.implicits._
    val loc = tmpDir("gss-retype") + "/t"
    val t = GraftTable.create(spark, loc, schema)
    t.append(Seq((1, "a")).toDF("id", "v"))
    val q = spark.readStream.format("graft").load(loc)
      .writeStream.format("memory").queryName("gss_retype")
      .option("checkpointLocation", tmpDir("gss-retype-ckpt")).start()
    try {
      q.processAllAvailable()
      // a widening ALTER re-types a column the stream reads: new files
      // carry LONG where the stream expects INT — unservable in the
      // start schema, so the stream must fail clearly, not miscast
      t.alterColumnType("id", LongType)
      GraftTable.open(spark, loc)
        .append(Seq((2L, "b")).toDF("id", "v"))
      val ex = intercept[Exception] { q.processAllAvailable() }
      val msg = Option(ex.getMessage).getOrElse("") +
        q.exception.map(_.toString).getOrElse("")
      assert(msg.contains("restart the stream"), s"unexpected failure: $msg")
    } finally q.stop()
    GraftTable.drop(loc)
  }

  test("streaming source composes with the streaming ingest (table-to-table relay)") {
    import spark.implicits._
    val src = tmpDir("gss-relay") + "/src"
    val dst = tmpDir("gss-relay") + "/dst"
    val ckpt = tmpDir("gss-relay-ckpt")
    val s = GraftTable.create(spark, src, schema)
    val d = GraftTable.create(spark, dst, schema)
    s.append(Seq((1, "a"), (2, "b")).toDF("id", "v"))
    val q = GraftStreamIngest.start(
      spark.readStream.format("graft").load(src), d, ckpt,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime("500 milliseconds"))
    try {
      q.processAllAvailable()
      assert(d.read().count() === 2L)
      s.append(Seq((3, "c")).toDF("id", "v"))
      q.processAllAvailable()
      assert(d.read().orderBy("id").collect().map(_.getInt(0)).toSeq === Seq(1, 2, 3))
    } finally q.stop()

    // restart from the checkpoint: the committed offset resumes the
    // stream — no duplicates, only post-stop appends are delivered
    s.append(Seq((4, "d")).toDF("id", "v"))
    val q2 = GraftStreamIngest.start(
      spark.readStream.format("graft").load(src), d, ckpt,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime("500 milliseconds"))
    try {
      q2.processAllAvailable()
      assert(d.read().orderBy("id").collect().map(_.getInt(0)).toSeq ===
        Seq(1, 2, 3, 4), "restart must deliver exactly the new append")
    } finally q2.stop()
    GraftTable.drop(src); GraftTable.drop(dst)
  }
}
