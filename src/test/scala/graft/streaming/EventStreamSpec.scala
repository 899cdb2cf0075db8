package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.storage.{GraftTable, GraftTableOptions}

/** Streaming ingest + windowed agg end-to-end: feed the real events table
  * through a file-source stream in two chunks, land it in a GraftTable,
  * and check the streaming windowed counts equal the batch operator's. */
class EventStreamSpec extends SparkSpec {

  test("streaming ingest into GraftTable matches batch row count") {
    val events = Tables.load(spark, sf("sf0.001"), "events")
    val total = events.count()
    val src = tmpDir("stream-src")
    // two "arriving" files
    events.filter(col("event_id") % 2 === 0).write.parquet(s"$src/f0")
    events.filter(col("event_id") % 2 === 1).write.parquet(s"$src/f1")
    // flatten: file source watches a directory of parquet files
    val flat = tmpDir("stream-flat")
    Seq("f0", "f1").foreach { d =>
      Files.list(Paths.get(src, d)).forEach { p =>
        if (p.toString.endsWith(".parquet"))
          Files.copy(p, Paths.get(flat, s"$d-${p.getFileName}"))
      }
    }
    val loc = tmpDir("stream-table") + "/events"
    val table = GraftTable.create(spark, loc, EventStream.eventSchema,
      GraftTableOptions())
    val q = EventStream.ingest(spark, flat, table, tmpDir("stream-ckpt"))
    q.awaitTermination(120000)
    assert(table.read().count() === total)
    assert(table.rowCountFromMetadata() === total)
    GraftTable.drop(loc)
  }

  test("streaming windowed counts equal the batch operator") {
    val events = Tables.load(spark, sf("sf0.001"), "events")
    val flat = tmpDir("stream-agg-src")
    events.write.mode("overwrite").parquet(flat)
    val q = EventStream.aggregateToMemory(spark, flat, "win_counts",
      tmpDir("stream-agg-ckpt"))
    q.awaitTermination(120000)
    val streamed = spark.table("win_counts")
      .orderBy("hour_epoch", "event_type").collect()
    val batch = graft.operators.Events.e1TumblingWindow(spark, sf("sf0.001"))
      .collect()
    assert(streamed.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq)
  }
  test("streaming outlier scoring equals the batch e7 operator") {
    val dir = sf("sf0.001")
    val flat = tmpDir("outlier-src")
    Tables.load(spark, dir, "events").write.mode("overwrite").parquet(flat)
    val q = EventStream.outliersToMemory(spark, flat,
      graft.operators.Events.e7TypeStats(spark, dir),
      "stream_outliers", tmpDir("outlier-ckpt"))
    q.awaitTermination(120000)
    val streamed = spark.table("stream_outliers")
      .orderBy("event_type", "event_id").collect()
    val batch = graft.operators.Events.e7Outliers(spark, dir).collect()
    assert(streamed.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq)
    assert(batch.nonEmpty, "the corpus has outliers to score")
  }

  test("stream-stream interval join equals the batch interval join") {
    val dir = sf("sf0.001")
    val flat = tmpDir("attr-src")
    Tables.load(spark, dir, "events").write.mode("overwrite").parquet(flat)
    val q = EventStream.attributionToMemory(spark, flat, "stream_attr",
      tmpDir("attr-ckpt"))
    q.awaitTermination(120000)
    val streamed = spark.table("stream_attr")
      .orderBy("purchase_id", "click_id").collect()
    // the same interval join, batch: every same-user click within the
    // hour before each purchase
    val ev = Tables.load(spark, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
    val batch = purchases.join(clicks,
      col("c_user") === col("p_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("purchase_id"), col("click_id"),
        col("p_user").as("user_id"),
        col("purchase_ts").cast("long").as("purchase_epoch"),
        col("click_ts").cast("long").as("click_epoch"))
      .orderBy("purchase_id", "click_id").collect()
    assert(batch.nonEmpty, "the corpus has attributable purchases")
    assert(streamed.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq)
  }

  test("LEFT OUTER interval join: unconverted clicks equal the batch left join") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val ev = Tables.load(spark, dir, "events")
    val flat = tmpDir("unconv-src")
    ev.write.mode("overwrite").parquet(flat)
    // sentinels two days past the corpus close BOTH sides' watermarks
    // (each withWatermark node tracks only the rows it sees, and the
    // global watermark is their min), so every real click's one-hour
    // window provably closes and the trailing null-extended rows flush
    // before the AvailableNow drain stops
    val maxTs = ev.agg(max("ts")).head.getTimestamp(0).getTime
    val day = 24 * 3600 * 1000L
    Seq(
      (-999L, new java.sql.Timestamp(maxTs + 2 * day), -999L, "click", 0.0, "{}"),
      (-998L, new java.sql.Timestamp(maxTs + 2 * day), -998L, "purchase", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("append").parquet(flat)
    val q = EventStream.unconvertedToMemory(spark, flat, "stream_unconv",
      tmpDir("unconv-ckpt"))
    q.awaitTermination(120000)
    val streamed = spark.table("stream_unconv")
      .filter(col("user_id") > -900) // the sentinels are not under test
      .orderBy("click_id", "purchase_id").collect()
    // the same left join, batch, over the original corpus
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
    val batch = clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"),
      "left_outer")
      .select(col("click_id"), col("c_user").as("user_id"),
        col("click_ts").cast("long").as("click_epoch"), col("purchase_id"))
      .orderBy("click_id", "purchase_id").collect()
    assert(batch.exists(_.isNullAt(3)), "corpus must have unconverted clicks")
    assert(batch.exists(!_.isNullAt(3)), "corpus must have converted clicks")
    assert(streamed.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq)
  }

  test("streaming dedup drops duplicate event_ids across files") {
    import org.apache.spark.sql.functions._
    val events = Tables.load(spark, sf("sf0.001"), "events").limit(500)
    val src = tmpDir("dedup-src")
    // the same 500 events written twice = every id duplicated
    events.write.parquet(s"$src/f0")
    events.write.mode("append").parquet(s"$src/f0") // same dir, new files
    val loc = tmpDir("dedup-table") + "/events"
    val table = GraftTable.create(spark, loc, EventStream.eventSchema,
      GraftTableOptions())
    val q = EventStream.dedupedIngest(spark, s"$src/f0", table, tmpDir("dedup-ckpt"))
    q.awaitTermination(120000)
    assert(table.read().count() === 500)
    assert(table.read().select("event_id").distinct().count() === 500)
    GraftTable.drop(loc)
  }

  test("dedup state is EVICTED past the watermark — bounded state on an unbounded stream") {
    import spark.implicits._
    def ev(id: Long, tsMs: Long) =
      (id, new java.sql.Timestamp(tsMs), 1L, "click", 1.0, "{}")
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val hour = 3600 * 1000L
    val src = tmpDir("evict-src")
    val ckpt = tmpDir("evict-ckpt")
    val loc = tmpDir("evict-table") + "/events"
    val table = GraftTable.create(spark, loc, EventStream.eventSchema,
      GraftTableOptions())
    def run(): Unit = {
      val q = EventStream.dedupedIngest(spark, src, table, ckpt)
      q.awaitTermination(120000); ()
    }
    def write(name: String, rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]): Unit = {
      // stage then copy the bare part-file in: the file source wants a flat
      // directory of parquet files, not nested write dirs
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(s"$src-stage/$name")
      java.nio.file.Files.list(java.nio.file.Paths.get(s"$src-stage/$name"))
        .filter(_.toString.endsWith(".parquet"))
        .forEach(p => java.nio.file.Files.copy(p,
          java.nio.file.Paths.get(src, s"$name.parquet")))
    }

    // batch 1: event 1 plus an in-horizon duplicate — duplicate dropped
    write("b1", Seq(ev(1L, t0), ev(1L, t0 + 60000), ev(2L, t0)))
    run()
    assert(table.read().filter(col("event_id") === 1).count() === 1)
    // batch 2: advance the watermark 10h past event 1 → its state ages out
    write("b2", Seq(ev(3L, t0 + 10 * hour)))
    run()
    // batch 3: event_id 1 re-arrives beyond the dedup horizon. With state
    // properly evicted it is EMITTED again (the documented
    // within-watermark dedup contract); the round-2 bug (dropDuplicates
    // keyed without the event-time column) would both leak state forever
    // and wrongly drop this row.
    write("b3", Seq(ev(1L, t0 + 10 * hour + 60000)))
    run()
    assert(table.read().filter(col("event_id") === 1).count() === 2,
      "state must be evicted past the watermark; re-arrival re-emits")
    GraftTable.drop(loc)
  }
}
