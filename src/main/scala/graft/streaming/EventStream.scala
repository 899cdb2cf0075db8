package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.storage.GraftTable

/** Structured Streaming extensions over the `events` stream — additive to
  * the reference, which is batch-only (SURVEY.md §7.2 step 7). Two jobs:
  *
  *  - [[ingest]]: streaming append into the GraftTable columnar layer via
  *    `foreachBatch` — each micro-batch commits through the table's atomic
  *    metadata protocol, so readers always see whole batches (the same
  *    visibility story as the reference's footer rename,
  *    `/root/reference/cstore_writer.c:344-357`).
  *  - [[windowedCounts]]: watermarked tumbling-window aggregation — the
  *    streaming twin of [[graft.operators.Events.e1TumblingWindow]].
  *
  * At scale: the file source lists incrementally, window state is bounded
  * by the watermark, and the sink shuffle is per (window × event_type) —
  * both low-cardinality. */
object EventStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream of event rows (parquet files dropped into `dir`). */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Watermarked 1-hour tumbling counts per event_type. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("value") * 10000).cast("long")).as("vsum_x10000"))
      .select(col("w.start").cast("long").as("hour_epoch"),
        col("event_type"), col("cnt"), col("vsum_x10000"))

  /** Streaming exact dedup — the streaming twin of the batch d1
    * operator. `dropDuplicatesWithinWatermark` keys state on event_id
    * and EVICTS an entry once the watermark passes its event time plus
    * the delay — bounded state on an unbounded stream. (Plain
    * `dropDuplicates("event_id")` never evicts: the dedup key lacks the
    * event-time column, so the watermark can't age anything out and
    * state grows without bound — executor OOM on exactly the workload
    * this operator exists for.) */
  def dedup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming ingest with exact dedup into a GraftTable, exactly-once
    * via [[GraftStreamIngest]]'s txn watermark. */
  def dedupedIngest(spark: SparkSession, srcDir: String, table: GraftTable,
      checkpointDir: String): StreamingQuery =
    GraftStreamIngest.start(dedup(readEvents(spark, srcDir)), table,
      checkpointDir, Trigger.AvailableNow())

  /** Streaming ingest into a GraftTable: one atomic table append per
    * micro-batch, replay-deduped by the metadata txn watermark
    * (exactly-once — see [[GraftStreamIngest]]). Returns the started
    * query; callers own its lifecycle. */
  def ingest(spark: SparkSession, srcDir: String, table: GraftTable,
      checkpointDir: String): StreamingQuery =
    GraftStreamIngest.start(readEvents(spark, srcDir), table,
      checkpointDir, Trigger.AvailableNow())

  /** Windowed aggregate stream to an in-memory sink (tests/dashboards). */
  def aggregateToMemory(spark: SparkSession, srcDir: String, queryName: String,
      checkpointDir: String): StreamingQuery =
    windowedCounts(readEvents(spark, srcDir)).writeStream
      .outputMode("complete")
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .format("memory")
      .start()

  /** Streaming 3σ outlier scoring — the streaming twin of the batch
    * [[graft.operators.Events.e7Outliers]]: a STREAM-STATIC enrichment
    * join against batch-trained per-type moments
    * ([[graft.operators.Events.e7TypeStats]]), the canonical
    * train-batch/score-stream shape. The static side is a
    * handful-of-types broadcast, so scoring is stateless per event —
    * no watermark, no state store, arbitrary stream length. */
  def scoreOutliers(events: DataFrame, typeStats: DataFrame): DataFrame =
    graft.operators.Events.scoreAgainstStats(events, typeStats)

  /** Outlier-scored stream to an in-memory sink (tests/dashboards). */
  def outliersToMemory(spark: SparkSession, srcDir: String, typeStats: DataFrame,
      queryName: String, checkpointDir: String): StreamingQuery =
    scoreOutliers(readEvents(spark, srcDir), typeStats).writeStream
      .outputMode("append")
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .format("memory")
      .start()

  /** STREAM-STREAM attribution join — every (purchase, click) pair of
    * the same user with the click inside the hour before the purchase.
    * The streaming cousin of the batch AS-OF join (e4): e4 keeps only
    * the LATEST prior click (one window pass over history); a live
    * pipeline can't wait for history to close, so the streaming shape is
    * the watermarked interval join — Spark buffers each side's state
    * only within the join's time bound plus the watermark delay, then
    * provably discards it (state cleanup is exactly why both sides must
    * carry a watermark AND the condition must bound event-time distance;
    * an unbounded-time join would accumulate state forever).
    *
    * At scale: state per key is O(events within the 1-hour bound), the
    * join shuffles both sides on user_id once, and output is append-mode
    * (inner join emits as soon as both sides arrive). */
  def attributionJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", "2 hours")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("purchase_ts", "2 hours")
    purchases.join(clicks,
      col("c_user") === col("p_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("purchase_id"), col("click_id"),
        col("p_user").as("user_id"),
        col("purchase_ts").cast("long").as("purchase_epoch"),
        col("click_ts").cast("long").as("click_epoch"))
  }

  /** Attribution-joined stream to an in-memory sink (tests/dashboards). */
  def attributionToMemory(spark: SparkSession, srcDir: String,
      queryName: String, checkpointDir: String): StreamingQuery =
    attributionJoin(readEvents(spark, srcDir)).writeStream
      .outputMode("append")
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .format("memory")
      .start()

  /** STREAM-STREAM LEFT OUTER interval join — every click paired with
    * each same-user purchase in the FOLLOWING hour, or emitted once with
    * a NULL purchase when no purchase can arrive anymore: the
    * un-converted-click feed (the abandonment signal a live funnel
    * wants, which the inner join structurally cannot produce).
    *
    * Where the inner interval join emits eagerly as pairs meet, the
    * null-extended row may only emit once the watermark PROVES the
    * click's one-hour window closed on the purchase side too — so this
    * operator rides the state-store eviction clock itself, and Spark
    * requires exactly what state-boundedness requires: watermarks on
    * both sides plus an event-time-bounded condition. State per key is
    * O(events in the window + delay); the null rows trail live data by
    * the watermark delay, the price of proving a negative on a stream.
    * Both sides must keep advancing for the global watermark (min of
    * the two) to move — a purchase drought delays ONLY the null
    * emissions, never corrupts them. */
  def unconvertedClicks(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", "2 hours")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("purchase_ts", "2 hours")
    clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"),
      "left_outer")
      .select(col("click_id"), col("c_user").as("user_id"),
        col("click_ts").cast("long").as("click_epoch"),
        col("purchase_id"))
  }

  /** Unconverted-clicks stream to an in-memory sink. */
  def unconvertedToMemory(spark: SparkSession, srcDir: String,
      queryName: String, checkpointDir: String): StreamingQuery =
    unconvertedClicks(readEvents(spark, srcDir)).writeStream
      .outputMode("append")
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .format("memory")
      .start()
}
