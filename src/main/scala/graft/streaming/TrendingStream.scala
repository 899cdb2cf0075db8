package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming twin of the batch trending analysis (e11): per-6-hour
  * tumbling window, each event type's count — the live half computed by
  * Spark's WATERMARKED window aggregation through the state store
  * (unlike the funnel/retention twins, no custom state is needed: the
  * windowed groupBy is exactly the built-in this shape exists for). The
  * trend comparison (this window vs the previous adjacent one) runs as
  * a batch lag over the drained GRID — windows × types rows, thousands
  * at any event volume — so the streaming state is bounded by open
  * windows only and the append-mode contract is clean: a window emits
  * once, when the watermark passes its end, and never re-states.
  *
  * Window closure: append mode only emits windows the watermark has
  * passed, and the watermark trails the maximum event time seen — so
  * the LAST real window would stay open forever on a drained directory.
  * The drain harness appends one sentinel event two windows past the
  * real maximum: it pushes the watermark beyond every real window's
  * end, and its own window (the only one still open) is never emitted —
  * the drained grid is exactly the batch grid, no filtering needed. */
object TrendingStream {

  val WindowSec = 21600L // 6 hours

  /** Finalized (win6h, event_type, cnt) grid rows — win6h is the
    * window start in units of 6 hours since the epoch, identical to the
    * batch `unix_timestamp(ts) div 21600` (tumbling windows are
    * epoch-aligned). */
  def windowCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select((col("w.start").cast("long") / WindowSec).cast("long").as("win6h"),
        col("event_type"), col("cnt"))

  def run(spark: SparkSession, srcDir: String, queryName: String,
      checkpointDir: String): StreamingQuery =
    windowCounts(EventStream.readEvents(spark, srcDir)
      .select("ts", "event_type"))
      .writeStream
      .outputMode("append")
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .format("memory")
      .start()

  /** Batch trend over the drained grid — e11's comparison BY REFERENCE
    * ([[graft.operators.Events.trendOverGrid]]): one definition, so the
    * twin can never drift from the batch operator or its oracle. */
  def trends(grid: DataFrame): DataFrame =
    graft.operators.Events.trendOverGrid(grid)
}
