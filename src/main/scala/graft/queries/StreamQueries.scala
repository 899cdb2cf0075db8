package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.streaming.FunnelStream

/** Driver-oracle-checked STREAMING entries — the streaming surface was
  * spec-bound only (Event/Session/Funnel/DedupStream specs) until n9
  * proved the pattern: drain a real stream end-to-end inside the entry,
  * then hand the driver the drained result to hash against DuckDB
  * recomputing the same answer declaratively over the raw parquet. Here
  * the funnel and retention state machines ([[FunnelStream]]) earn the
  * same check: a single-batch AvailableNow drain processes rows in
  * event-time order, which makes the monotone streaming state compute
  * exactly the batch answer (see FunnelStream's semantics note), so the
  * batch oracles apply verbatim.
  */
object StreamQueries {

  // The stream source is the events table normalized through
  // Tables.load (the file-stream source needs a fixed schema; the raw
  // parquet's ts encoding is the generator's choice) — written ONCE per
  // (session, input dir) and shared by both entries.
  private val srcCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]()

  private def streamSrc(s: SparkSession, dir: String): String =
    srcCache.computeIfAbsent((s, dir), { _ =>
      val out = Files.createTempDirectory("graft_stream_src").toString
      Tables.load(s, dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(out)
      out
    })

  private def uniq(prefix: String): String =
    prefix + "_" + java.util.UUID.randomUUID().toString.replace("-", "").take(10)

  /** Clone of the caller's session with FEW shuffle/state partitions for
    * the drain (optimization round 17, guide §2.2 fewer-larger
    * partitions): a stateful AvailableNow drain pays per-PARTITION
    * state-store open/commit/checkpoint on every one of the session's
    * shuffle partitions while the whole state is a few thousand rows —
    * at 32 partitions that was ~2/3 of these entries' tasks. Keyed
    * aggregation output is partition-count-invariant, so the oracle is
    * untouched. Sized from the entry's own bounded state (the window ×
    * type grid / user set), not from the machine; the batch operators
    * keep the session default. The memory-sink table registers in the
    * CLONE's catalog — callers read it through the returned session. */
  private def drainSession(s: SparkSession): SparkSession = {
    val s2 = s.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    s2
  }

  /** e9: the funnel state machine over a drained stream; rollup matches
    * batch e5's output shape, so e5's oracle applies verbatim. */
  def e9StreamFunnel(s: SparkSession, dir: String): DataFrame = {
    val sink = uniq("e9_funnel")
    val s2 = drainSession(s)
    val q = FunnelStream.runFunnel(s2, streamSrc(s, dir), sink,
      Files.createTempDirectory("graft_e9_ckpt").toString)
    require(q.awaitTermination(180000), "e9 stream drain timed out")
    FunnelStream.funnelCounts(s2.table(sink))
  }

  /** e10: the retention cell emitter over a drained stream; each (user,
    * cell) emits at most once, so the rollup's plain count equals the
    * batch distinct-user count. */
  def e10StreamRetention(s: SparkSession, dir: String): DataFrame = {
    val sink = uniq("e10_retention")
    val s2 = drainSession(s)
    val q = FunnelStream.runRetention(s2, streamSrc(s, dir), sink,
      Files.createTempDirectory("graft_e10_ckpt").toString)
    require(q.awaitTermination(180000), "e10 stream drain timed out")
    FunnelStream.retentionCounts(s2.table(sink))
  }

  /** e12: watermarked window aggregation drained end-to-end — the
    * trending grid comes from the state store (append-mode window
    * emission), the trend lag runs as a batch over the tiny grid, and
    * batch e11's oracle applies verbatim. The source gets one sentinel
    * event two windows past the real maximum: it closes every real
    * window (watermark passes their ends) and its own window, never
    * closed, never emits. */
  private val trendSrcCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]()

  private def trendingSrc(s: SparkSession, dir: String): String =
    trendSrcCache.computeIfAbsent((s, dir), { _ =>
      import org.apache.spark.sql.functions._
      val out = Files.createTempDirectory("graft_trend_src").toString
      val ev = Tables.load(s, dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
      val maxTs = ev.agg(max(col("ts")).cast("long")).head.getLong(0)
      val sentinel = s.range(1).select(
        lit(-1L).as("event_id"),
        timestamp_seconds(lit(maxTs + 2 * graft.streaming.TrendingStream.WindowSec))
          .as("ts"),
        lit(-1L).as("user_id"), lit("__wm").as("event_type"),
        lit(0.0).as("value"), lit(null).cast("string").as("props"))
      ev.unionByName(sentinel).write.mode("overwrite").parquet(out)
      out
    })

  def e12StreamTrending(s: SparkSession, dir: String): DataFrame = {
    val sink = uniq("e12_trend")
    val s2 = drainSession(s)
    val q = graft.streaming.TrendingStream.run(s2, trendingSrc(s, dir), sink,
      Files.createTempDirectory("graft_e12_ckpt").toString)
    require(q.awaitTermination(180000), "e12 stream drain timed out")
    graft.streaming.TrendingStream.trends(s2.table(sink))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e9_stream_funnel" -> e9StreamFunnel _,
    "e10_stream_retention" -> e10StreamRetention _,
    "e12_stream_trending" -> e12StreamTrending _)

  val oracles: Map[String, String] = Map(
    // e5's oracle BY REFERENCE: the drained stream must reproduce the
    // batch funnel exactly, and a change to e5's rule must reach its
    // twin automatically (the s7/s2 sharing pattern)
    "e9_stream_funnel" -> graft.operators.Events.oracles("e5_funnel"),
    // e6's oracle minus the per-cell event count: the stream emits one
    // row per (user, cell) first activity, so only the distinct-user
    // measure is recoverable from the emission log
    "e10_stream_retention" ->
      """WITH w AS (SELECT user_id,
        |       CAST(floor(epoch(ts)/604800) AS BIGINT) wk FROM events),
        |c AS (SELECT user_id, min(wk) cohort_wk FROM w GROUP BY user_id)
        |SELECT cohort_wk, wk - cohort_wk AS wk_offset,
        |  CAST(count(DISTINCT w.user_id) AS BIGINT) n_users
        |FROM w JOIN c ON w.user_id = c.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // e11's oracle BY REFERENCE: the drained window grid must reproduce
    // the batch grid exactly (the sentinel's window never emits)
    "e12_stream_trending" -> graft.operators.Events.oracles("e11_trending"))
}
