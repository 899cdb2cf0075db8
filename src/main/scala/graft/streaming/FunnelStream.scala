package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Streaming twins of the batch funnel (e5) and weekly cohort retention
  * (e6) analyses — the two growth-analytics shapes round 7 left without a
  * live counterpart (e7's outlier scorer already has one). Both are
  * `flatMapGroupsWithState` keyed on user_id, the Structured Streaming
  * shape for per-key state the built-in aggregates can't express.
  *
  * Semantics vs the batch twins: the batch queries recompute globally, so
  * a late-arriving earlier event can lower a user's first-view time or
  * cohort week. Streaming state is MONOTONE — a stage, once reached, and
  * a cohort, once assigned, never retro-correct (emitted rows can't be
  * recalled in append mode). Within one micro-batch rows are processed in
  * event-time order, so a single-batch drain (Trigger.AvailableNow over a
  * closed directory) reproduces the batch results exactly; across batches
  * the streams converge to batch up to cross-batch reordering — the same
  * honesty contract as the e4 attribution twin, which trades "latest
  * prior click" for the watermarked interval join.
  *
  * At 100 TB/day: funnel state is three longs per user; retention state is
  * the cohort week plus the offsets already emitted (O(active weeks per
  * user) — a few hundred longs over a multi-year product life). Keys
  * partition across executors, each emission is at most once per (user,
  * stage) / (user, cell), so downstream counts are plain row counts with
  * no distinct state. */
object FunnelStream {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String)

  /** Exact event-time micros (Timestamp.getTime truncates to millis;
    * the nanos field carries the full sub-second). The batch twins
    * compare in integer micros — so must the state transitions, or a
    * click 500µs after its view would pass batch and fail here. */
  def micros(t: Timestamp): Long = t.getTime / 1000L * 1000000L + t.getNanos / 1000L

  val WeekUs: Long = 604800000000L

  // ---- funnel (e5 twin) ----------------------------------------------

  /** Earliest completion micros per stage; -1 = not reached. */
  final case class FunnelState(tView: Long, tClick: Long, tPurchase: Long)
  final case class StageReached(user_id: Long, stage: String, ts_us: Long)

  /** Strictly-ordered stage advance: a click counts only after the
    * user's recorded first view, a purchase only after the recorded
    * first qualifying click — the batch rule, applied monotonically.
    * Public for TestGroupState unit tests. */
  def updateFunnel(userId: Long, rows: Iterator[Event],
      state: GroupState[FunnelState]): Iterator[StageReached] = {
    val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
    var s = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
    val out = Seq.newBuilder[StageReached]
    sorted.foreach { e =>
      val t = micros(e.ts)
      e.event_type match {
        case "view" if s.tView < 0 =>
          s = s.copy(tView = t); out += StageReached(userId, "1_view", t)
        case "click" if s.tView >= 0 && s.tClick < 0 && t > s.tView =>
          s = s.copy(tClick = t); out += StageReached(userId, "2_click", t)
        case "purchase" if s.tClick >= 0 && s.tPurchase < 0 && t > s.tClick =>
          s = s.copy(tPurchase = t); out += StageReached(userId, "3_purchase", t)
        case _ => ()
      }
    }
    if (sorted.nonEmpty) state.update(s)
    out.result().iterator
  }

  /** Stage-transition stream: each user emits each stage AT MOST once,
    * so distinct users per stage downstream is a plain row count. */
  def funnelTransitions(events: Dataset[Event]): Dataset[StageReached] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, StageReached](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(updateFunnel)
  }

  // ---- weekly cohort retention (e6 twin) ------------------------------

  /** First-active week plus the week-offsets already emitted. */
  final case class RetentionState(cohortWk: Long, seenOffsets: Seq[Long])
  final case class CellHit(cohort_wk: Long, wk_offset: Long, user_id: Long)

  /** Emit (cohort, offset, user) exactly once per newly active week.
    * An event from BEFORE the recorded cohort week (late arrival across
    * batches) is dropped: the streaming cohort is first-arrival, and a
    * negative offset would denormalize every previously emitted cell.
    * Public for TestGroupState unit tests. */
  def updateRetention(userId: Long, rows: Iterator[Event],
      state: GroupState[RetentionState]): Iterator[CellHit] = {
    val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
    var s = state.getOption
    val out = Seq.newBuilder[CellHit]
    sorted.foreach { e =>
      val wk = Math.floorDiv(micros(e.ts), WeekUs)
      s match {
        case None =>
          s = Some(RetentionState(wk, Seq(0L)))
          out += CellHit(wk, 0L, userId)
        case Some(st) =>
          val off = wk - st.cohortWk
          if (off >= 0 && !st.seenOffsets.contains(off)) {
            s = Some(st.copy(seenOffsets = st.seenOffsets :+ off))
            out += CellHit(st.cohortWk, off, userId)
          }
      }
    }
    s.foreach(state.update)
    out.result().iterator
  }

  def retentionCells(events: Dataset[Event]): Dataset[CellHit] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[RetentionState, CellHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(updateRetention)
  }

  // ---- file-source pipelines to memory sinks (tests/dashboards) -------

  private def eventsOf(spark: SparkSession, srcDir: String): Dataset[Event] = {
    import spark.implicits._
    EventStream.readEvents(spark, srcDir)
      .select("event_id", "ts", "user_id", "event_type")
      .as[Event]
  }

  def runFunnel(spark: SparkSession, srcDir: String, queryName: String,
      checkpointDir: String): StreamingQuery =
    funnelTransitions(eventsOf(spark, srcDir)).writeStream
      .outputMode("append")
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .format("memory")
      .start()

  def runRetention(spark: SparkSession, srcDir: String, queryName: String,
      checkpointDir: String): StreamingQuery =
    retentionCells(eventsOf(spark, srcDir)).writeStream
      .outputMode("append")
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .format("memory")
      .start()

  /** Batch rollup of a drained transition sink to the e5 output shape. */
  def funnelCounts(transitions: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    transitions.groupBy("stage").agg(count(lit(1)).as("users")).orderBy("stage")
  }

  /** Batch rollup of a drained cell sink to the e6 output shape. */
  def retentionCounts(cells: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    cells.groupBy("cohort_wk", "wk_offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_wk", "wk_offset")
  }
}
