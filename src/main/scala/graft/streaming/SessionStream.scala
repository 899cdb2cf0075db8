package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Stateful streaming sessionization over the events stream —
  * `flatMapGroupsWithState` with event-time timeout, the Structured
  * Streaming shape for custom per-key state the built-in windowed
  * aggregates can't express (SURVEY.md §7.2 step 7; batch twin is
  * [[graft.operators.Events.e2Sessionize]]).
  *
  * State per user is O(1) (session bounds + count), keys partition across
  * executors, and the watermark bounds state retention — the properties
  * that keep this correct on an unbounded 100 TB/day stream. */
object SessionStream {

  val GapMs: Long = 30 * 60 * 1000L

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class SessionState(start: Long, lastTs: Long, nEvents: Long)
  final case class SessionOut(user_id: Long, session_start: Long,
      session_end: Long, n_events: Long)

  /** Per-key state transition — public so it can be unit-tested against
    * `TestGroupState` (the crash case below is hard to provoke through a
    * real stream, since the late-row filter usually shields it). */
  def updateSession(userId: Long, rows: Iterator[Event],
      state: GroupState[SessionState]): Iterator[SessionOut] =
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator.single(SessionOut(userId, s.start, s.lastTs, s.nEvents))
    } else {
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      val closed = Seq.newBuilder[SessionOut]
      var cur = state.getOption
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.lastTs <= GapMs =>
            cur = Some(s.copy(lastTs = t, nEvents = s.nEvents + 1))
          case Some(s) =>
            closed += SessionOut(userId, s.start, s.lastTs, s.nEvents)
            cur = Some(SessionState(t, t, 1))
          case None =>
            cur = Some(SessionState(t, t, 1))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // An event that reaches the function with lastTs + GapMs at or
        // below the current watermark (late row admitted by a config
        // change, or a bursty batch that jumps the watermark past the
        // gap) would make setTimeoutTimestamp throw an
        // IllegalArgumentException and kill the query. Clamp to just
        // above the watermark: the session then times out at the
        // earliest legal instant — same emission, no crash.
        val floor = state.getCurrentWatermarkMs() + 1
        state.setTimeoutTimestamp(math.max(s.lastTs + GapMs, floor))
      }
      closed.result().iterator
    }

  /** Emit a closed session whenever a user's gap exceeds [[GapMs]] (or
    * the state times out past the watermark). */
  def sessionize(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(updateSession)
  }

  /** File-source pipeline to an in-memory sink for tests/dashboards. */
  def run(spark: SparkSession, srcDir: String, queryName: String,
      checkpointDir: String): StreamingQuery = {
    import spark.implicits._
    val events = EventStream.readEvents(spark, srcDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event]
    sessionize(events).writeStream
      .outputMode("append")
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .format("memory")
      .start()
  }
}
