package graft.streaming

import graft.{SparkSpec, Tables}

/** flatMapGroupsWithState sessionization: streamed closed sessions must
  * bracket the reference computation — every gap-closed session appears
  * (gap closures emit deterministically), and nothing outside the true
  * session list appears (timeout-closed emissions depend on micro-batch
  * boundaries, so they may or may not fire before stream end). */
class SessionStreamSpec extends SparkSpec {

  test("streamed sessions match the scala-computed session list") {
    val events = Tables.load(spark, sf("sf0.001"), "events")
    val flat = tmpDir("sess-src")
    events.write.mode("overwrite").parquet(flat)

    val q = SessionStream.run(spark, flat, "sessions_out", tmpDir("sess-ckpt"))
    q.awaitTermination(180000)
    val streamed = spark.table("sessions_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    // reference: all sessions per user, computed directly
    val rows = events.select("user_id", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2)))
    val byUser = rows.groupBy(_._1)
    val all = Set.newBuilder[(Long, Long, Long, Long)]
    val gapClosed = Set.newBuilder[(Long, Long, Long, Long)]
    byUser.foreach { case (uid, es) =>
      val ts = es.sortBy(e => (e._2, e._3)).map(_._2)
      var start = ts.head
      var last = ts.head
      var n = 1L
      var sessions = List.empty[(Long, Long, Long, Long)]
      ts.tail.foreach { t =>
        if (t - last <= SessionStream.GapMs) { last = t; n += 1 }
        else {
          sessions ::= ((uid, start, last, n))
          gapClosed += ((uid, start, last, n)) // closed by a later event
          start = t; last = t; n = 1
        }
      }
      sessions ::= ((uid, start, last, n)) // final (open) session
      all ++= sessions
    }
    val allSet = all.result()
    val gapSet = gapClosed.result()

    assert(gapSet.nonEmpty, "corpus should contain closed sessions")
    assert(gapSet.subsetOf(streamed),
      s"missing gap-closed sessions: ${(gapSet -- streamed).take(3)}")
    assert(streamed.subsetOf(allSet),
      s"spurious sessions: ${(streamed -- allSet).take(3)}")
  }

  test("timeout is clamped above the watermark — a sub-watermark session cannot crash the query") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val wm = 100 * 3600 * 1000L
    // an event whose session would time out BELOW the watermark (late row
    // admitted to the function, or a bursty batch that jumped the
    // watermark past the gap)
    val lateTs = wm - 2 * SessionStream.GapMs
    val state = TestGroupState.create[SessionStream.SessionState](
      Optional.empty(), GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 1L, eventTimeWatermarkMs = Optional.of(wm),
      hasTimedOut = false)
    // un-clamped setTimeoutTimestamp(lateTs + GapMs) throws
    // IllegalArgumentException here and would kill the streaming query
    val out = SessionStream.updateSession(99L,
      Iterator(SessionStream.Event(1L, new java.sql.Timestamp(lateTs), 99L, "click", 1.0)),
      state)
    assert(out.isEmpty, "no session closes on first event")
    assert(state.exists, "session state must be recorded")
    assert(state.getTimeoutTimestampMs.get() === wm + 1,
      "timeout clamps to the earliest legal instant above the watermark")
    // and a normal on-time event still uses its natural gap timeout
    val state2 = TestGroupState.create[SessionStream.SessionState](
      Optional.empty(), GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 1L, eventTimeWatermarkMs = Optional.of(wm),
      hasTimedOut = false)
    SessionStream.updateSession(7L,
      Iterator(SessionStream.Event(2L, new java.sql.Timestamp(wm + 3600 * 1000L), 7L, "click", 1.0)),
      state2)
    assert(state2.getTimeoutTimestampMs.get() === wm + 3600 * 1000L + SessionStream.GapMs)
  }
}
