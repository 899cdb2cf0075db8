package graft.streaming

import graft.{SparkSpec, Tables}

/** The funnel and retention streams drained single-batch over a closed
  * directory must reproduce their batch twins EXACTLY (within one
  * micro-batch rows are processed in event-time order, so monotone state
  * sees the same order the batch query computes over). The monotone
  * cross-batch semantics are covered by TestGroupState unit tests. */
class FunnelStreamSpec extends SparkSpec {

  private lazy val srcDir: String = {
    val d = tmpDir("funnel-src")
    Tables.load(spark, sf("sf0.001"), "events").write.mode("overwrite").parquet(d)
    d
  }

  test("streamed funnel counts equal batch e5 on a single-batch drain") {
    val q = FunnelStream.runFunnel(spark, srcDir, "funnel_out", tmpDir("funnel-ckpt"))
    assert(q.awaitTermination(180000), "funnel drain timed out")
    val streamed = FunnelStream.funnelCounts(spark.table("funnel_out"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val batch = graft.operators.Events.e5Funnel(spark, sf("sf0.001"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(streamed === batch)
    assert(streamed.map(_._2).forall(_ > 0), "every stage should have survivors")
  }

  test("streamed retention cells equal batch e6 on a single-batch drain") {
    val q = FunnelStream.runRetention(spark, srcDir, "retention_out", tmpDir("ret-ckpt"))
    assert(q.awaitTermination(180000), "retention drain timed out")
    val streamed = FunnelStream.retentionCounts(spark.table("retention_out"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = graft.operators.Events.e6Retention(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed === batch)
  }

  test("funnel state is monotone: stages advance once and never retro-correct") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    def ev(id: Long, us: Long, tpe: String) = {
      val t = new java.sql.Timestamp(us / 1000L)
      t.setNanos((us % 1000000L).toInt * 1000)
      FunnelStream.Event(id, t, 7L, tpe)
    }
    val state = TestGroupState.create[FunnelStream.FunnelState](
      Optional.empty(), GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 1L, eventTimeWatermarkMs = Optional.empty(),
      hasTimedOut = false)
    // batch 1: view at 10s, click at 20s — two stages reached
    val out1 = FunnelStream.updateFunnel(7L,
      Iterator(ev(1, 10000000L, "view"), ev(2, 20000000L, "click")), state).toSeq
    assert(out1.map(_.stage) === Seq("1_view", "2_click"))
    // batch 2: an EARLIER view (5s) and an out-of-order purchase at 15s —
    // the view must not lower tView (monotone), and the purchase must be
    // rejected (15s is before the recorded click at 20s)
    val out2 = FunnelStream.updateFunnel(7L,
      Iterator(ev(3, 5000000L, "view"), ev(4, 15000000L, "purchase")), state).toSeq
    assert(out2.isEmpty)
    assert(state.get.tView === 10000000L)
    // batch 3: a purchase after the click completes the funnel once
    val out3 = FunnelStream.updateFunnel(7L,
      Iterator(ev(5, 30000000L, "purchase"), ev(6, 40000000L, "purchase")), state).toSeq
    assert(out3.map(_.stage) === Seq("3_purchase"))
    assert(state.get.tPurchase === 30000000L)
  }

  test("retention state drops pre-cohort late arrivals and dedups offsets") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val wk = FunnelStream.WeekUs
    def ev(id: Long, us: Long) = {
      val t = new java.sql.Timestamp(us / 1000L)
      t.setNanos((us % 1000000L).toInt * 1000)
      FunnelStream.Event(id, t, 9L, "view")
    }
    val state = TestGroupState.create[FunnelStream.RetentionState](
      Optional.empty(), GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 1L, eventTimeWatermarkMs = Optional.empty(),
      hasTimedOut = false)
    // first batch: cohort = week 10, active weeks 10 and 12
    val out1 = FunnelStream.updateRetention(9L,
      Iterator(ev(1, 10 * wk + 5L), ev(2, 12 * wk + 5L)), state).toSeq
    assert(out1.map(c => (c.cohort_wk, c.wk_offset)) === Seq((10L, 0L), (10L, 2L)))
    // second batch: a repeat of week 12 (deduped), week 11 (new cell),
    // and a LATE week-8 event (pre-cohort: dropped, cohort unmoved)
    val out2 = FunnelStream.updateRetention(9L,
      Iterator(ev(3, 12 * wk + 9L), ev(4, 11 * wk + 1L), ev(5, 8 * wk + 1L)), state).toSeq
    assert(out2.map(c => (c.cohort_wk, c.wk_offset)) === Seq((10L, 1L)))
    assert(state.get.cohortWk === 10L)
  }
}
