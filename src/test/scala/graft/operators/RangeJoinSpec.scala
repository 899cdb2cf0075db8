package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** e14 banded range join: the banded equality-join decomposition must be
  * ROW-IDENTICAL to the naive non-equi containment join over the same
  * interval set (the shape Spark would plan as a BroadcastNestedLoopJoin),
  * the plan must actually BE a keyed equality join, and the two
  * dirty-data guards (interval explosion, all-null timestamps) must fail
  * loudly / degrade cleanly. */
class RangeJoinSpec extends SparkSpec {

  private def eventsMicros(dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tsu"))

  test("banded decomposition ≡ naive non-equi containment join") {
    val ev = eventsMicros(sf("sf0.001"))
    val banded = Events.e14RangeJoin(spark, sf("sf0.001")).collect()

    // The naive twin: same coactivitySessions interval set, joined on the
    // pure inequality condition (no band) — all-pairs, fine at sf0.001.
    val sessions = Events.coactivitySessions(ev)
    val probe = ev.select(col("user_id").as("e_user"), col("tsu"))
    val naive = sessions.join(probe,
        col("tsu") >= col("lo") && col("tsu") <= col("hi"))
      .groupBy("s_user", "s_start", "s_end")
      .agg(count(lit(1)).as("n_overlap"), countDistinct(col("e_user")).as("n_users"))
      .select(col("s_user").as("user_id"), col("s_start").as("session_start_us"),
        (col("s_end") - col("s_start")).as("dur_us"),
        col("n_overlap"), col("n_users"))
      .orderBy("user_id", "session_start_us")
      .collect()

    assert(banded.toSeq === naive.toSeq)
    assert(banded.nonEmpty, "sf0.001 must select at least one user (user_id % 41 = 0)")
    // co-activity must actually be exercised: at least one window catches
    // events beyond the session's own (otherwise the join proved nothing)
    assert(banded.exists(_.getAs[Long]("n_overlap") > 1L),
      "expected at least one window with platform-wide co-activity")
  }

  test("the plan is a keyed equality join — never a nested-loop all-pairs scan") {
    val plan = Events.e14RangeJoin(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan.take(2000))
    // the band key must surface as a real equality join (hash or sort-merge)
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"expected an equality join on the band key:\n${plan.take(2000)}")
  }

  test("one corrupt-span interval fails loudly instead of exploding") {
    val s = spark
    import s.implicits._
    // 43k events 1700s apart (< the 1800s gap) chain into ONE session
    // spanning ~20.3k hours — past the 20k-band guard.
    val ev = spark.range(43000).select(
      lit(41L).as("user_id"), col("id").as("event_id"),
      (col("id") * lit(1700L * 1000000L)).as("tsu"))
    val ex = intercept[Exception] {
      Events.coactivityRangeJoin(ev).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(ex).exists(t =>
        t.getMessage != null && t.getMessage.contains("interval too large")),
      s"expected the e14 span guard, got: $ex")
  }

  test("all-null timestamps degrade to an empty result, not a guard trip") {
    val ev = spark.range(3).select(
      lit(41L).as("user_id"), col("id").as("event_id"),
      lit(null).cast("long").as("tsu"))
    assert(Events.coactivityRangeJoin(ev).collect().isEmpty)
  }
}
