package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Streaming range join: the drained stream must equal the NAIVE batch
  * containment join row-for-row (an independent non-equi formulation —
  * not the banded code under test), aggregating the drained rows must
  * reproduce batch e14 exactly, and the operator must be STATELESS
  * (no state store entries at all — each match depends only on its own
  * event and the immutable static side). */
class RangeJoinStreamSpec extends SparkSpec {

  test("drained matches ≡ naive containment join; aggregation ≡ batch e14; stateless") {
    val dir = sf("sf0.001")
    val events = Tables.load(spark, dir, "events")
    val flat = tmpDir("rj-src")
    events.write.mode("overwrite").parquet(flat)

    val q = RangeJoinStream.run(spark, dir, flat, "rj_out", tmpDir("rj-ckpt"))
    assert(q.awaitTermination(180000), "stream did not drain in 180s")
    val streamed = spark.table("rj_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sorted.toSeq

    // independent reference: the naive non-equi containment join over
    // the same interval set (quadratic — spec scale only)
    val ev = events.select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("tsu"))
    val sessions = graft.operators.Events.coactivitySessions(ev)
    val probe = ev.select(col("user_id").as("e_user"), col("tsu"))
    val naive = sessions.join(probe,
        col("tsu") >= col("lo") && col("tsu") <= col("hi"))
      .select(col("s_user"), col("s_start"), col("s_end"),
        col("e_user"), col("tsu"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sorted.toSeq
    assert(streamed.nonEmpty)
    assert(streamed === naive)

    // grouping the drained match rows reproduces the batch e14 entry
    val agg = spark.table("rj_out")
      .groupBy("s_user", "s_start", "s_end")
      .agg(count(lit(1)).as("n_overlap"),
        countDistinct(col("e_user")).as("n_users"))
      .select(col("s_user"), col("s_start"),
        (col("s_end") - col("s_start")).as("dur_us"),
        col("n_overlap"), col("n_users"))
      .orderBy("s_user", "s_start")
      .collect().map(_.toSeq).toSeq
    val batch = graft.operators.Events.e14RangeJoin(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(agg === batch)

    // stateless by construction: no state store operators in the plan
    val progress = q.recentProgress
    assert(progress.nonEmpty)
    assert(progress.forall(_.stateOperators.isEmpty),
      "the banded stream-static join must run with NO streaming state")
  }
}
