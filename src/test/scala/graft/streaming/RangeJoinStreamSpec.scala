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

  test("affected-user delta rebuild ≡ full re-band, including a session-EXTENDING append") {
    import spark.implicits._
    import graft.storage.GraftTable
    def ev(user: Long, id: Long, sec: Long) =
      (user, id, new java.sql.Timestamp(sec * 1000L))
    val staticLoc = tmpDir("rj-delta-static") + "/t"
    // v1: user 41 one session (1000-1100s), user 82 one session (50000s)
    val v1 = Seq(ev(41L, 1L, 1000L), ev(41L, 2L, 1100L),
      ev(82L, 3L, 50000L)).toDF("user_id", "event_id", "ts")
    val t = GraftTable.create(spark, staticLoc, v1.schema)
    t.append(v1)
    val cur = RangeJoinStream.bandsFrom(t.read()).localCheckpoint(true)
    // the delta EXTENDS user 41's existing session (1150s < 1800s gap)
    // and opens a second one far away — the case a banded union of the
    // delta alone would get wrong (stale s_end on the merged session)
    val delta = Seq(ev(41L, 4L, 1150L), ev(41L, 5L, 500000L))
      .toDF("user_id", "event_id", "ts")
    t.append(delta)
    val vTick = t.version
    val full = RangeJoinStream.bandsFrom(
      GraftTable.open(spark, staticLoc).read()).localCheckpoint(true)
    // a RACING commit lands between the tick's gate and the merge's
    // history read: the delta path must serve the snapshot at vTick,
    // never the current table (ADVICE r15 — a mixed-version tick)
    t.append(Seq(ev(41L, 6L, 1200L)).toDF("user_id", "event_id", "ts"))
    val got = RangeJoinStream.deltaBands(spark, staticLoc, cur, delta, vTick)
      .getOrElse(fail("a 1-user delta must take the delta path"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("s_user", "s_start", "band").collect().map(_.toSeq).toSeq
    assert(rows(got) === rows(full),
      "delta rebuild must equal the full re-band AT THE TICK'S VERSION " +
        "(a racing later commit must not leak into the tick)")
    assert(rows(got).exists(r => r.head == 41L &&
      r(2) == 1150L * 1000000L), "the extended session must carry the " +
      s"NEW s_end: ${rows(got)}")
    // …and the naive delta-only union is demonstrably NOT equal (the
    // merged session's old bounds survive) — why re-sessionization of
    // the affected user is required
    val naive = cur.unionByName(RangeJoinStream.bandsFrom(delta))
    assert(rows(naive) !== rows(full),
      "a delta-only band union must NOT reproduce the full re-band " +
        "(otherwise this test is vacuous)")
    GraftTable.drop(staticLoc)
  }

  test("refreshable interval side: a session committed MID-STREAM enriches later batches without a restart; exactly-once preserved") {
    import spark.implicits._
    import graft.storage.GraftTable
    import org.apache.spark.sql.types._
    def ev(user: Long, id: Long, sec: Long) =
      (user, id, new java.sql.Timestamp(sec * 1000L))
    // v1 snapshot: user 41 (the % 41 = 0 session subset) is active
    // 1000s-1100s → padded co-activity window [100s, 2000s]
    val staticLoc = tmpDir("rj-refresh-static") + "/t"
    val v1 = Seq(ev(41L, 1L, 1000L), ev(41L, 2L, 1100L))
      .toDF("user_id", "event_id", "ts")
    val staticT = GraftTable.create(spark, staticLoc, v1.schema)
    staticT.append(v1)
    // stream source: batch A probes the v1 window; batch B (written
    // mid-stream) probes BOTH the v1 window and the v2 session
    val src = tmpDir("rj-refresh-src")
    Seq(ev(7L, 10L, 1500L)).toDF("user_id", "event_id", "ts")
      .write.parquet(s"$src/part=a")
    val schema = StructType(Seq(StructField("user_id", LongType),
      StructField("event_id", LongType), StructField("ts", TimestampType)))
    val incoming = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .option("recursiveFileLookup", "true")
      .parquet(src)
    val destLoc = tmpDir("rj-refresh-dest") + "/t"
    val dest = GraftTable.create(spark, destLoc,
      RangeJoinStream.matches(
        RangeJoinStream.bandsFrom(v1), v1.limit(0)).schema)
    val ckpt = tmpDir("rj-refresh-ckpt")
    val q = RangeJoinStream.startRefreshable(spark, staticLoc, incoming,
      dest, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(250L))
    def await(n: Long, what: String): Unit = {
      val t0 = System.nanoTime()
      while (dest.read().count() < n) {
        assert((System.nanoTime() - t0) / 1e9 < 90,
          s"timed out waiting for $what (have ${dest.read().count()}, want $n)")
        Thread.sleep(250)
      }
    }
    await(1L, "the v1-window match")
    assert(dest.read().collect().map(r => (r.getLong(0), r.getLong(3)))
      .toSeq === Seq((41L, 7L)), "batch A matches the v1 session only")
    // MID-STREAM commit: user 82 becomes active 100000s-100050s →
    // padded window [99100s, 100950s]; the version tick must re-band
    staticT.append(Seq(ev(82L, 3L, 100000L), ev(82L, 4L, 100050L))
      .toDF("user_id", "event_id", "ts"))
    // batch B: one probe inside the NEW window, one still inside v1's
    Seq(ev(9L, 11L, 100500L), ev(9L, 12L, 1500L))
      .toDF("user_id", "event_id", "ts").write.parquet(s"$src/part=b")
    await(3L, "the post-refresh matches")
    q.stop()
    val got = dest.read().orderBy("s_user", "tsu").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSeq
    assert(got === Seq((41L, 7L, 1500000000L), (41L, 9L, 1500000000L),
      (82L, 9L, 100500000000L)),
      s"the mid-stream session must enrich batch B without a restart: $got")
    // exactly-once across a restart on the same checkpoint: replay is
    // a no-op even though the bands are newer than batch A's run
    val q2 = RangeJoinStream.startRefreshable(spark, staticLoc, incoming,
      dest, ckpt)
    assert(q2.awaitTermination(120000))
    assert(dest.read().count() === 3L, "replay must append nothing")
    GraftTable.drop(destLoc)
  }
}
