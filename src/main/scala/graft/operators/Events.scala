package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Batch analytics over the `events` stream table — the batch twins of
  * the Structured Streaming jobs in [[graft.streaming]]: tumbling-window
  * aggregation and gap-based sessionization. Double sums are integer-
  * quantized (x10000) so results are exact under any aggregation order. */
object Events {

  private val SessionGapSec = 1800L

  /** e14 co-activity pad: each selected session's span is widened ±15
    * minutes before the containment join, so a one-event session still
    * has a meaningful overlap window. */
  private val CoactivityPadUs = 900L * 1000000L
  /** e14 band width — the range-join decomposition unit (1 hour). */
  private val RangeBandUs = 3600L * 1000000L
  /** e14 guard: max bands ONE interval may explode to (~2.3 years of
    * hours) — one corrupt timestamp must fail loudly, not explode. */
  private val MaxBandsPerInterval = 20000L

  /** e1: tumbling 1-hour window per event_type. The window start is
    * emitted as epoch seconds (bigint) — engine-neutral. */
  def e1TumblingWindow(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("value") * 10000).cast("long")).as("vsum_x10000"))
      .select(col("w.start").cast("long").as("hour_epoch"),
        col("event_type"), col("cnt"), col("vsum_x10000"))
      .orderBy("hour_epoch", "event_type")

  /** e2: sessionization — a new session starts after a >30 min gap; one
    * shuffle on user_id, per-user state is a single lag. */
  def e2Sessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val ev = Tables.load(s, dir, "events")
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("double") - col("prev_ts").cast("double") > SessionGapSec, 1L)
          .otherwise(0L))
    ev.groupBy("user_id")
      .agg(sum("new_session").as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  /** e3: exact distinct users per event_type via [[Salting]] — the hot
    * low-cardinality groupBy (a handful of event types over the whole
    * stream) whose distinct state would otherwise pile one reducer high.
    * The salt is the hash of user_id, so per-bucket distinct counts are
    * disjoint and exact; the oracle is DuckDB's plain count(DISTINCT). */
  def e3DistinctUsers(s: SparkSession, dir: String): DataFrame =
    Salting.saltedDistinctCount(Tables.load(s, dir, "events"),
      Seq("event_type"), "user_id", resultName = "n_users", buckets = 16)
      .orderBy("event_type")

  /** e4: AS-OF join (event attribution) — each purchase joined to the
    * user's most recent click at-or-before it in (ts, event_id) order.
    * Spark has no native ASOF JOIN; the naive formulation is a range
    * self-join (quadratic in a user's history). This is the single-pass
    * shape instead: one shuffle on user_id, a running last-click carried
    * by a rows-window — O(history) per user, total order makes it
    * deterministic, and purchases with no prior click keep NULLs. */
  def e4AsofAttribution(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val isClick = col("event_type") === "click"
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("click_id", last(when(isClick, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("click_us",
        last(when(isClick, unix_micros(col("ts"))), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("click_id"),
        (unix_micros(col("ts")) - col("click_us")).as("gap_us"))
      .orderBy("user_id", "event_id")
  }

  /** e5: strictly-ordered conversion funnel view → click → purchase:
    * users counted at each stage only if the stage event happens AFTER
    * their earliest completion of the previous stage. Three aggregations
    * and two joins, all keyed on user_id — one partitioning reused
    * end-to-end (no re-key), with each stage's survivor set shrinking
    * monotonically. Timestamps compare in exact integer micros. */
  def e5Funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tsu"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("tsu").as("t_view"))
    val clicks = ev.filter(col("event_type") === "click")
      .join(views, "user_id").filter(col("tsu") > col("t_view"))
      .groupBy("user_id").agg(min("tsu").as("t_click"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .join(clicks, "user_id").filter(col("tsu") > col("t_click"))
      .groupBy("user_id").agg(min("tsu").as("t_purchase"))
    val stage = (df: DataFrame, name: String) =>
      df.agg(count(lit(1)).as("users")).select(lit(name).as("stage"), col("users"))
    stage(views, "1_view")
      .unionAll(stage(clicks, "2_click"))
      .unionAll(stage(purchases, "3_purchase"))
      .orderBy("stage")
  }

  /** e6: weekly cohort retention — users grouped by their first-active
    * week (unix-epoch-aligned, week = floor(micros / 1 week)), then for
    * every (cohort, week-offset) cell the count of distinct users active
    * that week. The classic growth-analytics matrix.
    *
    * 100 TB design: the cohort aggregation and the activity join are
    * both keyed on user_id, so the join reuses the groupBy's hash
    * partitioning (no re-shuffle of the big side). The final cell count
    * is a LOW-cardinality groupBy (weeks × offsets) holding per-cell
    * distinct-user state — the exact shape that piles one reducer high —
    * so it goes through [[Salting.saltedDistinctCount]] like e3: the
    * salt is the hash of user_id, per-bucket distincts are disjoint, and
    * the merged counts are exact. */
  def e6Retention(s: SparkSession, dir: String): DataFrame = {
    // floor division, NOT `div`: `div` truncates toward zero, so a
    // pre-1970 timestamp would land in week 0 instead of week -1 and
    // diverge from the oracle's floor(). Double division is exact
    // enough here: |micros| < 2^53 and an integer-valued quotient is
    // itself representable, so floor() cannot misround.
    val ev = Tables.load(s, dir, "events")
      .select(col("user_id"),
        floor(unix_micros(col("ts")) / lit(604800000000.0)).cast("long").as("wk"))
    val cohort = ev.groupBy("user_id").agg(min("wk").as("cohort_wk"))
    val cells = ev.join(cohort, "user_id")
      .select(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("wk_offset"),
        col("user_id"))
    Salting.saltedDistinctCount(cells, Seq("cohort_wk", "wk_offset"),
      "user_id", resultName = "n_users", buckets = 16)
      .orderBy("cohort_wk", "wk_offset")
  }

  /** Per-type (st_type, mean, sd) moments for e7 — also the "trained
    * model" the streaming scorer
    * ([[graft.streaming.EventStream.scoreOutliers]]) enriches against.
    * Mean and variance come from integer-quantized (×1e4) first/second
    * moments: the square is taken AFTER widening to DECIMAL(38,0) (a
    * long q² wraps at |value| ≈ 3×10⁵) and summed as DECIMAL(38,0) —
    * exact under any aggregation order, overflow-safe to ~10³⁸. */
  def e7TypeStats(s: SparkSession, dir: String): DataFrame = {
    val qd = round(col("value") * 10000).cast("long").cast("decimal(38,0)")
    val stats = Tables.load(s, dir, "events")
      .select(col("event_type"), qd.as("qd"), (qd * qd).as("q2"))
      .groupBy("event_type")
      .agg(sum("qd").as("s1"), sum("q2").as("s2"), count(lit(1)).as("n"))
    val nd = col("n").cast("double")
    val mean = col("s1").cast("double") / (nd * 10000.0)
    val ex2 = col("s2").cast("double") / (nd * 100000000.0)
    val sd = sqrt(greatest(ex2 - mean * mean, lit(0.0)))
    stats.select(col("event_type").as("st_type"), mean.as("mean"), sd.as("sd"))
  }

  /** Score rows against trained per-type moments — the single
    * implementation behind batch e7 AND the streaming scorer (a drift
    * between the two would silently de-synchronize them). `sd > 0`
    * guards constant-valued types: with sd = 0, any quantization gap
    * between the stored mean and the raw value would flag the ENTIRE
    * type with z = ±∞ — a constant type has no outliers by definition. */
  private[graft] def scoreAgainstStats(events: DataFrame,
      typeStats: DataFrame): DataFrame =
    events.join(broadcast(typeStats), col("event_type") === col("st_type"))
      .filter(col("sd") > 0 && abs(col("value") - col("mean")) > lit(3.0) * col("sd"))
      .select(col("event_type"), col("event_id"),
        round(col("value"), 4).as("value"),
        round((col("value") - col("mean")) / col("sd"), 4).as("z"))

  /** e7: 3σ outlier detection per event_type — the data-quality gate
    * that flags anomalous metric values before they poison a training
    * mix. Two corpus passes: one aggregation for per-type moments
    * ([[e7TypeStats]]), then a scan filtered against the BROADCAST
    * (handful-of-types) stats. The integer→double conversions and the
    * variance expression tree are replicated operation-for-operation in
    * the oracle, so both engines compare the identical doubles. */
  def e7Outliers(s: SparkSession, dir: String): DataFrame =
    scoreAgainstStats(
      Tables.load(s, dir, "events").select(col("event_type"), col("event_id"), col("value")),
      e7TypeStats(s, dir))
      .orderBy("event_type", "event_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e1_tumbling_window" -> e1TumblingWindow _,
    "e11_trending" -> e11Trending _,
    "e13_dense_grid" -> e13DenseGrid _,
    "e14_range_join" -> e14RangeJoin _,
    "e2_sessionize" -> e2Sessionize _,
    "e3_distinct_users" -> e3DistinctUsers _,
    "e4_asof_attribution" -> e4AsofAttribution _,
    "e5_funnel" -> e5Funnel _,
    "e6_retention" -> e6Retention _,
    "e7_outliers" -> e7Outliers _,
    "e8_transitions" -> e8Transitions _,
  )

  /** e13: DENSE window grid — e11's sparse (window, type) counts
    * GAP-FILLED with explicit zeros: every (event_type, 6h-window)
    * cell between the corpus' first and last window exists, count 0
    * where no event landed. The dashboard/alerting primitive e11
    * deliberately avoids (its adjacency rule breaks trend streaks at
    * gaps rather than comparing across them): downstream trend math,
    * rate alerts, and sparkline renderers need absence to be a ZERO
    * ROW, not a missing row. Shape at 100 TB: the counts are e11's one
    * map-side-combined keyed shuffle into a tiny (window, type) grid;
    * the dense frame is a ONE-ROW (wmin, wmax) span aggregate
    * broadcast-crossed onto the distinct type list (both tiny — the
    * t6/c3 broadcast-scalar pattern) with a `sequence` explode; the
    * gap-fill join is grid-sized, never event-sized. */
  def e13DenseGrid(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val counts = ev
      .groupBy(win6h(col("ts")).as("win6h"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    // SPAN GUARD (ADVICE r12): the dense frame is (wmax-wmin) rows per
    // type, so ONE outlier timestamp (a corrupt far-future/past row in
    // dirty event data) would silently explode the grid to millions of
    // rows per type or hit Spark's array-length cap mid-explode. Cap
    // the span at ~137 years of 6h windows and fail with a message
    // naming the offending bounds — the guard rides wmax itself so
    // column pruning can never drop it.
    val maxGridWindows = 200000L
    val span = ev.agg(
        min(win6h(col("ts"))).as("wmin"),
        max(win6h(col("ts"))).as("wmax"))
      .select(col("wmin"),
        // isNull escape: an EMPTY events table (or all-null ts) must
        // keep returning the empty grid (null span → null sequence →
        // no rows), not trip the guard through null three-valued logic
        when(col("wmax").isNull ||
            col("wmax") - col("wmin") < lit(maxGridWindows), col("wmax"))
          .otherwise(raise_error(concat(
            lit("e13 dense grid span too large: windows ["),
            col("wmin").cast("string"), lit(", "),
            col("wmax").cast("string"),
            lit(s"] exceed $maxGridWindows 6h buckets — the events table " +
              "has outlier timestamps; clean or filter ts first")))
            .cast("long")).as("wmax"))
    val frame = ev.select("event_type").distinct()
      .crossJoin(broadcast(span))
      .select(col("event_type"),
        explode(sequence(col("wmin"), col("wmax"))).as("win6h"))
    frame.join(counts, Seq("event_type", "win6h"), "left")
      .select(col("win6h"), col("event_type"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
      .orderBy("win6h", "event_type")
  }

  /** e8: per-user event-transition matrix (first-order Markov counts) —
    * how often event type X is followed by Y within a user's (ts,
    * event_id)-ordered stream, with the transition probability in exact
    * basis points. One shuffle on user_id for the lag window, then a
    * tiny (#types²) aggregation; the bp division is integer-exact. */
  def e8Transitions(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val w = Tables.load(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag("event_type", 1).over(byUser))
      .filter(col("prev_type").isNotNull)
    val counts = w.groupBy("prev_type", "event_type")
      .agg(count(lit(1)).as("cnt"))
    val totals = counts.groupBy("prev_type").agg(sum("cnt").as("tot"))
    counts.join(totals, "prev_type")
      .select(col("prev_type"), col("event_type"), col("cnt"),
        expr("cnt * 10000 div tot").as("p_bp")) // integer bp (Column./ is double)
      .orderBy("prev_type", "event_type")
  }

  /** The e14 interval side: per-user sessions (e2's gap rule — a new
    * session after a >30 min silence, the SAME `SessionGapSec`) for the
    * deterministic user subset `user_id % 41 = 0`, each span padded
    * ±15 min into a co-activity window. Exposed separately so the spec
    * can run the NAIVE non-equi join over the identical interval set.
    * Input must carry (user_id, event_id, tsu) with tsu in micros. */
  private[graft] def coactivitySessions(ev: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("tsu", "event_id")
    val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("prev", lag("tsu", 1).over(byUser))
      .withColumn("ns",
        when(col("prev").isNull ||
          col("tsu") - col("prev") > SessionGapSec * 1000000L, 1L).otherwise(0L))
      .withColumn("sess", sum("ns").over(running))
      .groupBy("user_id", "sess")
      .agg(min("tsu").as("s_start"), max("tsu").as("s_end"))
      .filter(col("user_id") % 41 === 0)
      .select(col("user_id").as("s_user"), col("s_start"), col("s_end"),
        (col("s_start") - CoactivityPadUs).as("lo"),
        (col("s_end") + CoactivityPadUs).as("hi"))
  }

  /** e14: batch RANGE (containment) JOIN with NO equality key — for each
    * selected user's padded session window, how many events PLATFORM-WIDE
    * (any user) fell inside it, and how many distinct users were active.
    * The naive formulation `e.tsu BETWEEN s.lo AND s.hi` has no join key,
    * so Spark plans a BroadcastNestedLoopJoin — all-pairs, and AQE cannot
    * split it. This is the BANDED decomposition instead: time is cut into
    * fixed 1-hour bands, each interval explodes to the bands it overlaps
    * (guarded — one corrupt timestamp fails loudly instead of exploding),
    * each event carries its single band, and the join becomes a plain
    * shuffled EQUALITY join on the band with the containment predicate as
    * residual. An event's band matches exactly one exploded row per
    * interval, so no dedup pass is needed.
    *
    * 100 TB shape: interval-side duplication is ∝ span/band and
    * probe-side fanout is ∝ events per band — the band width is the
    * dial between the two; because the join is a keyed shuffle, a hot
    * band (both sides large in the same hour) is ordinary join skew
    * that AQE's skew-join splitting handles, which is exactly what the
    * BNLJ shape forfeits. PlanGuard pins that e14 never plans a BNLJ. */
  def e14RangeJoin(s: SparkSession, dir: String): DataFrame =
    coactivityRangeJoin(Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tsu")))

  /** An instant's 1-hour band id — ONE definition for the interval
    * explode, the batch probe side, and the streaming twin
    * ([[graft.streaming.RangeJoinStream]]). floor(/double), NOT `div`:
    * e6's rule — exact for |micros| < 2^53, and correct (not trunc)
    * should an instant ever precede 1970. */
  private[graft] def bandOf(tsUs: Column): Column =
    floor(tsUs / lit(RangeBandUs.toDouble)).cast("long")

  /** The interval side EXPLODED to its overlapped bands — shared by the
    * batch join and the streaming twin so the decomposition cannot
    * drift. Input: [[coactivitySessions]]' (s_user, s_start, s_end,
    * lo, hi); output adds one `band` row per overlapped band. */
  private[graft] def bandedIntervals(sessions: DataFrame): DataFrame = {
    val loBand = bandOf(col("lo"))
    val hiBand0 = bandOf(col("hi"))
    // isNull escape (the e13 lesson): an all-null-tsu group yields a null
    // span — it must produce zero exploded rows through the null
    // sequence, not trip the guard via three-valued logic.
    val hiBand = when(hiBand0.isNull || hiBand0 - loBand < lit(MaxBandsPerInterval), hiBand0)
      .otherwise(raise_error(concat(
        lit("e14 range join interval too large: ["),
        col("lo").cast("string"), lit(", "), col("hi").cast("string"),
        lit(s"] micros exceeds $MaxBandsPerInterval 1h bands — the events " +
          "table has outlier timestamps; clean or filter ts first")))
        .cast("long"))
    sessions.select(col("s_user"), col("s_start"), col("s_end"),
      col("lo"), col("hi"), explode(sequence(loBand, hiBand)).as("band"))
  }

  /** The banded containment MATCH rows — the join itself, before e14's
    * per-session aggregation; the streaming twin emits exactly these
    * (stateless enrichment), so the shape is shared. Probe input needs
    * (user_id, tsu). */
  private[graft] def bandedMatches(bands: DataFrame, ev: DataFrame): DataFrame = {
    val probe = ev.select(col("user_id").as("e_user"),
      bandOf(col("tsu")).as("band"), col("tsu"))
    bands.join(probe, Seq("band"))
      .filter(col("tsu") >= col("lo") && col("tsu") <= col("hi"))
  }

  private[graft] def coactivityRangeJoin(ev: DataFrame): DataFrame =
    bandedMatches(bandedIntervals(coactivitySessions(ev)), ev)
      .groupBy("s_user", "s_start", "s_end")
      .agg(count(lit(1)).as("n_overlap"),
        countDistinct(col("e_user")).as("n_users"))
      .select(col("s_user").as("user_id"), col("s_start").as("session_start_us"),
        (col("s_end") - col("s_start")).as("dur_us"),
        col("n_overlap"), col("n_users"))
      .orderBy("user_id", "session_start_us")

  /** The 6-hour window id — ONE definition for e11's grid, e13's
    * counts, and e13's span (the drift this file's own e6 comment and
    * the round-12 e11 fix warn about): FLOOR division, because `div`
    * truncates toward zero and would diverge from the oracle's `//`
    * and the streaming twin's window() starts on pre-1970 timestamps.
    * Double division is exact here (|seconds| < 2^53; an
    * integer-valued quotient is representable, so floor cannot
    * misround). */
  private def win6h(ts: Column): Column =
    floor(unix_timestamp(ts) / lit(21600.0)).cast("long")

  /** e11: trending event types — per 6-hour window, each type's count
    * vs its previous-window count as integer basis points (the "what is
    * spiking" dashboard primitive). One windowed groupBy (map-side
    * partial combine → tiny (window, type) grid), then a lag over that
    * GRID, whose cardinality is windows × types — thousands of rows at
    * any corpus scale, so the second window costs nothing; no per-event
    * window functions anywhere. FLOOR division for the window id (e6's
    * rule, applied here after a round-12 review pass): `div` truncates
    * toward zero, so a pre-1970 timestamp would diverge from the
    * oracle's `//` and the streaming twin's window-start arithmetic,
    * both of which floor. */
  def e11Trending(s: SparkSession, dir: String): DataFrame =
    trendOverGrid(Tables.load(s, dir, "events")
      .groupBy(win6h(col("ts")).as("win6h"), col("event_type"))
      .agg(count(lit(1)).as("cnt")))

  /** Trend comparison over a (win6h, event_type, cnt) grid — ONE
    * definition shared by batch e11 and the streaming twin
    * ([[graft.streaming.TrendingStream]] feeds its drained grid here),
    * so the adjacency rule and the basis-point arithmetic can never
    * drift between the two. */
  def trendOverGrid(grid: DataFrame): DataFrame = {
    val byType = Window.partitionBy("event_type").orderBy("win6h")
    grid
      .withColumn("prev_win", lag("win6h", 1).over(byType))
      .withColumn("prev_cnt", lag("cnt", 1).over(byType))
      // trend only vs the ADJACENT previous window: a gap (type absent
      // for a window) breaks the streak rather than comparing across it
      .filter(col("prev_win") === col("win6h") - 1)
      // trunc-toward-zero on BOTH engines: Spark `div` truncates but
      // DuckDB `//` floors, which differs on negative (falling) trends —
      // so both sides compute trunc() of the same IEEE double quotient
      .select(col("win6h"), col("event_type"), col("cnt"), col("prev_cnt"),
        expr("cast((cnt - prev_cnt) * 10000 / prev_cnt as bigint)").as("trend_bp"))
      .orderBy("win6h", "event_type")
  }

  val oracles: Map[String, String] = Map(
    // floor() before the BIGINT cast: DuckDB's epoch(ts) carries the
    // fractional microseconds and CAST(DOUBLE AS BIGINT) ROUNDS, while
    // Spark's unix_timestamp TRUNCATES to seconds — an event with ≥.5 s
    // of fraction adjacent to a 6 h boundary would land in different
    // windows (caught as a one-count sf0.1 mismatch; sf0.01 has no such
    // event). floor ≡ trunc here (epochs are positive).
    "e11_trending" ->
      """WITH grid AS (
        |  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 21600 win6h, event_type,
        |         count(*) cnt
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT win6h, event_type, cnt,
        |        lag(win6h) OVER (PARTITION BY event_type ORDER BY win6h) prev_win,
        |        lag(cnt) OVER (PARTITION BY event_type ORDER BY win6h) prev_cnt
        |      FROM grid)
        |SELECT win6h, event_type, cnt, prev_cnt,
        |       CAST(trunc(((cnt - prev_cnt) * 10000.0) / prev_cnt) AS BIGINT) trend_bp
        |FROM l WHERE prev_win = win6h - 1
        |ORDER BY win6h, event_type""".stripMargin,
    // e13: same window arithmetic as e11 (floor before the BIGINT cast,
    // the e11/e12 rounding lesson); the dense frame is DISTINCT types ×
    // range(wmin, wmax+1), Spark's inclusive sequence()
    "e13_dense_grid" ->
      """WITH c AS (
        |  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 21600 win6h, event_type,
        |         count(*) cnt
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT min(win6h) wmin, max(win6h) wmax FROM c),
        |f AS (SELECT event_type, unnest(range(wmin, wmax + 1)) win6h
        |      FROM (SELECT DISTINCT event_type FROM events) CROSS JOIN s)
        |SELECT f.win6h, f.event_type, CAST(COALESCE(c.cnt, 0) AS BIGINT) cnt
        |FROM f LEFT JOIN c ON c.win6h = f.win6h AND c.event_type = f.event_type
        |ORDER BY f.win6h, f.event_type""".stripMargin,
    // e14: the oracle is the NAIVE containment join (DuckDB's IEJoin
    // handles the pure-inequality condition natively — exactly the
    // operator Spark lacks and the banded decomposition re-expresses).
    // Session derivation mirrors coactivitySessions term for term; the
    // sess window sum stays a grouping key only (DuckDB window sums are
    // HUGEINT — never emit one uncast).
    "e14_range_join" ->
      (s"""WITH ev AS (SELECT user_id, event_id, epoch_us(ts) tsu FROM events),
         |l AS (SELECT user_id, event_id, tsu,
         |        lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu, event_id) prev
         |      FROM ev),
         |f AS (SELECT user_id, event_id, tsu,
         |        CASE WHEN prev IS NULL OR tsu - prev > ${SessionGapSec * 1000000L}
         |             THEN 1 ELSE 0 END ns
         |      FROM l),
         |sid AS (SELECT user_id, tsu,
         |          sum(ns) OVER (PARTITION BY user_id ORDER BY tsu, event_id
         |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) sess
         |        FROM f),
         |sess AS (SELECT user_id, sess, min(tsu) s_start, max(tsu) s_end
         |         FROM sid WHERE user_id % 41 = 0 GROUP BY user_id, sess)
         |SELECT s.user_id, s.s_start AS session_start_us,
         |  s.s_end - s.s_start AS dur_us,
         |  count(*) AS n_overlap,
         |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
         |FROM sess s JOIN ev e
         |  ON e.tsu >= s.s_start - $CoactivityPadUs
         | AND e.tsu <= s.s_end + $CoactivityPadUs
         |GROUP BY 1, 2, 3
         |ORDER BY 1, 2""".stripMargin),
    "e1_tumbling_window" ->
      ("SELECT CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) hour_epoch, event_type, " +
        "count(*) cnt, CAST(sum(CAST(round(value*10000) AS BIGINT)) AS BIGINT) vsum_x10000 " +
        "FROM events GROUP BY 1, 2 ORDER BY 1, 2"),
    "e2_sessionize" ->
      (s"""WITH ev AS (SELECT user_id, ts, event_id,
         |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) prev_ts
         |FROM events),
         |f AS (SELECT user_id,
         |  CASE WHEN prev_ts IS NULL
         |         OR epoch(ts) - epoch(prev_ts) > $SessionGapSec
         |       THEN 1 ELSE 0 END ns
         |FROM ev)
         |SELECT user_id, CAST(sum(ns) AS BIGINT) n_sessions,
         |  count(*) n_events
         |FROM f GROUP BY user_id ORDER BY user_id""".stripMargin),
    "e3_distinct_users" ->
      ("SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) n_users, " +
        "count(*) cnt FROM events GROUP BY event_type ORDER BY event_type"),
    "e4_asof_attribution" ->
      ("""WITH w AS (
         |  SELECT user_id, event_id, event_type, ts,
         |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
         |      OVER (PARTITION BY user_id ORDER BY ts, event_id
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) click_id,
         |    last_value(CASE WHEN event_type = 'click' THEN epoch_us(ts) END IGNORE NULLS)
         |      OVER (PARTITION BY user_id ORDER BY ts, event_id
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) click_us
         |  FROM events)
         |SELECT user_id, event_id, click_id, epoch_us(ts) - click_us AS gap_us
         |FROM w WHERE event_type = 'purchase' ORDER BY user_id, event_id""".stripMargin),
    "e5_funnel" ->
      ("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) tsu FROM events),
         |v AS (SELECT user_id, min(tsu) t_view FROM e
         |      WHERE event_type = 'view' GROUP BY user_id),
         |c AS (SELECT e.user_id, min(tsu) t_click FROM e
         |      JOIN v ON e.user_id = v.user_id
         |      WHERE event_type = 'click' AND tsu > t_view GROUP BY e.user_id),
         |p AS (SELECT e.user_id, min(tsu) t_purchase FROM e
         |      JOIN c ON e.user_id = c.user_id
         |      WHERE event_type = 'purchase' AND tsu > t_click GROUP BY e.user_id)
         |SELECT * FROM (
         |  SELECT '1_view' AS stage, count(*) AS users FROM v
         |  UNION ALL SELECT '2_click', count(*) FROM c
         |  UNION ALL SELECT '3_purchase', count(*) FROM p
         |) ORDER BY stage""".stripMargin),
    "e6_retention" ->
      ("""WITH w AS (SELECT user_id,
         |       CAST(floor(epoch(ts)/604800) AS BIGINT) wk FROM events),
         |c AS (SELECT user_id, min(wk) cohort_wk FROM w GROUP BY user_id)
         |SELECT cohort_wk, wk - cohort_wk AS wk_offset,
         |  CAST(count(DISTINCT w.user_id) AS BIGINT) n_users, count(*) cnt
         |FROM w JOIN c ON w.user_id = c.user_id
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    "e7_outliers" ->
      ("""WITH q AS (SELECT event_type, event_id, value,
         |    CAST(round(value * 10000) AS BIGINT) qv FROM events),
         |st AS (SELECT event_type,
         |    CAST(sum(qv) AS DECIMAL(38,0)) s1,
         |    sum(CAST(qv AS HUGEINT) * qv) s2, count(*) n
         |  FROM q GROUP BY event_type),
         |m AS (SELECT event_type,
         |    CAST(s1 AS DOUBLE) / (CAST(n AS DOUBLE) * 10000.0) mean,
         |    sqrt(greatest(
         |      CAST(s2 AS DOUBLE) / (CAST(n AS DOUBLE) * 100000000.0)
         |        - (CAST(s1 AS DOUBLE) / (CAST(n AS DOUBLE) * 10000.0))
         |          * (CAST(s1 AS DOUBLE) / (CAST(n AS DOUBLE) * 10000.0)),
         |      0.0)) sd
         |  FROM st)
         |SELECT q.event_type, event_id, round(value, 4) AS "value",
         |  round((value - mean) / sd, 4) z
         |FROM q JOIN m ON q.event_type = m.event_type
         |WHERE sd > 0 AND abs(value - mean) > 3.0 * sd
         |ORDER BY q.event_type, event_id""".stripMargin),
    "e8_transitions" ->
      ("""WITH w AS (SELECT event_type,
         |    lag(event_type) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) prev_type
         |  FROM events),
         |c AS (SELECT prev_type, event_type, count(*) cnt FROM w
         |      WHERE prev_type IS NOT NULL GROUP BY prev_type, event_type),
         |t AS (SELECT prev_type, CAST(sum(cnt) AS BIGINT) tot
         |      FROM c GROUP BY prev_type)
         |SELECT c.prev_type, event_type, cnt, cnt * 10000 // tot AS p_bp
         |FROM c JOIN t ON c.prev_type = t.prev_type
         |ORDER BY c.prev_type, event_type""".stripMargin),
  )
}
