package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.storage.GraftTable

/** Streaming QUALITY GATE — c20's continuous twin: every incoming
  * micro-batch document is scored with t15's shared
  * `qualityLogitMicro` and kept iff it clears its source's corpus
  * threshold (the quality of the source's ceil(n/4)-th ranked corpus
  * doc — c19's quartile boundary, computed ONCE from the committed
  * corpus and applied to intake as a broadcast filter). This is the
  * serving semantics an intake pipeline needs: the bar comes from the
  * distribution you TRUST, so a uniformly-bad intake batch drops
  * whole — c19 applied per batch would rank the batch against itself
  * and keep its top quarter regardless. A batch source the corpus has
  * never seen passes whole (no distribution to gate against — the
  * mix-preservation stance).
  *
  * The static side is the tiny per-source threshold map, derived
  * through [[graft.operators.Sampling.gateThresholds]] (the
  * approx-quantile path — identical output to the exact gate, no
  * hot-source window term) and REFRESHED on corpus version ticks via
  * [[RefreshableStatic]]: docs accepted into the corpus move their
  * source's bar for every later batch without a restart. A threshold
  * is a rank statistic — not mergeable from the map alone — but it is
  * PER-SOURCE, so an accept tick recomputes only the sources present
  * in the delta from the gated version's snapshot and keeps the rest
  * ([[deltaThresholds]] — the affected-user pattern; backfill-wide
  * ticks full-rebuild). The collected map is bounded by SOURCE
  * CARDINALITY (a curation axis, thousands at most — guarded at
  * [[MaxSources]] so a mis-keyed corpus fails loudly, never an
  * unbounded driver fold). */
object GateStream {

  /** Refuse to collect a threshold map larger than this: `source` is
    * a curation axis (c3/c16's cardinality), not a document key. */
  val MaxSources = 1 << 20

  /** A delta tick touching more distinct sources than this falls back
    * to the full rebuild (a backfill, not an accept tick). */
  val MaxDeltaSources = 4096

  /** (source → keep-threshold in quality micros), driver-side. */
  def thresholds(corpus: DataFrame): Map[String, Long] = {
    val rows = graft.operators.Sampling.gateThresholds(corpus)
      .limit(MaxSources + 1).collect()
    require(rows.length <= MaxSources,
      s"more than $MaxSources distinct sources — the gate's threshold " +
        "map is per-SOURCE; a document-keyed column is the wrong axis")
    rows.map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /** Above this source count the threshold map stops riding the plan
    * as a literal (a 100k+-entry literal bloats every micro-batch's
    * plan and its codegen) and becomes a broadcast join instead. */
  val MaxLiteralSources = 10000

  /** Gate one (micro-)batch of (doc_id, source, text): kept rows as
    * (doc_id, source, quality_micro) — c20's output shape. */
  def gate(thr: Map[String, Long], batch: DataFrame): DataFrame =
    gateImpl(thr, batch, literal = thr.size <= MaxLiteralSources)

  private[streaming] def gateImpl(thr: Map[String, Long], batch: DataFrame,
      literal: Boolean): DataFrame = {
    val scored = graft.operators.Sampling.qualityScored(batch)
    if (thr.isEmpty) scored
    else if (literal)
      // the map rides the plan as a literal MapType column — tiny by
      // the MaxLiteralSources bound, no join, no shuffle; element_at
      // on a missing source is NULL = ungated (the new-source keep
      // rule)
      scored.withColumn("thr", element_at(typedLit(thr), col("source")))
        .filter(col("thr").isNull || col("quality_micro") >= col("thr"))
        .drop("thr")
    else {
      // wide-cardinality corpus: same semantics through a broadcast
      // LEFT join (still no shuffle of the batch side)
      val spark = batch.sparkSession
      import spark.implicits._
      val thrDf = thr.toSeq.toDF("source", "thr")
      scored.join(broadcast(thrDf), Seq("source"), "left")
        .filter(col("thr").isNull || col("quality_micro") >= col("thr"))
        .select(col("doc_id"), col("source"), col("quality_micro"))
    }
  }

  /** Delta refresh by AFFECTED SOURCE (the RangeJoinStream affected-
    * user pattern): a per-source threshold is a rank statistic of that
    * source's corpus rows ALONE, so an append-only tick invalidates
    * only the thresholds of sources PRESENT in the delta — recompute
    * those from the snapshot AT the tick's gated version (never the
    * current table: a commit racing the tick would serve mixed-version
    * bars) and keep every untouched source's entry. Cost ∝ the
    * affected sources' corpus mass (one filtered scan — the source
    * filter pushes down), vs the full rebuild's pass over every
    * source; a tick touching > [[MaxDeltaSources]] distinct sources
    * (a backfill) falls back to the full rebuild. */
  private[streaming] def deltaThresholds(spark: SparkSession,
      corpusLoc: String, cur: Map[String, Long], delta: DataFrame,
      v: Long): Option[Map[String, Long]] = {
    val srcs = delta.select("source").distinct()
      .limit(MaxDeltaSources + 1).collect().map(_.getString(0))
    if (srcs.isEmpty) Some(cur)
    else if (srcs.length > MaxDeltaSources) None
    else {
      val snap = GraftTable.openVersion(spark, corpusLoc, v).read()
      val touched = thresholds(
        snap.filter(col("source").isInCollection(srcs.toSeq)))
      Some(cur ++ touched)
    }
  }

  /** Continuous gating against a COMMITTED corpus table of
    * (doc_id, source, text); kept rows append to `dest` exactly-once
    * under the checkpoint's txn id. Corpus accept ticks refresh only
    * the AFFECTED sources' thresholds ([[deltaThresholds]]). */
  def startRefreshable(spark: SparkSession, corpusLoc: String,
      incoming: DataFrame, dest: GraftTable, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val id = GraftStreamIngest.txnId(checkpoint)
    val thr = new RefreshableStatic[Map[String, Long]](corpusLoc,
      docs => thresholds(docs), _ => (),
      applyDelta = Some((cur, delta, v) =>
        deltaThresholds(spark, corpusLoc, cur, delta, v)))
    val q = incoming.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        dest.appendStream(gate(thr.get(spark), batch), id, batchId)
        ()
      }
      .trigger(trigger)
      .start()
    GraftStreamIngest.releaseOnTerminate(q)(() => thr.close())
    q
  }
}
