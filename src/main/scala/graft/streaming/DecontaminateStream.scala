package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.storage.GraftTable

/** Streaming decontamination — c9's Bloom-prefiltered eval-overlap
  * check run continuously over incoming documents: every micro-batch is
  * scored against a STATIC held-out eval set, and each contaminated
  * document's (doc_id, n_shared) report lands in a graft table with
  * exactly-once semantics. The production shape for a training-data
  * intake pipeline: the eval suite is fixed, the corpus arrives forever.
  *
  * Stream-static discipline (the [[DedupStream]] argument): a
  * document's contamination depends only on ITS OWN shingles and the
  * static eval set, so per-batch scoring is exact with zero streaming
  * state. The eval side is built ONCE at `start` — the distinct
  * eval-shingle set is persisted and its Bloom sketch (Spark's own
  * `BloomFilterAggregate`, no-false-negative) is collected to the
  * driver — and every micro-batch pre-filters MAP-SIDE through the
  * sketch literal before the exact confirm join kills false positives.
  * Per batch the eval set costs nothing to re-derive; the sketch rides
  * in the task binary exactly like Catalyst's injected runtime bloom
  * filters. Output ≡ the batch operator (c9 ≡ c2) on every prefix.
  */
object DecontaminateStream {

  /** The once-built eval side: persisted distinct shingles (the exact
    * confirm side) + the collected Bloom sketch (the map-side
    * pre-filter). KB–MB by construction; release() drops the cache. */
  final class EvalIndex private[streaming] (
      private[streaming] val evalSh: DataFrame,
      private[streaming] val bloomBytes: Array[Byte]) {
    def release(): Unit = { evalSh.unpersist(); () }
  }

  /** One pass over the eval documents (`text` column): distinct
    * shingles persisted, sketch collected — both through c9's own
    * helpers, so stream and batch cannot drift apart. */
  def buildIndex(evalDocs: DataFrame): EvalIndex = {
    import graft.functions.Shingles.shinglesDistinctFast
    val evalSh = evalDocs
      .select(explode(shinglesDistinctFast(col("text"))).as("sng")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the sketch action materializes the persisted shingles; a failure
    // must unpin them — this build is also RefreshableStatic's `build`
    // (tick rebuilds), whose contract is "clean up your partials if you
    // throw" (the PostingsIndex.build discipline)
    try new EvalIndex(evalSh, graft.operators.Sampling.evalBloomSketch(evalSh))
    catch { case e: Throwable => evalSh.unpersist(); throw e }
  }

  /** Score one (micro-)batch of documents (`doc_id`, `text`) against
    * the index: c9's exact probe (map-side might_contain, then the
    * exact confirm join on the persisted eval shingles). */
  def score(index: EvalIndex, batch: DataFrame, minShared: Int): DataFrame = {
    import graft.functions.Shingles.shinglesDistinctFast
    val sh = batch.select(
      col("doc_id"), explode(shinglesDistinctFast(col("text"))).as("sng"))
    graft.operators.Sampling.bloomProbe(sh, index.evalSh, index.bloomBytes, minShared)
  }

  /** Start scoring `incoming` (streaming `doc_id`/`text`) against
    * `evalDocs`; contamination reports append to `dest` exactly-once
    * under the checkpoint's txn id. Builds the eval index once,
    * synchronously, before the stream starts, and releases it when the
    * stream terminates. */
  def start(incoming: DataFrame, evalDocs: DataFrame, dest: GraftTable,
      checkpoint: String, minShared: Int = 3,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val index = buildIndex(evalDocs)
    val q = start(incoming, index, dest, checkpoint, minShared, trigger)
    GraftStreamIngest.releaseOnTerminate(q)(() => index.release())
    q
  }

  /** Same, against a caller-prebuilt (shared, reusable) index. */
  def start(incoming: DataFrame, index: EvalIndex, dest: GraftTable,
      checkpoint: String, minShared: Int, trigger: Trigger): StreamingQuery = {
    val id = GraftStreamIngest.txnId(checkpoint)
    incoming.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        dest.appendStream(score(index, batch, minShared), id, batchId)
        ()
      }
      .trigger(trigger)
      .start()
  }

  /** REFRESHABLE variant (VERDICT r14 #5 — the last stream-static
    * operator to adopt the [[RefreshableStatic]] discipline): the eval
    * suite derives from a COMMITTED graft table, and the shingle set +
    * Bloom sketch are rebuilt when the table's version ticks — an eval
    * doc accepted MID-STREAM contaminates later batches without a
    * restart. Benchmark suites get extended; without this the stream's
    * eval side is frozen at start time. One metadata read per trigger;
    * the rebuild (one shingle pass over the eval snapshot — a restart's
    * cost) runs only on an actual commit, and the superseded index's
    * cached blocks are released. Exactly-once is unchanged: a replayed
    * batch re-scores against a possibly NEWER eval set but its append
    * is discarded by the txn watermark. */
  def startRefreshable(spark: org.apache.spark.sql.SparkSession,
      evalLoc: String, incoming: DataFrame, dest: GraftTable,
      checkpoint: String, minShared: Int = 3,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val id = GraftStreamIngest.txnId(checkpoint)
    val index = new RefreshableStatic[EvalIndex](evalLoc,
      buildIndex, _.release())
    val q = incoming.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        dest.appendStream(score(index.get(spark), batch, minShared), id, batchId)
        ()
      }
      .trigger(trigger)
      .start()
    GraftStreamIngest.releaseOnTerminate(q)(() => index.close())
    q
  }
}
