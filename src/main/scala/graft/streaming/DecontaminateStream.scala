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
    * pre-filter). KB–MB by construction; release() drops the cache.
    * A DELTA-STACKED index ([[applyDeltaIndex]]) carries every pinned
    * layer in `pinned` so release drops the whole stack (`evalSh` is
    * then a lazy union over them, which `unpersist` can't reach). */
  final class EvalIndex private[streaming] (
      private[streaming] val evalSh: DataFrame,
      private[streaming] val bloomBytes: Array[Byte],
      private[streaming] val pinned: Seq[DataFrame] = Seq.empty) {
    private[streaming] def layers: Seq[DataFrame] =
      if (pinned.isEmpty) Seq(evalSh) else pinned
    def release(): Unit = { layers.foreach(_.unpersist()); () }
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

  /** Collect bound for a delta tick's NEW shingle hashes (8 B each;
    * the cap is 8 MB of driver heap) — a wider eval extension is a
    * backfill and full-rebuilds instead. */
  private[streaming] val MaxDeltaShingles = 1L << 20

  /** The insert-only delta merge (VERDICT r15 #3 — the one
    * [[RefreshableStatic]] adopter that was still full-rebuild-only):
    * shingle ONLY the inserted eval docs, anti-join away shingles the
    * current set already carries (the confirm join counts per (doc,
    * sng) match, so the eval side must stay globally DISTINCT), stack
    * the union, and OR the new shingles into the current sketch
    * DRIVER-SIDE: sketch build (`BloomFilterAggregate.update`) and
    * probe (`might_contain`) share the xxhash64→putLong domain, so
    * `putLong`-ing the delta's hashes into the deserialized filter IS
    * the sketch union — no rebuild pass over the full eval set, no
    * bit-geometry mismatch (merging two independently SIZED sketches
    * would throw). TABLE reads are ∝ delta (the tick shingles only the
    * inserted docs); the dedup anti-join additionally probes the
    * CACHED shingle stack — memory-speed, bounded by the eval suite's
    * KB–MB contract, never a corpus re-read. Returns None (→ full
    * rebuild) when
    * the current sketch is absent (built over an empty suite — the
    * rebuild re-sizes it) or the delta is collect-unsafe. FPP note:
    * the sketch keeps its original sizing, so a run of delta ticks
    * degrades only the PREFILTER's false-positive rate (the confirm
    * join keeps results exact); the fold bound re-sizes it. */
  private[streaming] def applyDeltaIndex(cur: EvalIndex,
      delta: DataFrame): Option[EvalIndex] = {
    import graft.functions.Shingles.shinglesDistinctFast
    if (cur.bloomBytes == null) return None
    val fresh = delta
      .select(explode(shinglesDistinctFast(col("text"))).as("sng")).distinct()
      .join(cur.evalSh, Seq("sng"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (fresh.count() > MaxDeltaShingles) { fresh.unpersist(); None }
      else {
        val hashes = fresh.select(xxhash64(col("sng")))
          .collect().map(_.getLong(0))
        if (hashes.isEmpty) { fresh.unpersist(); Some(cur) }
        else {
          val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
            new java.io.ByteArrayInputStream(cur.bloomBytes))
          hashes.foreach(bf.putLong)
          val out = new java.io.ByteArrayOutputStream()
          bf.writeTo(out)
          Some(new EvalIndex(cur.evalSh.unionByName(fresh), out.toByteArray,
            cur.layers :+ fresh))
        }
      }
    } catch { case e: Throwable => fresh.unpersist(); throw e }
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
    * an APPEND-ONLY tick (the common shape: an eval suite accretes)
    * flows through [[applyDeltaIndex]] at ∝-delta cost — only a
    * delete/compaction tick, an empty-suite start, or the 8-tick fold
    * bound pays the full re-shingle. Exactly-once is unchanged: a
    * replayed batch re-scores against a possibly NEWER eval set but
    * its append is discarded by the txn watermark. */
  def startRefreshable(spark: org.apache.spark.sql.SparkSession,
      evalLoc: String, incoming: DataFrame, dest: GraftTable,
      checkpoint: String, minShared: Int = 3,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val id = GraftStreamIngest.txnId(checkpoint)
    var deltaDepth = 0
    val index = new RefreshableStatic[EvalIndex](evalLoc,
      docs => { val ix = buildIndex(docs); deltaDepth = 0; ix },
      _.release(),
      applyDelta = Some((cur, delta, _) => {
        if (deltaDepth >= FingerprintStream.DeltaFoldEvery) None
        else applyDeltaIndex(cur, delta).map { ix => deltaDepth += 1; ix }
      }))
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
