package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Dedup
import graft.storage.GraftTable

/** Streaming incremental SPAN dedup — d15's batch-vs-corpus shape run
  * continuously: every micro-batch of incoming documents is checked for
  * maximal verbatim token spans (≥ 15 tokens, d14's semantics) against
  * a STATIC corpus, and matches land in a graft table exactly-once.
  *
  * Stream-static discipline, like [[DedupStream]]: a document's spans
  * depend only on its own row and the static corpus, so per-batch
  * matching is exact with ZERO streaming state. The corpus gram frame
  * `(doc_id, pos, gram-hash)` is built ONCE before the stream starts
  * and persisted across micro-batches — the corpus is never re-grammed
  * per trigger; each batch Bloom-sketches its OWN gram hashes and
  * map-side prunes the cached corpus grams before the equality join
  * (d15's exact machinery — `Dedup.spanMatchAgainst` is the shared
  * body, so batch entry and stream cannot drift). Exactly-once comes
  * from [[GraftTable.appendStream]]'s txn watermark. */
object SpanStream {

  /** Start span-checking `incoming` (a streaming documents DataFrame
    * with `doc_id`/`text`) against the static `corpusDocs`; maximal
    * spans append to `dest` exactly-once under the checkpoint's txn
    * id. The corpus gram frame is materialized synchronously before
    * the stream starts and released when it terminates. */
  def start(incoming: DataFrame, corpusDocs: DataFrame, dest: GraftTable,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val id = GraftStreamIngest.txnId(checkpoint)
    val grams = Dedup.corpusSpanGrams(corpusDocs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    grams.count() // one corpus gram pass, before the first trigger
    val q = incoming.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // the batch gram frame feeds the Bloom sketch action AND the
        // join: persist across the two, release once the write lands
        // (the DedupStream per-batch discipline)
        val bg = Dedup.batchSpanGrams(batch)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try dest.appendStream(Dedup.spanMatchAgainst(grams, bg), id, batchId)
        finally bg.unpersist()
        ()
      }
      .trigger(trigger)
      .start()
    // release the cached gram frame when THIS RUN ends (the stream
    // owns the frame it built — the shared reaping discipline)
    GraftStreamIngest.releaseOnTerminate(q)(() => { grams.unpersist(); () })
    q
  }

  /** REFRESHABLE variant (round 14's RangeJoinStream/FingerprintStream
    * discipline): the corpus derives from a COMMITTED graft table, and
    * the gram frame refreshes when the table's version ticks —
    * documents accepted mid-stream are span-checked against later
    * batches without a restart. One metadata read per trigger.
    * Exactly-once unchanged (txn watermark).
    *
    * Append-only ticks are DELTA-merged (round 15, VERDICT r14 #4 on
    * the span modality): corpus k-grams are per-doc independent (no
    * cross-doc aggregation on the corpus side), so gramming only the
    * tick's inserted docs (∝ delta) and unioning onto the served frame
    * is lossless — identical to re-gramming the snapshot. Every
    * [[FingerprintStream.DeltaFoldEvery]]th delta tick folds the stack
    * via a full rebuild; delete/compaction/restore ticks always
    * rebuild. The served side carries its pinned-frame stack so a
    * release drops every persisted block. */
  def startRefreshable(corpusLoc: String, incoming: DataFrame,
      dest: GraftTable, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val spark = incoming.sparkSession
    val id = GraftStreamIngest.txnId(checkpoint)
    def grammed(docs: DataFrame): DataFrame = {
      val g = Dedup.corpusSpanGrams(docs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // materialize before serving; release the partial on a
      // transient rebuild failure so it cannot pin blocks (review r14)
      try { g.count(); g }
      catch { case e: Throwable => g.unpersist(); throw e }
    }
    var deltaDepth = 0
    // (served grams, pinned stack): the union's unpersist would not
    // reach the individually persisted delta frames
    val grams = new RefreshableStatic[(DataFrame, Seq[DataFrame])](corpusLoc,
      docs => { // reset only AFTER the re-gram succeeds (review r15)
        val g = grammed(docs); deltaDepth = 0; (g, Seq(g)) },
      side => { side._2.foreach(_.unpersist()); () },
      applyDelta = Some((cur, delta, _) => {
        if (deltaDepth >= FingerprintStream.DeltaFoldEvery) None
        else {
          val dg = grammed(delta)
          deltaDepth += 1
          Some((cur._1.unionByName(dg), cur._2 :+ dg))
        }
      }))
    val q = incoming.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val bg = Dedup.batchSpanGrams(batch)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try dest.appendStream(
          Dedup.spanMatchAgainst(grams.get(spark)._1, bg), id, batchId)
        finally bg.unpersist()
        ()
      }
      .trigger(trigger)
      .start()
    GraftStreamIngest.releaseOnTerminate(q)(() => grams.close())
    q
  }
}
