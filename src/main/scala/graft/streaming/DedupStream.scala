package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Dedup
import graft.storage.GraftTable

/** Streaming incremental near-dup detection — d12's batch-vs-index
  * shape run continuously: every micro-batch of incoming documents is
  * scored against a STATIC indexed corpus, and the surviving
  * (doc_b, doc_a, jac) matches land in a graft table with exactly-once
  * semantics.
  *
  * Why `foreachBatch` and not a streaming join: the per-pair
  * common-shingle count is an aggregation, which as a streaming
  * aggregate would accrue unbounded state keyed on (pair); but the
  * score of a document depends only on ITS OWN batch row and the
  * static index, so per-batch scoring is exact with zero streaming
  * state — the stream-static discipline. Exactly-once comes from
  * [[GraftTable.appendStream]]: the checkpoint replays a crashed batch
  * with the same batchId and the table's txn watermark dedupes it (the
  * [[GraftStreamIngest]] contract).
  *
  * At 100 TB the index side is the big one, so it is built ONCE:
  * `start` materializes a [[Dedup.PostingsIndex]] (one shingle pass
  * over the index corpus, persisted) before the stream begins, and
  * every micro-batch Bloom-prunes the cached postings from its own
  * (small) shingle set and joins only the survivors — the index corpus
  * is never re-shingled per batch.
  *
  * {{{
  *   val q = DedupStream.start(
  *     spark.readStream.format("graft").load(incomingTable),
  *     indexDocs = spark.read.parquet(corpus),
  *     dest, checkpoint)
  * }}}
  */
object DedupStream {

  /** Start scoring `incoming` (a streaming documents DataFrame with
    * `doc_id`/`text`) against `indexDocs`; matches append to `dest`
    * exactly-once under the checkpoint's txn id. Builds the postings
    * index once, synchronously, before the stream starts; the index is
    * released when the stream terminates. */
  def start(incoming: DataFrame, indexDocs: DataFrame, dest: GraftTable,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val index = Dedup.PostingsIndex.build(indexDocs)
    val q = start(incoming, index, dest, checkpoint, trigger)
    // release the index's cached blocks when THIS RUN ends (the stream
    // owns an index it built; a caller-provided one is theirs)
    GraftStreamIngest.releaseOnTerminate(q)(() => index.release())
    q
  }

  /** Same, against a caller-prebuilt (shared, reusable) index. */
  def start(incoming: DataFrame, index: Dedup.PostingsIndex, dest: GraftTable,
      checkpoint: String, trigger: Trigger): StreamingQuery = {
    val id = GraftStreamIngest.txnId(checkpoint)
    incoming.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // the batch postings feed the Bloom sketch action AND the join:
        // persist across the two, release once the write lands —
        // foreachBatch provides the completion point a lazy result lacks
        val bpos = Dedup.shinglePostings(batch, "doc_b", "nb")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try dest.appendStream(index.score(bpos), id, batchId)
        finally bpos.unpersist()
        ()
      }
      .trigger(trigger)
      .start()
  }

  /** REFRESHABLE variant (round 14's RangeJoinStream/FingerprintStream
    * discipline): the index corpus derives from a COMMITTED graft
    * table, and the postings index refreshes when the table's version
    * ticks — documents accepted mid-stream dedup later batches without
    * a restart. One metadata read per trigger. Exactly-once is
    * unchanged (a replayed batch re-scores against possibly NEWER docs
    * but its append is discarded by the txn watermark).
    *
    * Append-only ticks are DELTA-merged (round 15, VERDICT r14 #4 on
    * the text modality): only the tick's inserted docs are shingled
    * (∝ delta) and their postings unioned onto the served index —
    * lossless, because index-side postings rows are per-doc
    * independent ([[Dedup.PostingsIndex.withDocs]]). Every
    * [[FingerprintStream.DeltaFoldEvery]]th delta tick folds the
    * stack via a full rebuild (one shingle pass over the snapshot);
    * delete/compaction/restore ticks always rebuild. */
  def startRefreshable(corpusLoc: String, incoming: DataFrame,
      dest: GraftTable, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val spark = incoming.sparkSession
    val id = GraftStreamIngest.txnId(checkpoint)
    var deltaDepth = 0
    val index = new RefreshableStatic[Dedup.PostingsIndex](corpusLoc,
      docs => { // reset only AFTER the rebuild succeeds (review r15)
        val ix = Dedup.PostingsIndex.build(docs)
        deltaDepth = 0
        ix
      },
      _.release(),
      applyDelta = Some((cur, delta, _) => {
        if (deltaDepth >= FingerprintStream.DeltaFoldEvery) None
        else { deltaDepth += 1
          Some(cur.withDocs(delta.select("doc_id", "text"))) }
      }))
    val q = incoming.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val bpos = Dedup.shinglePostings(batch, "doc_b", "nb")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try dest.appendStream(index.get(spark).score(bpos), id, batchId)
        finally bpos.unpersist()
        ()
      }
      .trigger(trigger)
      .start()
    GraftStreamIngest.releaseOnTerminate(q)(() => index.close())
    q
  }
}
