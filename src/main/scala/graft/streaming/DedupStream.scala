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
  * At 100 TB the index side is the big one: the shingle join inside
  * each batch is an equality join the planner can bloom-prune or
  * broadcast from the (small) batch side, and the index postings are a
  * one-time computation a caller can persist and reuse across batches.
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
    * exactly-once under the checkpoint's txn id. */
  def start(incoming: DataFrame, indexDocs: DataFrame, dest: GraftTable,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val id = GraftStreamIngest.txnId(checkpoint)
    incoming.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        dest.appendStream(
          Dedup.nearDupAgainstIndex(batch, indexDocs), id, batchId)
        ()
      }
      .trigger(trigger)
      .start()
  }
}
