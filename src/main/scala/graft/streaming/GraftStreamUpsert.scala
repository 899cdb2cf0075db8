package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.storage.GraftTable

/** Structured Streaming UPSERT into a graft table — the CDC-into-table
  * shape (each micro-batch carries the latest row per key; matched keys
  * update, new keys insert) with exactly-once semantics, the streaming
  * companion of [[GraftStreamIngest]] built on [[GraftTable.mergeStream]].
  *
  * Exactly-once: the checkpoint replays a crashed micro-batch under the
  * same batchId; the table records the highest committed batch per
  * pipeline in the SAME atomic commit as the merge, so a replay is a
  * no-op — an upsert is applied once even though the batch may run
  * twice. The dedup key is the checkpoint path, with the same
  * wiped-checkpoint caveat as the ingest (see [[GraftStreamIngest]]).
  *
  * Scale shape: each micro-batch zone-map-prunes candidate files
  * against the batch's key range, so a stream of recent keys into a
  * key-clustered table (`sort_by`) rewrites only recent files — the
  * table never rewrites more than the touched groups per trigger.
  * Downstream streams over the table keep working: merge commits record
  * their insert files as the stream-visible subset (`emit_files`), so a
  * reader stream sees exactly the NEW keys, never a re-delivery of
  * updated carries.
  *
  * A micro-batch with several rows per key is ambiguous under MERGE's
  * cardinality rule and throws; deduplicate to the latest row per key
  * upstream (e.g. a window by event time) before the sink.
  */
object GraftStreamUpsert {

  /** Stable txn id for a pipeline: its checkpoint location (namespaced
    * apart from the append ingest, so an upsert and an append pipeline
    * reusing one checkpoint path cannot collide watermarks). */
  def txnId(checkpoint: String): String =
    s"upsert:${checkpoint.stripSuffix("/")}"

  /** Attach the exactly-once upsert sink to a streaming DataFrame. */
  def writer(df: DataFrame, table: GraftTable, keyCols: Seq[String],
      checkpoint: String): DataStreamWriter[Row] = {
    val id = txnId(checkpoint)
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        table.mergeStream(batch, keyCols, id, batchId)
        ()
      }
  }

  /** Start upserting `df` into the graft table at `location`. */
  def start(df: DataFrame, location: String, keyCols: Seq[String],
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    start(df, GraftTable.open(df.sparkSession, location), keyCols, checkpoint,
      trigger)

  /** Start upserting `df` into `table`. */
  def start(df: DataFrame, table: GraftTable, keyCols: Seq[String],
      checkpoint: String, trigger: Trigger): StreamingQuery =
    writer(df, table, keyCols, checkpoint).trigger(trigger).start()

  /** Attach a FULL CDC sink: the stream carries an op column, rows with
    * `deleteOp` REMOVE their key from the table, everything else
    * upserts — each micro-batch's deletes and upserts land in ONE
    * atomic commit ([[GraftTable.applyCdc]]), so readers never observe
    * a half-applied batch and a checkpoint replay skips both halves
    * together. This is the changelog-materialization shape: a Debezium/
    * CDC feed keeps a graft table equal to the source table it mirrors. */
  def cdcWriter(df: DataFrame, table: GraftTable, keyCols: Seq[String],
      opCol: String, checkpoint: String,
      deleteOp: String = "D"): DataStreamWriter[Row] = {
    val id = txnId(checkpoint)
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        table.applyCdcStream(batch, keyCols, opCol, id, batchId, deleteOp)
        ()
      }
  }

  /** Start materializing a CDC changelog stream into `table`. */
  def startCdc(df: DataFrame, table: GraftTable, keyCols: Seq[String],
      opCol: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      deleteOp: String = "D"): StreamingQuery =
    cdcWriter(df, table, keyCols, opCol, checkpoint, deleteOp)
      .trigger(trigger).start()
}
