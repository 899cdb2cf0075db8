package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

import graft.storage.GraftTable

/** Structured Streaming ingest into a graft table with exactly-once
  * semantics — the continuous-load path the reference cannot express
  * (its COPY is batch-only; `TODO.md` lists streaming ingest as open).
  *
  * Shape: `foreachBatch` → [[GraftTable.appendStream]]. The checkpoint
  * gives replayed micro-batches the same `batchId`, and the table
  * metadata records the highest committed batch per ingest pipeline in
  * the SAME atomic commit as the file list, so a batch is either fully
  * visible and recorded, or neither — a crash between "rows written"
  * and "batch marked" cannot double-ingest (`cstore_writer.c:344-357`'s
  * atomic footer rename, extended with the txn watermark).
  *
  * The dedup key is the CHECKPOINT PATH: it is what survives restarts
  * and identifies "the same logical ingest". A checkpoint at a NEW path
  * correctly reads as a new pipeline. CAUTION: wiping a checkpoint
  * directory and reusing its path restarts batch numbering at 0 under
  * the SAME key, so the table's old watermark would classify the fresh
  * batches as replays — call `GraftTable.resetStreamTxn(txnId(chk))`
  * (or pick a new path) when discarding a checkpoint.
  *
  * {{{
  *   val q = GraftStreamIngest.start(events, "/wh/events_graft", "/chk/ev")
  * }}}
  */
object GraftStreamIngest {

  /** Stable txn id for a pipeline: its checkpoint location. */
  def txnId(checkpoint: String): String =
    s"stream:${checkpoint.stripSuffix("/")}"

  /** Run `release` when (and only when) THIS RUN of `q` terminates —
    * the one resource-reap block every stream that builds a static
    * index/cache needs (DedupStream, DecontaminateStream, SpanStream).
    * Matches on `runId`, not `id`: `StreamingQuery.id` is persisted in
    * checkpoint metadata and therefore SHARED by every restart on the
    * same checkpoint, so an earlier run's asynchronously-delivered
    * termination event would otherwise release a restarted run's
    * freshly built cache mid-stream. `release` must be idempotent: a
    * fast AvailableNow query can terminate before the listener lands
    * (its event already gone), so the `!q.isActive` fallback may double
    * up with a delivered event. */
  def releaseOnTerminate(q: StreamingQuery)(release: () => Unit): Unit = {
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = ()
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit =
        if (e.runId == q.runId) {
          release()
          q.sparkSession.streams.removeListener(this)
        }
    }
    q.sparkSession.streams.addListener(listener)
    if (!q.isActive) {
      release()
      q.sparkSession.streams.removeListener(listener)
    }
  }

  /** Attach the exactly-once graft sink to a streaming DataFrame. The
    * caller's table handle is the sink, so its metadata view advances
    * with the ingested batches (appends refresh it under the writer
    * lock). */
  def writer(df: DataFrame, table: GraftTable,
      checkpoint: String, mergeSchema: Boolean = false): DataStreamWriter[Row] = {
    val id = txnId(checkpoint)
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (mergeSchema) table.appendStreamMergeSchema(batch, id, batchId)
        else table.appendStream(batch, id, batchId)
        ()
      }
  }

  /** Start ingesting `df` into the graft table at `location`.
    * `mergeSchema = true` lets a RESTARTED pipeline whose upstream grew
    * a field evolve the table schema atomically with its first batch
    * ([[GraftTable.appendStreamMergeSchema]]); the default keeps the
    * strict align-to-table-schema behavior. */
  def start(df: DataFrame, location: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      mergeSchema: Boolean = false): StreamingQuery =
    start(df, GraftTable.open(df.sparkSession, location), checkpoint, trigger,
      mergeSchema)

  /** Start ingesting `df` into `table`. */
  def start(df: DataFrame, table: GraftTable, checkpoint: String,
      trigger: Trigger): StreamingQuery =
    writer(df, table, checkpoint).trigger(trigger).start()

  /** Start ingesting `df` into `table`, with schema evolution. */
  def start(df: DataFrame, table: GraftTable, checkpoint: String,
      trigger: Trigger, mergeSchema: Boolean): StreamingQuery =
    writer(df, table, checkpoint, mergeSchema).trigger(trigger).start()
}
