package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Multimodal
import graft.storage.GraftTable

/** Streaming incremental IMAGE near-dup — the continuous twin of the
  * batch m10 ([[graft.operators.Multimodal.m10IncrementalPhash]]) and
  * of `CALL phash_match`: every micro-batch of arriving images is
  * dHashed and checked against a COMMITTED corpus fingerprint table
  * (`CALL phash_index`'s artifact), and min-match rows land in a graft
  * table exactly-once.
  *
  * Stream-static discipline, like [[SpanStream]]/[[RangeJoinStream]]:
  * a match row depends only on its own image and the immutable
  * fingerprint side, so per-batch matching is exact with ZERO
  * streaming state — no state store, no watermark (the spec pins
  * `stateOperators` empty). The fingerprint frame is persisted ONCE
  * before the stream starts (fingerprints, not images — the corpus is
  * never re-decoded); each batch is hashed ∝ batch, Bloom-sketches its
  * OWN band keys, and map-side prunes the cached corpus fingerprints
  * before the banded equality join
  * ([[Multimodal.matchAgainstFingerprints]], the shared body — batch
  * entry, CALL verb, and stream cannot drift). Exactly-once comes from
  * [[GraftTable.appendStream]]'s txn watermark. */
object FingerprintStream {

  /** Delta ticks between stack folds: after this many append-only
    * merges the refreshable corpus side full-rebuilds once, bounding
    * the served union's plan depth (and the duplicate-group fraction)
    * while amortizing the ∝-corpus re-collapse over many ∝-delta
    * ticks. */
  private[streaming] val DeltaFoldEvery = 8

  /** Start checking `incoming` (a streaming frame whose first two
    * columns are (id, media bytes)) against the static `corpusFps`
    * (doc_id, hi, lo); min-match rows append to `dest` exactly-once
    * under the checkpoint's txn id. The fingerprint frame is
    * materialized synchronously before the stream starts and released
    * when it terminates. `hash` is the modality's fingerprint stage —
    * defaults to the image dHash; pass
    * [[Multimodal.audioFingerprints]] for a WAV intake stream (the
    * two CALL verbs' own cores, so stream and batch cannot drift). */
  def start(incoming: DataFrame, corpusFps: DataFrame, dest: GraftTable,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      hash: DataFrame => DataFrame = Multimodal.phashFingerprints)
      : StreamingQuery = {
    val id = GraftStreamIngest.txnId(checkpoint)
    // pre-COLLAPSED representatives, not raw fingerprints: the groupBy
    // is batch-independent, so paying it per trigger would shuffle the
    // corpus once per micro-batch (review r14)
    val fps = Multimodal.collapseFpsReps(corpusFps)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    fps.count() // one fingerprint pass, before the first trigger
    val q = incoming.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // one decode of the batch feeds the Bloom sketch action AND
        // the member-expansion join (the SpanStream per-batch
        // discipline, with localCheckpoint because the hash stage is
        // the dominant per-batch cost)
        val bfps = hash(batch).localCheckpoint(true)
        dest.appendStream(
          Multimodal.matchCollapsedAgainst(fps, bfps), id, batchId)
        ()
      }
      .trigger(trigger)
      .start()
    GraftStreamIngest.releaseOnTerminate(q)(() => { fps.unpersist(); () })
    q
  }

  /** REFRESHABLE variant (RangeJoinStream.startRefreshable's
    * discipline on this operator): the fingerprint side derives from a
    * COMMITTED graft table — `CALL phash_index`'s artifact, grown by
    * `phash_index_append` as intake batches are accepted — and is
    * re-read when the table's version ticks, so fingerprints committed
    * MID-STREAM dedup later batches without a restart. One metadata
    * read per trigger; the re-read runs only on an actual commit. The
    * txn watermark keeps replays exactly-once even against newer
    * fingerprints.
    *
    * Append-only ticks are DELTA-merged, not full rebuilds (VERDICT
    * r14 #4 — under per-intake-batch `phash_index_append` cadence a
    * full re-collapse pays ∝ corpus per tick): only the tick's
    * INSERTED rows are collapsed (shuffle ∝ delta) and unioned onto
    * the served reps stack. A fingerprint group split across base and
    * delta surfaces as two rep rows, which is LOSSLESS here: the match
    * core's own `min(rep)` aggregate re-mins collided groups, so
    * served results are identical to a full re-collapse (spec-pinned).
    * Every [[DeltaFoldEvery]]th delta tick folds the stack via a full
    * rebuild, bounding plan depth; delete/compaction/restore ticks
    * always take the full path. */
  def startRefreshable(spark: org.apache.spark.sql.SparkSession,
      fpsLoc: String, incoming: DataFrame, dest: GraftTable,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      hash: DataFrame => DataFrame = Multimodal.phashFingerprints)
      : StreamingQuery = {
    val id = GraftStreamIngest.txnId(checkpoint)
    // the shared version-tick skeleton, collapsing ONCE per tick
    // (review r14); localCheckpoint blocks are ContextCleaner-reclaimed
    var deltaDepth = 0
    val fps = new RefreshableStatic[DataFrame](fpsLoc,
      t => { // reset only AFTER the fold succeeds — resetting at entry
        // would let a persistently FAILING rebuild hand out 8 fresh
        // delta slots per retry and grow the stack unbounded (review r15)
        val folded = Multimodal.collapseFpsReps(t).localCheckpoint(true)
        deltaDepth = 0
        folded
      }, _ => (),
      applyDelta = Some((cur, delta, _) => {
        if (deltaDepth >= DeltaFoldEvery) None // fold the stack
        else {
          // collapse ONLY the delta (∝ delta); the union's duplicate
          // (hi, lo) groups re-min inside the match aggregate
          val dReps = Multimodal.collapseFpsReps(
            delta.select("doc_id", "hi", "lo")).localCheckpoint(true)
          deltaDepth += 1
          Some(cur.unionByName(dReps))
        }
      }))
    val q = incoming.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val bfps = hash(batch).localCheckpoint(true)
        dest.appendStream(
          Multimodal.matchCollapsedAgainst(fps.get(spark), bfps), id, batchId)
        ()
      }
      .trigger(trigger)
      .start()
    GraftStreamIngest.releaseOnTerminate(q)(() => fps.close())
    q
  }
}
