package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.storage.GraftTable

/** The version-tick refresh skeleton EVERY stream-static operator's
  * refreshable variant shares (review r14: four hand-rolled copies had
  * already diverged): per trigger, ONE metadata read (a fresh
  * `GraftTable.open` so another session's commit is visible) compares
  * the committed table's version to the cached build's; on a tick the
  * replacement is built EAGERLY (the `build` function must materialize
  * — persist+count or localCheckpoint — and must clean up its own
  * partials if it throws, so a transient rebuild failure cannot leak
  * pinned blocks), then the superseded cache is released. Instances
  * are single-threaded by contract (foreachBatch runs on the query's
  * microbatch thread); `close()` releases the final cache and is safe
  * to call from a termination listener (release is idempotent for
  * every cache type used here).
  *
  * DELTA refresh (VERDICT r14 #4): `build(t.read())` re-reads the
  * ENTIRE corpus per tick — fine at daily commit cadence, ∝ corpus
  * per intake batch when small accepts tick frequently. When the
  * operator supplies `applyDelta`, an append-only tick instead feeds
  * it the change feed's INSERTED rows (`GraftTable.changes` — an
  * append commit's feed reads only the added files, no shuffle) plus
  * the VERSION the delta reaches, so the refresh costs ∝ delta.
  * Contracts:
  *  - `applyDelta(cur, delta, v)` must MATERIALIZE its result before
  *    returning (the `build` discipline) and takes OWNERSHIP of `cur`:
  *    the returned cache may reuse `cur`'s pinned state, so the
  *    skeleton does NOT release the superseded cache on the delta path
  *    (it still does on full rebuilds, and `close()` releases whatever
  *    is current).
  *  - Returning None falls back to a full rebuild — the operator's
  *    bound on delta-stack growth.
  *  - `v` is the tick's GATED version — the version the delta feed
  *    reaches. An operator that must re-read the corpus inside its
  *    merge (the sessionized range-join side) reads the snapshot AT v
  *    (`GraftTable.openVersion`), never the current table: a commit
  *    landing between the gate and the read would otherwise serve
  *    mixed-version state for one tick (ADVICE r15).
  *  - The append-only precondition is checked from METADATA alone
  *    (`GraftTable.isAppendOnlyRange` — history JSONs, no data scan):
  *    any removed file, deletion-vector change, schema change,
  *    unreadable/expired history, or version regression (restore)
  *    falls back to the full rebuild — compaction/restore ticks are
  *    correctness-critical and the full path is always right. */
private[graft] final class RefreshableStatic[T](corpusLoc: String,
    build: DataFrame => T, release: T => Unit,
    applyDelta: Option[(T, DataFrame, Long) => Option[T]] = None) {

  private var version = -1L
  private var cached: Option[T] = None

  /** The current cache, rebuilt (or delta-merged) if the committed
    * table ticked. The no-tick probe is `committedVersion` — a raw
    * head read, NO manifest hydration (round 16: `open` replays the
    * full segment list to hydrate the file map, an O(table files)
    * driver fold paid on EVERY trigger at 1M-file scale just to learn
    * "no new version"); the table opens only on an actual tick. */
  def get(spark: SparkSession): T = {
    val v = GraftTable.committedVersion(corpusLoc)
    if (cached.isEmpty || v != version) {
      val t = GraftTable.open(spark, corpusLoc)
      val merged =
        if (v > version) for {
          cur <- cached
          ad <- applyDelta
          next <- tryApplyDelta(t, cur, ad, v)
        } yield next
        else None
      merged match {
        case Some(next) =>
          cached = Some(next) // cur is owned by (possibly inside) next
          version = v // the delta covered exactly (version, v]
        case None =>
          val snap = t.read() // build cleans its own partials on throw
          val next = build(snap)
          cached.foreach(release)
          cached = Some(next)
          // record the version the snapshot ACTUALLY served — the
          // gate's refreshMeta may have advanced t past v (a commit
          // landing mid-tick), and recording v here would make the
          // NEXT tick re-apply rows the rebuild already contains
          // (review r15: the delta double-apply)
          version = t.version
      }
    }
    cached.get
  }

  /** The insert-only delta path; None on any reason to distrust it. */
  private def tryApplyDelta(t: GraftTable, cur: T,
      ad: (T, DataFrame, Long) => Option[T], v: Long): Option[T] =
    try {
      // METADATA-ONLY gate (review r15): a compaction commit's feed
      // diffs to EMPTY at the cost of scanning the compacted mass, so
      // probing the feed's ROWS would pay that scan just to learn
      // "rebuild". The file-list check reads only the history JSONs;
      // when it passes, changes() takes its no-shuffle added-files
      // shortcut and every row is an insert (the filter is a guard,
      // not a scan). The gate and changes() each read the range's
      // history metas — 2× metadata I/O per tick, bounded by the
      // tick's COMMIT COUNT (usually one), never by data size.
      if (!t.isAppendOnlyRange(version)) None
      else ad(cur, t.changes(version, v)
        .filter(col("_change_type") === "insert")
        .drop("_change_type", "_commit_version"), v)
    } catch { case _: Exception => None }

  def close(): Unit = {
    cached.foreach(release)
    cached = None
  }
}
