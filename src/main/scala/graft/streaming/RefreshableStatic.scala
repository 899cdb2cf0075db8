package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  * every cache type used here). */
private[streaming] final class RefreshableStatic[T](corpusLoc: String,
    build: DataFrame => T, release: T => Unit) {

  private var version = -1L
  private var cached: Option[T] = None

  /** The current cache, rebuilt if the committed table ticked. */
  def get(spark: SparkSession): T = {
    val t = GraftTable.open(spark, corpusLoc)
    val v = t.version
    if (cached.isEmpty || v != version) {
      val next = build(t.read()) // build cleans its own partials on throw
      cached.foreach(release)
      cached = Some(next)
      version = v
    }
    cached.get
  }

  def close(): Unit = {
    cached.foreach(release)
    cached = None
  }
}
