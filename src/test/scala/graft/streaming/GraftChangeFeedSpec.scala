package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.storage.GraftTable

/** Streaming change data feed (`format("graft-cdf")`): the continuous
  * twin of the batch `changes()` CDF. Must deliver EVERY commit's exact
  * row diff — appends as inserts, COW DML (incl. SQL MERGE change
  * commits, which the append-only file stream cannot serve) as
  * delete(old)+insert(new) — exactly once across micro-batches and
  * across a restart from checkpoint. */
class GraftChangeFeedSpec extends SparkSpec {

  private def schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  /** Drain the feed with Trigger.AvailableNow into a buffer (foreachBatch
    * — the memory sink can't recover from a checkpoint, which the restart
    * case needs). Returns (k, v, _change_type, _commit_version) rows. */
  private def drain(loc: String, ckpt: String,
      startingVersion: Option[Long] = Some(0L),
      throttle: Option[Long] = None): Seq[(Long, String, String, Long)] = {
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, String, Long)]()
    var r = spark.readStream.format("graft-cdf").option("path", loc)
    startingVersion.foreach(v => r = r.option("startingVersion", v.toString))
    throttle.foreach(m => r = r.option("maxVersionsPerTrigger", m.toString))
    val q = r.load().writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("k", "v", "_change_type", "_commit_version").collect().foreach(row =>
          rows.add((row.getLong(0), row.getString(1), row.getString(2), row.getLong(3))))
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "AvailableNow CDF stream must drain")
    assert(q.exception.isEmpty, q.exception.map(_.toString).getOrElse(""))
    import scala.jdk.CollectionConverters._
    rows.asScala.toSeq
  }

  test("appends, update and delete stream as their exact row diff") {
    import spark.implicits._
    val loc = tmpDir("cdf") + "/t"
    val t = GraftTable.create(spark, loc, schema)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))            // v1
    t.append(Seq((3L, "c")).toDF("k", "v"))                       // v2
    t.update(Map("v" -> lit("B2")),
      Seq(org.apache.spark.sql.sources.EqualTo("k", 2L)))         // v3
    t.delete(Seq(org.apache.spark.sql.sources.EqualTo("k", 1L)))  // v4

    val got = drain(loc, tmpDir("cdf-ck"), throttle = Some(1L)).toSet
    val expect = Set(
      (1L, "a", "insert", 1L), (2L, "b", "insert", 1L),
      (3L, "c", "insert", 2L),
      (2L, "b", "delete", 3L), (2L, "B2", "insert", 3L),
      (1L, "a", "delete", 4L))
    assert(got === expect)
  }

  test("a SQL MERGE change commit streams as its diff (the file stream can't)") {
    import spark.implicits._
    val wh = tmpDir("cdfwh")
    spark.conf.set("spark.sql.catalog.cdfc", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.cdfc.warehouse", wh)
    spark.sql("CREATE TABLE cdfc.db.m (k BIGINT, v STRING) USING graft")
    spark.sql("INSERT INTO cdfc.db.m VALUES (1, 'a'), (2, 'b')")
    Seq((2L, "B"), (9L, "new")).toDF("k", "v").createOrReplaceTempView("cdf_src")
    spark.sql(
      """MERGE INTO cdfc.db.m t USING cdf_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin)

    val got = drain(s"$wh/db/m", tmpDir("cdfm-ck"))
      .map { case (k, v, ct, _) => (k, v, ct) }.toSet
    assert(got === Set(
      (1L, "a", "insert"), (2L, "b", "insert"), // the INSERT commit
      (2L, "b", "delete"), (2L, "B", "insert"), (9L, "new", "insert"))) // MERGE diff
  }

  test("a merge-on-read delete commit streams its dead rows as deletes") {
    import spark.implicits._
    val loc = tmpDir("cdf-dv") + "/t"
    val t = GraftTable.create(spark, loc, schema)
    t.append((1L to 20L).map(k => (k, s"v$k")).toDF("k", "v"))     // v1
    // v2 swaps NO file — the diff must come from the vector alone
    val filesBefore = t.committedFiles.toSet
    t.deleteMor(Seq(org.apache.spark.sql.sources.In("k", Array(3L, 7L, 11L))))
    assert(t.committedFiles.toSet === filesBefore)

    val got = drain(loc, tmpDir("cdf-dv-ck"), throttle = Some(1L))
    val v2 = got.filter(_._4 == 2L).toSet
    assert(v2 === Set(
      (3L, "v3", "delete", 2L), (7L, "v7", "delete", 2L), (11L, "v11", "delete", 2L)),
      "a DV-only commit owes exactly its dead rows, nothing carried")
    assert(got.count(_._4 == 1L) === 20)
  }

  test("restart from checkpoint resumes exactly once; default start is head") {
    import spark.implicits._
    val loc = tmpDir("cdfr") + "/t"
    val ckpt = tmpDir("cdfr-ck")
    val t = GraftTable.create(spark, loc, schema)
    t.append(Seq((1L, "a")).toDF("k", "v"))                       // v1
    assert(drain(loc, ckpt).size === 1)

    // new commits, then resume from the SAME checkpoint: only the delta
    t.append(Seq((2L, "b"), (3L, "c")).toDF("k", "v"))            // v2
    t.delete(Seq(org.apache.spark.sql.sources.EqualTo("k", 1L)))  // v3
    val round2 = drain(loc, ckpt).toSet
    assert(round2 === Set(
      (2L, "b", "insert", 2L), (3L, "c", "insert", 2L),
      (1L, "a", "delete", 3L)),
      "a resumed stream owes exactly the commits after its checkpoint")

    // a FRESH stream with no startingVersion starts at head: no history replay
    assert(drain(loc, tmpDir("cdfr-ck2"), startingVersion = None).isEmpty,
      "default start is the head version — changes before stream start are not owed")
  }

  test("isAppendOnlyRange: metadata-only gate for the streaming delta refresh") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val loc = tmpDir("cdf-appendonly") + "/t"
    val t = GraftTable.create(spark, loc, StructType(Seq(
      StructField("id", LongType), StructField("v", StringType))))
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v")) // v1
    val v1 = t.version
    t.append(Seq((3L, "c")).toDF("id", "v")) // v2
    t.append(Seq((4L, "d")).toDF("id", "v")) // v3
    assert(t.isAppendOnlyRange(v1), "pure appends must read append-only")
    assert(t.isAppendOnlyRange(t.version), "the empty range is append-only")
    assert(!t.isAppendOnlyRange(t.version + 5),
      "a future version must read false, not throw")
    // a COW delete removes a file — the range stops being append-only
    val vPre = t.version
    t.delete(Seq(org.apache.spark.sql.sources.EqualTo("id", 1L)))
    assert(!t.isAppendOnlyRange(vPre), "a delete commit must read false")
    assert(t.isAppendOnlyRange(t.version), "…but after it, appends resume")
    // a MOR delete changes only a deletion vector — still not append-only
    t.append(Seq((5L, "e")).toDF("id", "v"))
    val vMor = t.version
    t.deleteMor(Seq(org.apache.spark.sql.sources.EqualTo("id", 2L)))
    assert(!t.isAppendOnlyRange(vMor),
      "a deletion-vector change must read false")
    // a compaction replaces files — false, at metadata cost only
    t.append(Seq((6L, "f")).toDF("id", "v"))
    val vCmp = t.version
    assert(t.compactSmall(1L << 30, 1L << 30) > 0)
    assert(!t.isAppendOnlyRange(vCmp), "a compaction commit must read false")
    // expired history reads false (the caller's full-rebuild fallback)
    t.append(Seq((7L, "g")).toDF("id", "v"))
    val vOld = v1
    t.expireHistory(keepLast = 1)
    assert(!t.isAppendOnlyRange(vOld), "an expired range must read false")
    GraftTable.drop(loc)
  }
}
