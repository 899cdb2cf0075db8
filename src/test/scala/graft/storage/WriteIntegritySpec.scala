package graft.storage

import java.nio.file.{Files, Paths}
import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Round-3 storage-integrity fixes:
  *
  *  1. ALTER default synthesis matches the reference
  *     (`cstore_reader.c:1224-1292`): defaults apply only to stripes that
  *     predate the ALTER; an explicit NULL appended afterwards stays NULL
  *     — identically through the Scala read path and the DSv2 scan.
  *  2. Concurrent appends are serialized by the table writer lock
  *     (`cstore_fdw.c:560-564`): no clobbered batch dirs, no dropped
  *     file lists.
  *  3. Append counts rows from the written parquet footers, not a second
  *     scan of the data it just wrote.
  */
class WriteIntegritySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("name", StringType)))

  test("explicit NULL after ADD COLUMN DEFAULT stays NULL in both read paths") {
    import spark.implicits._
    val loc = tmpDir("alter-null") + "/tbl"
    val t = GraftTable.create(spark, loc, schema)
    t.append(Seq((1, "pre")).toDF("id", "name"))
    t.addColumn("score", IntegerType, default = 42)
    // post-ALTER append with an EXPLICIT null — must not be rewritten
    t.append(Seq((2, "post", null.asInstanceOf[Integer]), (3, "post", Integer.valueOf(7)))
      .toDF("id", "name", "score"))

    def check(rows: Array[org.apache.spark.sql.Row]): Unit = {
      val byId = rows.map(r => r.getInt(0) -> (if (r.isNullAt(2)) null else r.getInt(2))).toMap
      assert(byId(1) === 42, "pre-ALTER row gets the default")
      assert(byId(2) === null, "explicit NULL after ALTER must stay NULL")
      assert(byId(3) === 7)
    }
    check(t.read().orderBy("id").collect())
    // DSv2 path must agree (the round-2 divergence: no defaults at all)
    check(spark.read.format("graft").load(loc).orderBy("id").collect())
    GraftTable.drop(loc)
  }

  test("string + double defaults synthesize only for pre-ALTER files (both paths)") {
    import spark.implicits._
    val loc = tmpDir("alter-multi") + "/tbl"
    val t = GraftTable.create(spark, loc, schema)
    t.append(Seq((1, "a")).toDF("id", "name"))
    t.addColumn("tag", StringType, default = "it's")
    t.addColumn("w", DoubleType, default = 2.5)
    t.append(Seq((2, "b", null.asInstanceOf[String], null.asInstanceOf[java.lang.Double]))
      .toDF("id", "name", "tag", "w"))
    for (df <- Seq(t.read(), spark.read.format("graft").load(loc))) {
      val rows = df.orderBy("id").collect()
      assert(rows(0).getString(2) === "it's" && rows(0).getDouble(3) === 2.5)
      assert(rows(1).isNullAt(2) && rows(1).isNullAt(3))
    }
    GraftTable.drop(loc)
  }

  test("concurrent appends from separate instances lose no rows (cstore_fdw.c:560-564)") {
    import spark.implicits._
    val loc = tmpDir("conc-append") + "/tbl"
    GraftTable.create(spark, loc, schema)
    val writers = 6
    val rowsEach = 100
    val pool = Executors.newFixedThreadPool(writers)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = (0 until writers).map { w =>
        Future {
          // fresh instance per writer — the DSv2 INSERT pattern that lost
          // rows before the writer lock existed
          val t = GraftTable.open(spark, loc)
          t.append((0 until rowsEach).map(i => (w * rowsEach + i, s"w$w"))
            .toDF("id", "name"))
        }
      }
      Await.result(Future.sequence(futures), 120.seconds)
    } finally pool.shutdown()
    val t = GraftTable.open(spark, loc)
    assert(t.rowCountFromMetadata() === writers * rowsEach)
    assert(t.read().count() === writers * rowsEach)
    assert(t.read().select("id").distinct().count() === writers * rowsEach)
    // every committed file exists on disk and is listed exactly once
    val files = t.committedFiles
    assert(files.distinct.size === files.size)
    files.foreach { f =>
      val p = new org.apache.hadoop.fs.Path(f).toUri.getPath
      assert(Files.exists(Paths.get(p)), s"missing committed file $f")
    }
    GraftTable.drop(loc)
  }

  test("post-ALTER whole-row: column order, count(*), to_json(struct(*)) (sql/alter.sql:57)") {
    import org.apache.spark.sql.functions.{struct, to_json}
    import spark.implicits._
    val loc = tmpDir("whole-row") + "/tbl"
    val t = GraftTable.create(spark, loc, schema)
    t.append(Seq((1, "pre")).toDF("id", "name"))
    t.addColumn("score", IntegerType, default = 5)
    t.append(Seq((2, "post", 9)).toDF("id", "name", "score"))
    // reference sql/alter.sql:57: after ADD COLUMN the whole-row shape has
    // the new column LAST, and count(t.*) sees every row
    assert(t.read().columns.toSeq === Seq("id", "name", "score"))
    assert(t.read().select(struct(col("*"))).count() === 2)
    // whole-row serialization includes the synthesized default for
    // pre-ALTER rows (cstore_fdw.c:1921-1929 whole-row reference)
    val js = t.read().orderBy("id")
      .select(to_json(struct(col("*"))).as("j")).collect().map(_.getString(0))
    assert(js(0) === """{"id":1,"name":"pre","score":5}""")
    assert(js(1) === """{"id":2,"name":"post","score":9}""")
    // DROP COLUMN: whole-row shape shrinks identically in both paths
    t.dropColumn("name")
    assert(t.read().columns.toSeq === Seq("id", "score"))
    assert(spark.read.format("graft").load(loc).columns.toSeq === Seq("id", "score"))
    GraftTable.drop(loc)
  }

  test("leased reclaim: stale claims reclaim once, committed snapshots are untouchable") {
    import spark.implicits._
    val loc = tmpDir("reclaim") + "/t"
    val t = GraftTable.create(spark, loc, schema)
    t.append(Seq((1, "a")).toDF("id", "name")) // v1 commit
    val (fs, _) = GraftTable.fsAndPath(t.location)
    val old = System.currentTimeMillis() - 3600L * 1000
    def mkStale(v: Long): org.apache.hadoop.fs.Path = {
      val p = GraftTable.historyPath(t.location, v)
      val out = fs.create(p, false)
      out.write("{\"broken".getBytes("UTF-8")); out.close()
      fs.setTimes(p, old, -1)
      p
    }
    // a PARSEABLE snapshot — even an ancient one — is a commit: the
    // leased re-check must refuse to delete it (this is the TOCTOU the
    // lease closes: a sibling janitor reclaiming the path and committing
    // there between our staleness check and our delete)
    val v1 = GraftTable.historyPath(t.location, 1)
    fs.setTimes(v1, old, -1)
    assert(!GraftTable.reclaimStaleClaim(fs, v1), "must not reclaim a commit")
    assert(fs.exists(v1), "committed snapshot must survive")
    // a stale broken claim reclaims exactly once, and the lease file is
    // released afterwards
    val v2 = mkStale(2)
    assert(GraftTable.reclaimStaleClaim(fs, v2))
    assert(!fs.exists(v2), "stale claim deleted")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(v2.getParent, v2.getName + ".reclaim")),
      "lease released")
    // a FRESH lease held by another janitor blocks reclamation entirely
    val v3 = mkStale(3)
    val lease3 = new org.apache.hadoop.fs.Path(v3.getParent, v3.getName + ".reclaim")
    fs.create(lease3, false).close()
    assert(!GraftTable.reclaimStaleClaim(fs, v3), "held lease must block")
    assert(fs.exists(v3), "claim untouched while the lease is held")
    fs.delete(lease3, false); fs.delete(v3, false)
    GraftTable.drop(loc)
  }

  test("concurrent same-batch streaming appends: one commit, replays are clean no-ops") {
    import spark.implicits._
    val loc = tmpDir("stream-race") + "/t"
    GraftTable.create(spark, loc, schema)
    val df = Seq((1, "a"), (2, "b")).toDF("id", "name")
    // 8 writers race the SAME (queryId, batchId) through separate
    // handles; whichever interleaving occurs — front-door skip or
    // rebase-time CommitSuperseded — exactly one batch may land and no
    // writer may throw (the zombie-driver replay contract)
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val gate = new java.util.concurrent.CyclicBarrier(8)
    val rows = Await.result(Future.sequence((1 to 8).map { _ =>
      Future {
        val h = GraftTable.open(spark, loc)
        gate.await()
        h.appendStream(df, "qz", 7L)
      }
    }), 120.seconds)
    pool.shutdown()
    assert(rows.count(_ == 2L) === 1, s"exactly one writer commits: $rows")
    assert(rows.count(_ == 0L) === 7, s"replays return 0: $rows")
    assert(GraftTable.open(spark, loc).read().count() === 2L)
    GraftTable.drop(loc)
  }

  test("append runs exactly one job — no re-scan of the written batch") {
    import spark.implicits._
    val loc = tmpDir("append-jobs") + "/tbl"
    val t = GraftTable.create(spark, loc, schema)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(jobStart: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val n = t.append((1 to 1000).map(i => (i, s"n$i")).toDF("id", "name"))
      assert(n === 1000, "row count must still be exact (from parquet footers)")
      // listener events are async; give the bus a moment to drain
      val deadline = System.nanoTime() + 5000000000L
      while (jobs.get() < 1 && System.nanoTime() < deadline) Thread.sleep(20)
      Thread.sleep(200)
      assert(jobs.get() === 1,
        s"append should run only the write job, ran ${jobs.get()}")
    } finally spark.sparkContext.removeSparkListener(listener)
    GraftTable.drop(loc)
  }
}
