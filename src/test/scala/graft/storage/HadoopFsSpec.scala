package graft.storage

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The table layer on a non-`file:` Hadoop filesystem: the whole
  * lifecycle — create → append → zone-map prune → analyze → truncate →
  * drop — through a `mock:` scheme URI (a [[MockFs]] backed by local
  * disk), proving every metadata/list/size/delete operation goes through
  * the resolved `FileSystem` rather than `java.nio` local paths. This is
  * the difference between "correct at local[32]" and "deployable where
  * the warehouse is HDFS/object storage". */
class HadoopFsSpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.sparkContext.hadoopConfiguration
      .set("fs.mock.impl", classOf[MockFs].getName)
  }

  private val schema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("name", StringType)))

  test("full table lifecycle over a mock: scheme URI") {
    import spark.implicits._
    val loc = "mock:" + tmpDir("graft-hfs") + "/tbl"
    val t = GraftTable.create(spark, loc, schema)
    assert(GraftTable.exists(loc))

    // three appends = three files with disjoint ranges (zone-map food)
    for (base <- Seq(0, 1000, 2000)) {
      t.append((base until base + 100).map(i => (i, s"n$i")).toDF("id", "name").coalesce(1))
    }
    assert(t.rowCountFromMetadata() === 300L)
    assert(t.tableSize() > 0L)

    // Scala read path
    assert(t.read().count() === 300L)

    // zone maps harvested and refuting through the mock scheme
    assert(t.prunedFiles(Seq(EqualTo("id", 5000))).isEmpty)
    assert(t.prunedFiles(Seq(And(GreaterThanOrEqual("id", 1000),
      LessThan("id", 1100)))).size === 1)

    // DSv2 read path: pushed filter shrinks the planned scan
    val df = spark.read.format("graft").load(loc)
    def partitionsFor(filtered: org.apache.spark.sql.DataFrame): Int =
      filtered.queryExecution.executedPlan.collectFirst {
        case b: BatchScanExec => b.inputRDD.getNumPartitions
      }.getOrElse(fail("no BatchScanExec in plan"))
    assert(partitionsFor(df.filter(col("id") === 1500)) <
      partitionsFor(df.filter(col("id") >= 0)))
    assert(df.filter(col("id") === 1050).count() === 1L)

    // schema evolution commits through the mock filesystem
    t.addColumn("flag", IntegerType, 7)
    assert(GraftTable.open(spark, loc).read()
      .filter(col("flag") === 7).count() === 300L)

    // ANALYZE writes + re-reads its stats file on the mock filesystem
    val st = t.analyze()
    assert(st.rowCount === 300L)
    assert(GraftTable.open(spark, loc).stats().exists(_.rowCount == 300L))

    // truncate keeps the definition, drops the data
    t.truncate()
    assert(t.read().count() === 0L)
    assert(GraftTable.open(spark, loc).schema.fieldNames.contains("flag"))

    // drop removes everything
    GraftTable.drop(loc)
    assert(!GraftTable.exists(loc))
    val localPath = new org.apache.hadoop.fs.Path(loc).toUri.getPath
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(localPath)),
      "drop must delete the backing directory")
  }

  test("merge-on-read lifecycle over a mock: scheme URI") {
    import spark.implicits._
    val loc = "mock:" + tmpDir("graft-hfs-mor") + "/tbl"
    val t = GraftTable.create(spark, loc, schema)
    for (base <- Seq(0, 1000))
      t.append((base until base + 100).map(i => (i, s"n$i")).toDF("id", "name").coalesce(1))
    // sidecar write (executor), vectored read, verify — all through the
    // resolved FileSystem, never java.nio
    assert(t.deleteMor(Seq(In("id", Array(3, 1005)))) === 2L)
    assert(t.dvEntries.size === 2)
    assert(t.rowCountFromMetadata() === 198L)
    assert(t.read().count() === 198L)
    assert(t.read().filter(col("id") === 3).count() === 0L)
    assert(t.verify() === Seq.empty)
    // MOR update: sidecar + appended version on the mock scheme
    assert(t.updateMor(Map("name" -> lit("upd")), Seq(EqualTo("id", 1010))) === 1L)
    assert(t.read().filter(col("name") === "upd").count() === 1L)
    assert(t.read().count() === 198L)
    // DSv2 read applies vectors through the mock scheme too
    assert(spark.read.format("graft").load(loc).count() === 198L)
    // compaction materializes; vacuum reclaims the expired sidecars
    t.compact()
    assert(t.dvEntries.isEmpty)
    assert(t.read().count() === 198L)
    assert(t.verify(deep = true) === Seq.empty)
    GraftTable.drop(loc)
  }

  test("time travel over a mock: scheme URI (snapshots, retention, vacuum)") {
    import spark.implicits._
    val loc = "mock:" + tmpDir("graft-hfs-tt") + "/tbl"
    val t = GraftTable.create(spark, loc, schema)
    for (base <- Seq(0, 1000))
      t.append((base until base + 50).map(i => (i, s"n$i")).toDF("id", "name").coalesce(1))
    assert(t.version === 2L)
    assert(t.readVersion(1).count() === 50L)
    assert(t.history().map(_._2) === Seq(0L, 50L, 100L))
    // compact + retention contract through the mock scheme
    t.compact()
    assert(t.vacuum() === 0, "snapshots pin the replaced dirs")
    assert(t.expireHistory(keepLast = 1) > 0)
    withConf("spark.graft.commit.claimGraceMs", "-1") {
      assert(t.vacuum() > 0)
    }
    assert(t.read().count() === 100L)
    GraftTable.drop(loc)
  }

  test("commit refuses known non-atomic exclusive-create schemes unless attested") {
    // the CAS protocol's one primitive is create(overwrite=false); on
    // stock S3A that is exists-check-then-PUT, not atomic — fail fast
    GraftTable.requireAtomicCreate("file")
    GraftTable.requireAtomicCreate("hdfs")
    GraftTable.requireAtomicCreate("abfs")
    GraftTable.requireAtomicCreate("mock")
    GraftTable.requireAtomicCreate(null)
    val e = intercept[UnsupportedOperationException] {
      GraftTable.requireAtomicCreate("s3a")
    }
    assert(e.getMessage.contains("assumeAtomicCreate"))
    // attestation path: user enabled a conditional-write mode on the store
    withConf("spark.graft.commit.assumeAtomicCreate", "true") {
      GraftTable.requireAtomicCreate("s3a")
    }
  }

  test("SQL catalog lifecycle over a mock: scheme warehouse") {
    val wh = "mock:" + tmpDir("graft-hfs-wh")
    spark.conf.set("spark.sql.catalog.mfs", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.mfs.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE mfs.db")
      spark.sql("CREATE TABLE mfs.db.t (a INT, b STRING) USING graft")
      spark.sql("INSERT INTO mfs.db.t VALUES (1, 'x'), (2, 'y')")
      assert(spark.sql("SELECT count(*) FROM mfs.db.t").head().getLong(0) === 2L)
      assert(spark.sql("SHOW TABLES IN mfs.db").count() === 1L)
      spark.sql("ALTER TABLE mfs.db.t ADD COLUMN c INT DEFAULT 3")
      assert(spark.sql("SELECT sum(c) FROM mfs.db.t").head().getLong(0) === 6L)
      spark.sql("DROP TABLE mfs.db.t")
      assert(spark.sql("SHOW TABLES IN mfs.db").count() === 0L)
    } finally {
      spark.conf.unset("spark.sql.catalog.mfs")
      spark.conf.unset("spark.sql.catalog.mfs.warehouse")
    }
  }

  test("CAS commit: concurrent unserialized writers on a lock-less scheme never lose an append") {
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    import spark.implicits._
    val loc = "mock:" + tmpDir("graft-cas") + "/tbl"
    GraftTable.create(spark, loc, schema)
    val writers = 6
    val rowsEach = 50
    val pool = Executors.newFixedThreadPool(writers)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = (0 until writers).map { w =>
        Future {
          // each writer poses as a separate PROCESS: no JVM monitor, no
          // OS lock (mock: has none anyway) — commit safety must come
          // entirely from the exclusive version claim + rebase
          GraftTable.simulateSeparateProcess.set(true)
          try {
            val t = GraftTable.open(spark, loc)
            t.append((0 until rowsEach).map(i => (w * rowsEach + i, s"w$w"))
              .toDF("id", "name").coalesce(1))
          } finally GraftTable.simulateSeparateProcess.set(false)
        }
      }
      Await.result(Future.sequence(futures), 180.seconds)
    } finally pool.shutdown()
    val t = GraftTable.open(spark, loc)
    // no lost update: every append's files and rows are in the final state
    assert(t.version === writers.toLong, "every append claimed its own version")
    assert(t.rowCountFromMetadata() === writers.toLong * rowsEach)
    assert(t.read().count() === writers.toLong * rowsEach)
    assert(t.read().select("id").distinct().count() === writers.toLong * rowsEach)
    val files = t.committedFiles
    assert(files.distinct.size === files.size)
    // the version log is contiguous and row counts strictly grow — each
    // rebase composed with (not clobbered) its predecessor
    val history = t.history()
    assert(history.map(_._1) === (0L to writers.toLong))
    assert(history.map(_._2) === (0 to writers).map(_.toLong * rowsEach))
    GraftTable.drop(loc)
  }

  test("a lagging meta pointer is healed by the version-log walk") {
    import spark.implicits._
    val loc = "mock:" + tmpDir("graft-lag") + "/tbl"
    val t = GraftTable.create(spark, loc, schema)
    t.append(Seq((1, "a")).toDF("id", "name"))
    t.append(Seq((2, "b")).toDF("id", "name"))
    val (fs, _) = GraftTable.fsAndPath(loc)
    // regress the pointer cache to v1 — what an out-of-order pointer
    // rename (or a crash between claim and pointer write) leaves behind
    val v1 = GraftTable.historyPath(loc, 1L)
    val stale = {
      val in = fs.open(v1)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val b = new Array[Byte](8192)
        var n = in.read(b)
        while (n >= 0) { buf.write(b, 0, n); n = in.read(b) }
        buf.toByteArray
      } finally in.close()
    }
    val out = fs.create(new org.apache.hadoop.fs.Path(loc, "_graft_meta.json"), true)
    try out.write(stale) finally out.close()
    // the log, not the pointer, is the truth: readers walk to the head
    val reopened = GraftTable.open(spark, loc)
    assert(reopened.version === 2L, "reader must walk past the lagging pointer")
    assert(reopened.read().count() === 2L)
    // and the next commit re-advances the pointer cache
    reopened.append(Seq((3, "c")).toDF("id", "name"))
    assert(GraftTable.open(spark, loc).version === 3L)
    GraftTable.drop(loc)
  }

  test("multi-change ALTER is all-or-nothing") {
    import spark.implicits._
    val loc = tmpDir("graft-alter-tx") + "/tbl"
    val t = GraftTable.create(spark, loc, schema)
    t.append(Seq((1, "a")).toDF("id", "name"))
    // second change fails validation (narrowing cast) -> first must not stick
    intercept[IllegalArgumentException] {
      t.alterAll(Seq(
        GraftTable.AddCol("ok", IntegerType, 1),
        GraftTable.AlterColType("name", IntegerType)))
    }
    val reopened = GraftTable.open(spark, loc)
    assert(!reopened.schema.fieldNames.contains("ok"),
      "failed multi-change ALTER must leave no partial changes")
    GraftTable.drop(loc)
  }
}
