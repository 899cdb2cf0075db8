package graft.storage

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Snapshot (time-travel) reads: every metadata commit archives its
  * state, data files are immutable once committed, so any retained
  * version reads back exactly as it was — across appends, schema
  * evolution, and compaction — until expireHistory + vacuum reclaim it.
  * Beyond the reference (one footer version); the retention contract is
  * the Delta/Iceberg one. */
class TimeTravelSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType), StructField("v", StringType)))

  private def mk(prefix: String): GraftTable = {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir(prefix) + "/t", schema)
    for (base <- Seq(0, 100, 200))
      t.append((base until base + 10).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    t
  }

  test("each append is a readable snapshot; history lists them") {
    val t = mk("tt-basic")
    assert(t.version === 3L) // create=0, three appends
    assert(t.history().map(x => (x._1, x._2)) ===
      Seq((0L, 0L), (1L, 10L), (2L, 20L), (3L, 30L)))
    assert(t.readVersion(0).count() === 0L)
    assert(t.readVersion(1).count() === 10L)
    assert(t.readVersion(2).count() === 20L)
    assert(t.readVersion(3).count() === 30L)
    // v2's CONTENT is the first two appends exactly
    assert(t.readVersion(2).agg(max("id")).head().getInt(0) === 109)
    // current read == newest snapshot
    assert(t.read().exceptAll(t.readVersion(3)).isEmpty)
    intercept[IllegalArgumentException] { t.readVersion(99) }
    GraftTable.drop(t.location)
  }

  test("DataFrameReader time travel: versionAsOf / timestampAsOf options") {
    val t = mk("tt-reader")
    t.addColumn("flag", IntegerType, default = 7)
    val v1 = spark.read.format("graft").option("versionAsOf", 1)
      .load(t.location)
    assert(v1.count() === 10L)
    assert(v1.schema.fieldNames.toSeq === Seq("id", "v"),
      "the snapshot's schema predates the ALTER")
    // a timestamp after the newest commit resolves to the head version
    val now = new java.sql.Timestamp(System.currentTimeMillis() + 60000L).toString
    val head = spark.read.format("graft").option("timestampAsOf", now)
      .load(t.location)
    assert(head.count() === 30L)
    assert(head.schema.fieldNames.contains("flag"))
    intercept[Exception] {
      spark.read.format("graft").option("versionAsOf", 1)
        .option("timestampAsOf", now).load(t.location).count()
    }
    GraftTable.drop(t.location)
  }

  test("age-based expiry: young snapshots survive, old ones expire") {
    val t = mk("tt-age")
    assert(t.expireHistoryOlderThan(3600L * 1000) === 0, "everything is young")
    assert(t.history().size === 4)
    Thread.sleep(20) // ensure every archive mtime is strictly in the past
    val n = t.expireHistoryOlderThan(0L)
    assert(n === 3, "all but the newest snapshot expire at zero retention")
    assert(t.history().map(_._1) === Seq(3L))
    assert(t.read().count() === 30L)
    GraftTable.drop(t.location)
  }

  test("snapshots survive schema evolution and compaction") {
    val t = mk("tt-evolve")
    t.addColumn("flag", IntegerType, default = 7)
    val vAfterAlter = t.version
    t.compact()
    // the pre-ALTER snapshot still has the OLD schema
    assert(t.readVersion(3).schema.fieldNames.toSeq === Seq("id", "v"))
    // the post-ALTER snapshot synthesizes the default, like current
    assert(t.readVersion(vAfterAlter).select("flag").distinct().head().getInt(0) === 7)
    // pre-compaction snapshots read the ORIGINAL files (compact only
    // adds new ones; vacuum is what reclaims)
    assert(t.readVersion(3).count() === 30L)
    assert(t.read().count() === 30L)
    GraftTable.drop(t.location)
  }

  test("vacuum keeps snapshot files until expireHistory; then reclaims") {
    val t = mk("tt-retain")
    t.compact() // current no longer references the three append dirs
    assert(t.vacuum() === 0, "snapshots still reference the old batch dirs")
    assert(t.readVersion(2).count() === 20L)
    val expired = t.expireHistory(keepLast = 1)
    assert(expired > 0)
    withConf("spark.graft.commit.claimGraceMs", "-1") {
      assert(t.vacuum() > 0, "expired snapshot files become reclaimable")
    }
    // the expired snapshot is gone; the retained one still reads
    intercept[IllegalArgumentException] { t.readVersion(2) }
    assert(t.read().count() === 30L)
    GraftTable.drop(t.location)
  }

  test("expireHistory refreshes a lagging pointer — no hole strands readers") {
    val t = mk("tt-lagptr") // v0..v3
    val loc = t.location
    // Simulate a LAGGING pointer (pointer writes are best-effort and
    // swallowed on failure): put the v1 snapshot's content back into
    // the pointer file. Without the pointer refresh inside
    // expireHistory, expiry would delete v1/v2 and a fresh reader
    // would walk v1 -> (v2 missing) and silently regress to v1.
    val dir = new org.apache.hadoop.fs.Path(loc).toUri.getPath
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(dir, "_graft_history", f"v${1L}%020d.json"),
      java.nio.file.Paths.get(dir, "_graft_meta.json"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    assert(t.expireHistory(keepLast = 1) > 0)
    val fresh = GraftTable.open(spark, loc)
    assert(fresh.version === 3L, "reader must see the head, not the stale pointer")
    assert(fresh.read().count() === 30L)
    GraftTable.drop(loc)
  }

  test("a stale writer cannot re-claim an expired version (log fork guard)") {
    import spark.implicits._
    val loc = tmpDir("tt-fork") + "/t"
    val t0 = GraftTable.create(spark, loc, schema)
    t0.append(Seq((1, "a")).toDF("id", "v")) // v1
    val stale = GraftTable.open(spark, loc) // separate instance, holds v1
    for (i <- 2 to 4) t0.append(Seq((i, s"b$i")).toDF("id", "v")) // v2..v4
    assert(t0.expireHistory(keepLast = 1) > 0) // v1..v3 gone, pointer at v4
    // the stale writer's first claim targets v2 — an EXPIRED number.
    // Exclusive create would succeed into the hole; the fork guard must
    // release it and rebase onto the real head instead of forking the
    // log below the pointer (which would drop v3/v4's rows).
    stale.append(Seq((99, "z")).toDF("id", "v"))
    val fresh = GraftTable.open(spark, loc)
    assert(fresh.version === 5L)
    assert(fresh.read().count() === 5L, "no committed row may be lost")
    GraftTable.drop(loc)
  }

  test("SQL VERSION AS OF / TIMESTAMP AS OF through the catalog") {
    val wh = tmpDir("tt-sql-wh")
    spark.conf.set("spark.sql.catalog.ttcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ttcat.warehouse", wh)
    try {
      spark.sql("CREATE TABLE ttcat.db.t (id INT, v STRING) USING graft")
      for (i <- 1 to 3)
        spark.sql(s"INSERT INTO ttcat.db.t VALUES ($i, 'v$i')")
      assert(spark.sql("SELECT * FROM ttcat.db.t VERSION AS OF 1").count() === 1L)
      assert(spark.sql("SELECT * FROM ttcat.db.t VERSION AS OF 2").count() === 2L)
      assert(spark.table("ttcat.db.t").count() === 3L)
      // the snapshot's content is exactly the prefix of inserts
      assert(spark.sql("SELECT max(id) FROM ttcat.db.t VERSION AS OF 2")
        .head().getInt(0) === 2)
      // TIMESTAMP AS OF now = the newest snapshot
      assert(spark.sql(
        "SELECT count(*) FROM ttcat.db.t TIMESTAMP AS OF current_timestamp()")
        .head().getLong(0) === 3L)
      // a snapshot table rejects writes
      val ex = intercept[Exception](
        spark.sql("INSERT INTO ttcat.db.t VERSION AS OF 1 VALUES (9, 'x')"))
      assert(ex.getMessage != null)
      // SQL read of a reclaimed snapshot fails with the clear error,
      // not a parquet FileNotFound mid-scan
      val t = GraftTable.open(spark,
        spark.conf.get("spark.sql.catalog.ttcat.warehouse") + "/db/t")
      t.truncate()
      val ex2 = intercept[Exception](
        spark.sql("SELECT * FROM ttcat.db.t VERSION AS OF 2").collect())
      assert(ex2.getMessage.contains("reclaimed"), ex2.getMessage)
    } finally {
      spark.sql("DROP TABLE IF EXISTS ttcat.db.t")
      spark.conf.unset("spark.sql.catalog.ttcat")
      spark.conf.unset("spark.sql.catalog.ttcat.warehouse")
    }
  }

  test("a crashed commit's partial claim is invisible, and a stale one is reclaimed") {
    import org.apache.spark.sql.functions.lit
    val t = mk("tt-orphan")
    // simulate the crash window of the CAS protocol: version claimed
    // (file created) but content never finished — an unparseable
    // partial file at v(n+1)
    val headV = t.version
    val orphanV = headV + 1
    val (fs, _) = GraftTable.fsAndPath(t.location)
    val partial = GraftTable.historyPath(t.location, orphanV)
    val out = fs.create(partial, false)
    try out.write("""{"graft_magic": "graft_cst""".getBytes("UTF-8"))
    finally out.close()
    // not committed: invisible to history, unreadable, not a timestamp target
    assert(t.history().map(_._1).max === headV,
      "a partial claim must not be listed as committed")
    intercept[Exception] { t.readVersion(orphanV) }
    assert(GraftTable.versionAsOfTimestamp(t.location,
      System.currentTimeMillis() + 60000) === headV)
    // a FRESH partial claim is never reclaimed (it may be a live commit
    // mid-write — the janitor only touches STALE unparseable files);
    // once stale, it is a crashed writer's residue: the janitor
    // reclaims it and the commit proceeds
    fs.setTimes(partial, System.currentTimeMillis() - 3600 * 1000L, -1)
    spark.conf.set("spark.graft.commit.claimGraceMs", "60000")
    try {
      t.append(t.read().limit(1).withColumn("id", lit(777)))
      assert(t.version === orphanV, "the reclaimed version is used by the next commit")
      assert(t.read().filter("id = 777").count() === 1L)
    } finally spark.conf.unset("spark.graft.commit.claimGraceMs")
    GraftTable.drop(t.location)
  }

  test("truncate: pre-truncate snapshots stay listed (lineage) but are unreadable") {
    val t = mk("tt-trunc")
    t.truncate()
    assert(t.read().count() === 0L)
    // the archive survives as lineage — a stream at a pre-truncate
    // offset diffs through the truncate commit (files drop to zero)
    assert(t.history().map(_._1) === (0L to t.version))
    // but the DATA is physically gone: reading a pre-truncate snapshot
    // fails at the file-existence check with the reclaimed error
    val ex = intercept[IllegalStateException] { t.readVersion(1).count() }
    assert(ex.getMessage.contains("reclaimed"))
    // expireHistory cleans the dangling archives
    assert(t.expireHistory(keepLast = 1) === t.version.toInt)
    assert(t.history().map(_._1) === Seq(t.version))
    GraftTable.drop(t.location)
  }

  test("streaming source survives truncate: nothing re-delivered, appends resume") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val t = mk("tt-trunc-stream")
    val ckpt = tmpDir("tt-trunc-ckpt")
    val q = spark.readStream.format("graft").load(t.location)
      .writeStream.format("memory").queryName("tt_trunc_sink")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(spark.table("tt_trunc_sink").count() === 30L)
      t.truncate()
      q.processAllAvailable() // truncate commit: zero files added
      assert(spark.table("tt_trunc_sink").count() === 30L)
      t.append(Seq((900, "z")).toDF("id", "v"))
      q.processAllAvailable()
      assert(spark.table("tt_trunc_sink").count() === 31L,
        "post-truncate appends must stream")
    } finally q.stop()
    GraftTable.drop(t.location)
  }
}
