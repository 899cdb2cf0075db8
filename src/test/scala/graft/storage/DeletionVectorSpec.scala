package graft.storage

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Merge-on-read DELETE via deletion vectors ([[DeletionVectors]],
  * [[GraftTable.deleteMor]]). The contract: a sparse delete touches NO
  * data file (sidecars only), every read path — Scala, SQL/DSv2,
  * snapshots, CDF, COW rewrites, compaction — serves rows net of the
  * vectors, a dense delete falls back to rewriting exactly the dense
  * files, and maintenance (compact / UPDATE / recluster) materializes
  * vectors away. */
class DeletionVectorSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("grp", StringType),
    StructField("v", IntegerType)))

  /** Three files with disjoint id ranges (0-49, 100-149, 200-249). */
  private def mk(prefix: String, opts: GraftTableOptions = GraftTableOptions()): GraftTable = {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir(prefix) + "/t", schema, opts)
    for (base <- Seq(0, 100, 200))
      t.append((base until base + 50)
        .map(i => (i, if (i % 2 == 0) "even" else "odd", i * 10))
        .toDF("id", "grp", "v").coalesce(1))
    t
  }

  test("sidecar round-trip + merge") {
    val (fs, _) = {
      val d = tmpDir("dv-io")
      (new org.apache.hadoop.fs.Path(d).getFileSystem(
        new org.apache.hadoop.conf.Configuration()), d)
    }
    val dir = tmpDir("dv-io2")
    DeletionVectors.write(fs, s"$dir/a.dv", Array(1L, 5L, 9L))
    assert(DeletionVectors.read(fs, s"$dir/a.dv").toSeq === Seq(1L, 5L, 9L))
    assert(DeletionVectors.merge(Array(1L, 5L), Array(2L, 5L, 9L)).toSeq ===
      Seq(1L, 2L, 5L, 9L))
    assert(DeletionVectors.contains(Array(1L, 5L, 9L), 5L))
    assert(!DeletionVectors.contains(Array(1L, 5L, 9L), 4L))
  }

  test("sparse delete: no data file touched, reads exact, rowCount net") {
    val t = mk("dv-sparse")
    val filesBefore = t.committedFiles.toSet
    // delete 5 scattered rows per zone-refutable range — the middle
    // file only (ids 100..149); sparse (5/50 = 10%)
    val deleted = t.deleteMor(Seq(In("id", Array(100, 111, 122, 133, 144))))
    assert(deleted === 5L)
    assert(t.committedFiles.toSet === filesBefore,
      "a sparse MOR delete must not rewrite or add any data file")
    assert(t.dvEntries.size === 1, "exactly the hit file carries a vector")
    assert(t.dvEntries.values.head.card === 5L)
    assert(t.rowCountFromMetadata() === 145L)
    val got = t.read().agg(count(lit(1)), sum("v")).collect().head
    assert(got.getLong(0) === 145L)
    val expectedSum = (0 until 50).map(_ * 10).sum.toLong +
      (100 until 150).filterNot(Seq(100, 111, 122, 133, 144).contains).map(_ * 10).sum +
      (200 until 250).map(_ * 10).sum
    assert(got.getLong(1) === expectedSum)
    // filters over the vectored file still work (and still push down)
    assert(t.read().filter(col("id") === 111).count() === 0L)
    assert(t.read().filter(col("id") === 112).count() === 1L)
  }

  test("second delete on the same file unions the vector") {
    val t = mk("dv-union")
    assert(t.deleteMor(Seq(In("id", Array(100, 101)))) === 2L)
    val firstDv = t.dvEntries.values.head.path
    assert(t.deleteMor(Seq(In("id", Array(102, 103)))) === 2L)
    val e = t.dvEntries.values.head
    assert(e.path !== firstDv, "vectors are immutable; a union is a new sidecar")
    assert(e.card === 4L)
    assert(t.read().filter(col("id").between(100, 103)).count() === 0L)
    assert(t.rowCountFromMetadata() === 146L)
    // deleting an already-dead row is a no-op, not a double count
    assert(t.deleteMor(Seq(In("id", Array(100)))) === 0L)
    assert(t.rowCountFromMetadata() === 146L)
  }

  test("dense delete rewrites exactly the dense files in the same commit") {
    val t = mk("dv-dense")
    val filesBefore = t.committedFiles.toSet
    // middle file loses 40/50 rows (dense); last file loses 2/50 (sparse)
    val deleted = t.deleteMor(Seq(Or(
      And(GreaterThanOrEqual("id", 100), LessThan("id", 140)),
      In("id", Array(200, 201)))))
    assert(deleted === 42L)
    assert(t.rowCountFromMetadata() === 108L)
    val after = t.committedFiles.toSet
    assert(after.size === 3)
    assert((filesBefore -- after).size === 1, "only the dense file was swapped")
    assert(t.dvEntries.size === 1, "the sparse file carries a vector; the dense one is gone")
    assert(t.read().count() === 108L)
    assert(t.read().filter(col("id").between(140, 149)).count() === 10L)
    // a fully-deleted file leaves the list entirely
    val t2 = mk("dv-dense2")
    assert(t2.deleteMor(Seq(And(GreaterThanOrEqual("id", 100), LessThan("id", 150)))) === 50L)
    assert(t2.committedFiles.size === 2)
    assert(t2.dvEntries.isEmpty)
  }

  test("SQL reads (DSv2 catalog) serve rows net of vectors; agg pushdown refused") {
    val wh = tmpDir("dv-wh")
    spark.conf.set("spark.sql.catalog.dvc", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.dvc.warehouse", wh)
    try {
      spark.sql("CREATE TABLE dvc.db.t (id INT, grp STRING, v INT) USING graft " +
        "OPTIONS (delete_mode 'merge-on-read')")
      spark.sql("INSERT INTO dvc.db.t SELECT id, concat('g', id % 3), id * 10 " +
        "FROM range(1000)")
      val t = GraftTable.open(spark, s"$wh/db/t")
      assert(t.options.deleteMode === "merge-on-read")
      val filesBefore = t.committedFiles.toSet
      // SQL DELETE routes through the deletion-vector path
      spark.sql("DELETE FROM dvc.db.t WHERE id IN (7, 77, 777)")
      val t2 = GraftTable.open(spark, s"$wh/db/t")
      assert(t2.committedFiles.toSet === filesBefore,
        "delete_mode=merge-on-read SQL DELETE must not rewrite data files")
      assert(t2.dvEntries.nonEmpty)
      // count(*), filters, and aggregates all net of the vector
      assert(spark.sql("SELECT count(*) FROM dvc.db.t").collect().head.getLong(0) === 997L)
      assert(spark.sql("SELECT count(*) FROM dvc.db.t WHERE id = 77").collect()
        .head.getLong(0) === 0L)
      assert(spark.sql("SELECT sum(v) FROM dvc.db.t").collect().head.getLong(0) ===
        (0L until 1000L).filterNot(Seq(7L, 77L, 777L).contains).map(_ * 10).sum)
      // group-by over the vectored scan
      val grp = spark.sql(
        "SELECT grp, count(*) c FROM dvc.db.t GROUP BY grp ORDER BY grp")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(grp.values.sum === 997L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS dvc.db.t")
      spark.conf.unset("spark.sql.catalog.dvc")
      spark.conf.unset("spark.sql.catalog.dvc.warehouse")
    }
  }

  test("time travel: pre-delete snapshot serves the dead rows; post-delete applies them") {
    val t = mk("dv-tt")
    val vBefore = t.version
    t.deleteMor(Seq(In("id", Array(0, 2, 4))))
    val vAfter = t.version
    assert(t.readVersion(vBefore).count() === 150L)
    assert(t.readVersion(vBefore).filter(col("id") === 2).count() === 1L)
    assert(t.readVersion(vAfter).count() === 147L)
    assert(t.readVersion(vAfter).filter(col("id") === 2).count() === 0L)
  }

  test("change feed: a DV commit emits exactly its deleted rows") {
    val t = mk("dv-cdf")
    val v0 = t.version
    t.deleteMor(Seq(In("id", Array(101, 103))))
    val v1 = t.version
    val diff = t.changes(v0, v1).collect()
    assert(diff.length === 2)
    assert(diff.forall(_.getAs[String]("_change_type") == "delete"))
    assert(diff.map(_.getAs[Int]("id")).toSet === Set(101, 103))
    assert(diff.forall(_.getAs[Long]("_commit_version") == v1))
  }

  test("COW UPDATE / SQL DML over a vectored file materializes, never resurrects") {
    val t = mk("dv-cow")
    t.deleteMor(Seq(In("id", Array(100, 102))))
    assert(t.dvEntries.size === 1)
    // Scala UPDATE rewrites the vectored file: dead rows must stay dead
    val updated = t.update(Map("v" -> lit(-1)),
      Seq(And(GreaterThanOrEqual("id", 100), LessThan("id", 150))))
    assert(updated === 48L, "only live rows update")
    assert(t.dvEntries.isEmpty, "the rewrite materialized the vector")
    assert(t.read().filter(col("id") === 100).count() === 0L)
    assert(t.read().filter(col("v") === -1).count() === 48L)
    assert(t.rowCountFromMetadata() === 148L)
  }

  test("merge over vectored candidates: dead keys insert, not update") {
    import spark.implicits._
    val t = mk("dv-merge")
    t.deleteMor(Seq(In("id", Array(100))))
    // source hits the dead key 100 and the live key 101
    val src = Seq((100, "new", 1), (101, "new", 2)).toDF("id", "grp", "v")
    val (updated, inserted) = t.merge(src, Seq("id"))
    assert(updated === 1L, "dead row 100 must not count as a match")
    assert(inserted === 1L, "dead key inserts as a new row")
    assert(t.dvEntries.isEmpty, "the candidate rewrite materialized the vector")
    assert(t.read().filter(col("id") === 100).count() === 1L)
    assert(t.read().filter(col("id") === 100).select("grp").head.getString(0) === "new")
    assert(t.rowCountFromMetadata() === 150L) // 150 - 1 dead + 1 insert
  }

  test("compact + compactSmall materialize vectors; counts conserve") {
    val t = mk("dv-compact")
    t.deleteMor(Seq(In("id", Array(1, 3, 5, 101, 103))))
    assert(t.rowCountFromMetadata() === 145L)
    t.compact()
    assert(t.dvEntries.isEmpty)
    assert(t.read().count() === 145L)
    assert(t.read().filter(col("id").isin(1, 3, 5, 101, 103)).count() === 0L)
    val t2 = mk("dv-compact-small")
    t2.deleteMor(Seq(In("id", Array(0, 100, 200))))
    assert(t2.compactSmall(smallBytes = 10L << 20) === 3)
    assert(t2.dvEntries.isEmpty)
    assert(t2.read().count() === 147L)
  }

  test("vacuum honors snapshot retention for sidecars; expiry reclaims them") {
    val t = mk("dv-vac")
    t.deleteMor(Seq(In("id", Array(100, 101))))
    val dv1 = s"${t.location}/${t.dvEntries.values.head.path}"
    t.deleteMor(Seq(In("id", Array(102))))
    val dv2 = s"${t.location}/${t.dvEntries.values.head.path}"
    val (fs, _) = {
      val p = new org.apache.hadoop.fs.Path(t.location)
      (p.getFileSystem(new org.apache.hadoop.conf.Configuration()), p)
    }
    assert(fs.exists(new org.apache.hadoop.fs.Path(dv1)))
    assert(fs.exists(new org.apache.hadoop.fs.Path(dv2)))
    // both sidecars are snapshot-referenced: vacuum must keep them
    t.vacuum()
    assert(fs.exists(new org.apache.hadoop.fs.Path(dv1)),
      "a sidecar referenced by a retained snapshot survives vacuum")
    assert(fs.exists(new org.apache.hadoop.fs.Path(dv2)))
    // live reads still work after vacuum
    assert(t.read().count() === 147L)
  }

  test("clone carries vectors; recluster materializes them") {
    val t = mk("dv-clone")
    t.deleteMor(Seq(In("id", Array(100, 110, 120))))
    val c = t.cloneTo(tmpDir("dv-clone-dst") + "/t")
    assert(c.rowCountFromMetadata() === 147L)
    assert(c.read().count() === 147L)
    assert(c.dvEntries.size === 1)
    assert(c.read().filter(col("id") === 110).count() === 0L)
    // recluster = full rewrite under new clustering: vectors materialize
    c.recluster(sortBy = Seq("id"))
    assert(c.dvEntries.isEmpty)
    assert(c.read().count() === 147L)
    // the source is untouched
    assert(t.read().count() === 147L)
  }

  test("bucketed table: vectored reads stay correct (SPJ layout)") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir("dv-bkt") + "/t", schema,
      GraftTableOptions(bucketBy = Seq("id"), bucketCount = 4))
    t.append((0 until 200).map(i => (i, s"g${i % 3}", i * 10)).toDF("id", "grp", "v"))
    assert(t.deleteMor(Seq(In("id", Array(5, 15, 25, 35)))) === 4L)
    assert(t.read().count() === 196L)
    assert(t.read().filter(col("id") === 15).count() === 0L)
    assert(t.rowCountFromMetadata() === 196L)
  }

  test("fresh stream's initial load serves the snapshot NET of deletion vectors") {
    import spark.implicits._
    val t = mk("dv-stream-init")                       // v1..v3: appends, 150 rows
    t.deleteMor(Seq(In("id", Array(100, 205))))        // v4: vectors only
    t.expireHistory(1)                                 // oldest retained = v4
    t.append(Seq((300, "even", 3000)).toDF("id", "grp", "v")) // v5
    val out = spark.readStream.format("graft").option("path", t.location).load()
    val q = out.writeStream.format("memory").queryName("dv_init_q")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000L)
    val got = spark.table("dv_init_q")
    // the initial load is the v4 STATE (148 live rows), not the raw
    // files — merge-on-read-deleted rows must not resurrect for a
    // fresh consumer; the later append still arrives as its own batch
    assert(got.count() === 149L)
    assert(got.filter(col("id").isin(100, 205)).count() === 0L,
      "vectored-out rows leaked into the initial load")
    assert(got.filter(col("id") === 300).count() === 1L)
    spark.sql("DROP TABLE IF EXISTS dv_init_q")
  }

  test("streaming source skips DV commits (append-log contract)") {
    val t = mk("dv-stream")
    t.deleteMor(Seq(In("id", Array(100))))
    import spark.implicits._
    t.append(Seq((300, "even", 3000)).toDF("id", "grp", "v"))
    // an AvailableNow drain over the whole history delivers the three
    // appends + the late append, never a partial file for the DV commit
    val out = spark.readStream.format("graft").option("path", t.location).load()
    val q = out.writeStream.format("memory").queryName("dv_stream_q")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000L)
    val got = spark.table("dv_stream_q").count()
    // append-log semantics: the stream re-delivers the ORIGINAL appends
    // (151 rows incl. the later-deleted one) — deletes are not replayed
    assert(got === 151L)
    spark.sql("DROP TABLE IF EXISTS dv_stream_q")
  }

  test("merge-on-read UPDATE: sidecars + appended new versions, no file rewritten") {
    val t = mk("dv-upd")
    val filesBefore = t.committedFiles.toSet
    val v0 = t.version
    val updated = t.updateMor(Map("v" -> lit(-5)),
      Seq(In("id", Array(100, 110, 205))))
    assert(updated === 3L)
    assert(filesBefore.subsetOf(t.committedFiles.toSet),
      "MOR UPDATE must not rewrite or drop any existing file")
    assert(t.committedFiles.size > filesBefore.size, "new versions append")
    assert(t.dvEntries.size === 2, "old versions die into their files' sidecars")
    assert(t.rowCountFromMetadata() === 150L)
    assert(t.read().count() === 150L)
    assert(t.read().filter(col("v") === -5).count() === 3L)
    assert(t.read().filter(col("id") === 110).select("v").head.getInt(0) === -5)
    // the CDF reads the commit as exactly delete(old) + insert(new)
    val diff = t.changes(v0, t.version).collect()
    assert(diff.count(_.getAs[String]("_change_type") == "delete") === 3)
    assert(diff.count(_.getAs[String]("_change_type") == "insert") === 3)
    assert(diff.filter(_.getAs[String]("_change_type") == "insert")
      .forall(_.getAs[Int]("v") == -5))
    // time travel pre-update; compaction materializes everything
    assert(t.readVersion(v0).filter(col("id") === 110).select("v")
      .head.getInt(0) === 1100)
    t.compact()
    assert(t.dvEntries.isEmpty)
    assert(t.read().count() === 150L)
    assert(t.read().filter(col("v") === -5).count() === 3L)
  }

  test("merge-on-read UPDATE then MOR DELETE compose on the same files") {
    val t = mk("dv-updel")
    assert(t.updateMor(Map("grp" -> lit("hot")), Seq(In("id", Array(100, 102)))) === 2L)
    assert(t.deleteMor(Seq(EqualTo("grp", "hot"))) === 2L)
    assert(t.read().count() === 148L)
    assert(t.read().filter(col("grp") === "hot").count() === 0L)
    assert(t.read().filter(col("id").isin(100, 102)).count() === 0L)
    assert(t.rowCountFromMetadata() === 148L)
  }

  test("SQL UPDATE/MERGE through ReplaceData reads groups net of vectors") {
    // a COPY-ON-WRITE table carrying vectors (deleteMor is mode-agnostic
    // on the Scala API): its SQL DML takes the group-based ReplaceData
    // path, which must read net of the vectors and materialize them —
    // merge-on-read tables route to the delta path instead (SqlMorDmlSpec)
    val wh = tmpDir("dv-wh2")
    spark.conf.set("spark.sql.catalog.dvd", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.dvd.warehouse", wh)
    try {
      spark.sql("CREATE TABLE dvd.db.t (id INT, v INT) USING graft")
      spark.sql("INSERT INTO dvd.db.t SELECT id, id * 10 FROM range(100)")
      GraftTable.open(spark, s"$wh/db/t")
        .deleteMor(Seq(In("id", Array(10, 20, 30))))
      assert(GraftTable.open(spark, s"$wh/db/t").dvEntries.nonEmpty)
      // SQL UPDATE rewrites the vectored group: dead rows must stay dead
      spark.sql("UPDATE dvd.db.t SET v = -1 WHERE id < 50")
      val t = GraftTable.open(spark, s"$wh/db/t")
      assert(t.dvEntries.isEmpty, "the COW rewrite materialized the vector")
      assert(spark.sql("SELECT count(*) FROM dvd.db.t").head.getLong(0) === 97L)
      assert(spark.sql("SELECT count(*) FROM dvd.db.t WHERE id = 20").head.getLong(0) === 0L)
      assert(spark.sql("SELECT count(*) FROM dvd.db.t WHERE v = -1").head.getLong(0) === 47L)
      // MERGE over a fresh vector: the dead key must take the
      // not-matched (insert) branch
      spark.sql("DELETE FROM dvd.db.t WHERE id = 60")
      spark.sql("MERGE INTO dvd.db.t USING (SELECT 60 id, 999 v) s ON dvd.db.t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
      assert(spark.sql("SELECT v FROM dvd.db.t WHERE id = 60").collect()
        .map(_.getInt(0)).toSeq === Seq(999))
      assert(spark.sql("SELECT count(*) FROM dvd.db.t").head.getLong(0) === 97L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS dvd.db.t")
      spark.conf.unset("spark.sql.catalog.dvd")
      spark.conf.unset("spark.sql.catalog.dvd.warehouse")
    }
  }

  test("materializeVectors rewrites only the heavily-vectored files") {
    val t = mk("dv-mat")
    // middle file: 20/50 dead (40%); last file: 2/50 dead (4%)
    t.deleteMor(Seq(In("id", (100 until 120).toArray ++ Array(200, 201))))
    assert(t.dvEntries.size === 2)
    val before = t.committedFiles.toSet
    assert(t.materializeVectors(minDeadRatio = 0.1) === 1)
    val after = t.committedFiles.toSet
    assert((before -- after).size === 1, "only the 40%-dead file was rewritten")
    assert(t.dvEntries.size === 1, "the sparse vector stays")
    assert(t.read().count() === 128L)
    assert(t.rowCountFromMetadata() === 128L)
    // ratio 0 sweeps the rest
    assert(t.materializeVectors(minDeadRatio = 0.0) === 1)
    assert(t.dvEntries.isEmpty)
    assert(t.read().count() === 128L)
    assert(t.verify(deep = true) === Seq.empty)
  }

  test("delete_mode option validates and ALTERs") {
    val t = mk("dv-mode")
    intercept[IllegalArgumentException] {
      GraftTable.create(spark, tmpDir("dv-bad") + "/t", schema,
        GraftTableOptions(deleteMode = "sideways"))
    }
    t.setOptions(Map("delete_mode" -> "merge-on-read"))
    assert(GraftTable.open(spark, t.location).options.deleteMode === "merge-on-read")
  }
}
