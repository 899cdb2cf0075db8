package graft.storage

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** RESTORE — rollback to a retained snapshot as a NEW commit (never a
  * history rewrite). The reference keeps exactly one footer version, so
  * its only rollback is PG transaction abort; here the snapshot archive
  * makes any retained state one commit away, and the pre-restore states
  * stay time-travelable afterwards. */
class RestoreSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType), StructField("v", StringType)))

  private def mk(prefix: String): GraftTable = {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir(prefix) + "/t", schema)
    for (base <- Seq(0, 100, 200))
      t.append((base until base + 10).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    t
  }

  test("restore rolls content back; history keeps the pre-restore states") {
    val t = mk("restore-basic")
    assert(t.version === 3L)
    val v = t.restore(1L)
    assert(v === 4L)
    assert(t.read().count() === 10L)
    assert(t.read().agg(max("id")).head().getInt(0) === 9)
    // nothing was rewritten: the newer snapshots still read
    assert(t.readVersion(3).count() === 30L)
    assert(t.readVersion(2).count() === 20L)
    // restore of a restore: forward again
    t.restore(3L)
    assert(t.read().count() === 30L)
    // and the post-restore append gets a FRESH batch id (no collision
    // with the files written after the snapshot)
    import spark.implicits._
    t.append(Seq((900, "v900")).toDF("id", "v"))
    assert(t.read().count() === 31L)
    assert(t.read().filter(col("id") === 900).count() === 1L)
    GraftTable.drop(t.location)
  }

  test("restore across schema evolution reverts the schema") {
    val t = mk("restore-schema")
    t.addColumn("flag", IntegerType, default = 7)
    assert(t.read().schema.fieldNames.toSeq === Seq("id", "v", "flag"))
    t.restore(3L)
    assert(t.read().schema.fieldNames.toSeq === Seq("id", "v"))
    // old-schema appends work again
    import spark.implicits._
    t.append(Seq((901, "v901")).toDF("id", "v"))
    assert(t.read().count() === 31L)
    GraftTable.drop(t.location)
  }

  test("pure append rollback is NOT a change commit; undoing a delete is") {
    val t = mk("restore-stream")
    // v4: rollback of appends only — snapshot files ⊆ current files
    t.restore(2L)
    assert(!GraftTable.readHistoryMeta(t.location, t.version).changeCommit,
      "a pure append rollback must stay an ordinary commit")
    // v5: a COW delete removes rows; v6: restore resurrects them
    t.delete(Seq(org.apache.spark.sql.sources.LessThan("id", 5)))
    assert(t.read().count() === 15L)
    t.restore(2L)
    assert(t.read().count() === 20L)
    assert(GraftTable.readHistoryMeta(t.location, t.version).changeCommit,
      "re-introducing removed files must mark a change commit")
    GraftTable.drop(t.location)
  }

  test("restore rolls a deletion vector back and marks a change commit") {
    val t = mk("restore-dv")
    val vBefore = t.version
    t.deleteMor(Seq(org.apache.spark.sql.sources.LessThan("id", 3)))
    assert(t.read().count() === 27L)
    assert(t.dvEntries.nonEmpty)
    t.restore(vBefore)
    assert(t.read().count() === 30L)
    assert(t.dvEntries.isEmpty)
    assert(GraftTable.readHistoryMeta(t.location, t.version).changeCommit,
      "rolling a deletion vector back resurrects rows = change commit")
    GraftTable.drop(t.location)
  }

  test("equal-cardinality but different-position vectors still mark a change commit") {
    val t = mk("restore-dv-pos")
    val v1 = t.version
    t.deleteMor(Seq(org.apache.spark.sql.sources.In("id", Array(0, 1)))) // v4: {0,1}
    val vA = t.version
    t.restore(v1)                                                        // v5: no dv
    t.deleteMor(Seq(org.apache.spark.sql.sources.In("id", Array(5, 6)))) // v6: {5,6}
    // restore to vA: same dv CARDINALITY (2) on the same file, different
    // positions — rows 5 and 6 resurrect, rows 0 and 1 disappear; a
    // cardinality-only test would miss this
    t.restore(vA)
    assert(GraftTable.readHistoryMeta(t.location, t.version).changeCommit,
      "restoring across equal-cardinality vectors must mark a change commit")
    assert(t.read().filter(col("id").isin(5, 6)).count() === 2L)
    assert(t.read().filter(col("id").isin(0, 1)).count() === 0L)
    GraftTable.drop(t.location)
  }

  test("restore refuses never-committed and expired snapshots") {
    val t = mk("restore-refuse")
    intercept[IllegalArgumentException] { t.restore(99L) }
    t.expireHistory(1)
    t.vacuum()
    // v1/v2 metadata is gone entirely — unreadable, hence unrestorable
    intercept[Exception] { t.restore(1L) }
    assert(t.read().count() === 30L)
    GraftTable.drop(t.location)
  }

  test("SQL CALL graft.system.restore") {
    val wh = tmpDir("restore-sql")
    spark.conf.set("spark.sql.catalog.gr", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gr.warehouse", wh)
    try {
      spark.sql("CREATE TABLE gr.db.rt (id INT, v STRING) USING graft")
      spark.sql("INSERT INTO gr.db.rt VALUES (1, 'a'), (2, 'b')")
      spark.sql("INSERT INTO gr.db.rt VALUES (3, 'c')")
      assert(spark.table("gr.db.rt").count() === 3L)
      val res = spark.sql("CALL gr.system.restore('db.rt', 1)").collect()
      assert(res.head.getString(1) === "version_after_restore")
      assert(spark.table("gr.db.rt").count() === 2L)
      // the rolled-back state is still one restore away
      spark.sql("CALL gr.system.restore('db.rt', 2)")
      assert(spark.table("gr.db.rt").count() === 3L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS gr.db.rt")
      spark.conf.unset("spark.sql.catalog.gr")
    }
  }
}
