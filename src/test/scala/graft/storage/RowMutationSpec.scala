package graft.storage

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Row-level DELETE/UPDATE — copy-on-write at file granularity over
  * immutable columnar files (the reference lists UPDATE/DELETE as open
  * work, `TODO.md:25-28`). The contract under test: exact SQL
  * semantics (NULL predicates keep rows), zone-map pruning (files the
  * predicate cannot touch are not rewritten), snapshot isolation (time
  * travel reads the pre-mutation state), and clean interplay with
  * concurrent appends. */
class RowMutationSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("grp", StringType),
    StructField("v", IntegerType)))

  /** Three batches with disjoint id ranges → three files with disjoint
    * zone maps on id. */
  private def mk(prefix: String): GraftTable = {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir(prefix) + "/t", schema)
    for (base <- Seq(0, 100, 200))
      t.append((base until base + 50)
        .map(i => (i, if (i % 2 == 0) "even" else "odd", i * 10))
        .toDF("id", "grp", "v").coalesce(1))
    t
  }

  test("delete: exact rows, zone-map-pruned files untouched, count returned") {
    val t = mk("rmut-del")
    val filesBefore = t.committedFiles.toSet
    // ids 100..119 live ONLY in the middle file; the other two files'
    // zone maps refute the range and must survive UNREWRITTEN
    val deleted = t.delete(Seq(
      GreaterThanOrEqual("id", Integer.valueOf(100)),
      LessThan("id", Integer.valueOf(120))))
    assert(deleted === 20L)
    assert(t.rowCountFromMetadata() === 130L)
    assert(t.read().count() === 130L)
    assert(t.read().filter(col("id") >= 100 && col("id") < 120).count() === 0L)
    val filesAfter = t.committedFiles.toSet
    assert((filesBefore & filesAfter).size === 2,
      s"the two refuted files must be carried over untouched:\n$filesBefore\n$filesAfter")
    // deleting nothing is a no-op that keeps the file list identical
    assert(t.delete(Seq(EqualTo("id", Integer.valueOf(99999)))) === 0L)
    assert(t.committedFiles.toSet === filesAfter)
    GraftTable.drop(t.location)
  }

  test("delete: NULL predicate keeps the row (SQL semantics)") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir("rmut-null") + "/t", schema)
    t.append(Seq((1, null.asInstanceOf[String], 10), (2, "even", 20))
      .toDF("id", "grp", "v"))
    // grp = 'even' is NULL for row 1 — it must survive the delete
    assert(t.delete(Seq(EqualTo("grp", "even"))) === 1L)
    assert(t.read().collect().map(_.getInt(0)).toSeq === Seq(1))
    GraftTable.drop(t.location)
  }

  test("delete: time travel reads the pre-delete snapshot") {
    val t = mk("rmut-tt")
    val vBefore = t.version
    assert(t.delete(Seq(EqualTo("grp", "odd"))) === 75L)
    assert(t.read().count() === 75L)
    assert(t.readVersion(vBefore).count() === 150L)
    assert(t.readVersion(vBefore).filter(col("grp") === "odd").count() === 75L)
    GraftTable.drop(t.location)
  }

  test("update: assignments on matching rows only, self-referencing SET") {
    val t = mk("rmut-upd")
    val filesBefore = t.committedFiles.toSet
    // SET v = v + 1 WHERE 100 <= id < 120 — only the middle file rewrites
    val updated = t.update(Map("v" -> (col("v") + 1)), Seq(
      GreaterThanOrEqual("id", Integer.valueOf(100)),
      LessThan("id", Integer.valueOf(120))))
    assert(updated === 20L)
    assert(t.rowCountFromMetadata() === 150L, "UPDATE must not change row count")
    assert((filesBefore & t.committedFiles.toSet).size === 2,
      "refuted files must not be rewritten by UPDATE")
    val got = t.read().filter(col("id") === 105).head()
    assert(got.getInt(2) === 1051, "v = 105*10 + 1")
    assert(t.read().filter(col("id") === 5).head().getInt(2) === 50,
      "non-matching rows unchanged")
    // matched-row count of zero is a no-op
    assert(t.update(Map("v" -> lit(0)), Seq(EqualTo("id", Integer.valueOf(-1)))) === 0L)
    GraftTable.drop(t.location)
  }

  test("delete interleaves with a concurrent append (rebase carries it forward)") {
    import spark.implicits._
    val t = mk("rmut-conc")
    // a second handle appends AFTER this handle's refreshMeta would have
    // run — simulate by appending through a separate instance between
    // building the table and the delete; the delete's commit must carry
    // the appended file forward
    val other = GraftTable.open(spark, t.location)
    other.append(Seq((900, "nine", 9000)).toDF("id", "grp", "v"))
    assert(t.delete(Seq(EqualTo("grp", "even"))) === 75L)
    val remaining = t.read()
    assert(remaining.count() === 76L)
    assert(remaining.filter(col("id") === 900).count() === 1L,
      "the concurrently appended row must survive the delete")
    GraftTable.drop(t.location)
  }

  test("merge: upsert updates matches, inserts the rest, prunes by key range") {
    import spark.implicits._
    val t = mk("rmut-merge") // ids 0-49, 100-149, 200-249 in three files
    val filesBefore = t.committedFiles.toSet
    // source keys 110, 120 (updates, middle file only) + 500 (insert)
    val src = Seq((110, "upd", -1), (120, "upd", -2), (500, "new", -3))
      .toDF("id", "grp", "v")
    val (updated, inserted) = t.merge(src, Seq("id"))
    assert((updated, inserted) === (2L, 1L))
    assert(t.rowCountFromMetadata() === 151L)
    // key range [110, 500] misses file 1 (0-49) entirely; file 1 must
    // survive untouched. (File 3's 200-249 intersects the range, so it
    // legitimately rewrites.)
    assert(filesBefore.count(t.committedFiles.toSet.contains) >= 1,
      "key-range-refuted files must carry forward")
    val got = t.read().filter(col("id").isin(110, 120, 500))
      .orderBy("id").collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2)))
    assert(got.toSeq === Seq((110, "upd", -1), (120, "upd", -2), (500, "new", -3)))
    assert(t.read().filter(col("id") === 115).head().getString(1) !== "upd",
      "non-matched target rows unchanged")
    GraftTable.drop(t.location)
  }

  test("merge: duplicate source keys throw; NULL source keys insert") {
    import spark.implicits._
    val t = mk("rmut-merge-edge")
    intercept[IllegalArgumentException] {
      t.merge(Seq((1, "a", 1), (1, "b", 2)).toDF("id", "grp", "v"), Seq("id"))
    }
    // a NULL key never matches — it inserts (SQL equality semantics)
    val (u, i) = t.merge(
      Seq((null.asInstanceOf[Integer], "nullkey", 0))
        .toDF("id", "grp", "v"), Seq("id"))
    assert((u, i) === (0L, 1L))
    assert(t.read().filter(col("id").isNull).count() === 1L)
    // target rows with duplicate keys BOTH update (cardinality preserved)
    val t2 = GraftTable.create(spark, tmpDir("rmut-merge-dup") + "/t", schema)
    t2.append(Seq((7, "x", 1), (7, "y", 2), (8, "z", 3)).toDF("id", "grp", "v"))
    val (u2, i2) = t2.merge(Seq((7, "upd", 0)).toDF("id", "grp", "v"), Seq("id"))
    assert((u2, i2) === (2L, 0L))
    assert(t2.read().count() === 3L, "MERGE update preserves target cardinality")
    assert(t2.read().filter(col("id") === 7).collect()
      .forall(r => r.getString(1) == "upd"))
    GraftTable.drop(t.location); GraftTable.drop(t2.location)
  }

  test("merge into an empty table is a pure insert") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir("rmut-merge-empty") + "/t", schema)
    val (u, i) = t.merge(Seq((1, "a", 10), (2, "b", 20)).toDF("id", "grp", "v"), Seq("id"))
    assert((u, i) === (0L, 2L))
    assert(t.read().count() === 2L)
    GraftTable.drop(t.location)
  }

  test("SQL DELETE FROM routes through the copy-on-write delete") {
    val wh = tmpDir("rmut-sql-wh")
    spark.conf.set("spark.sql.catalog.rmcat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.rmcat.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS rmcat.db")
      spark.sql("CREATE TABLE rmcat.db.t (id INT, grp STRING) USING graft")
      spark.sql("INSERT INTO rmcat.db.t VALUES (1,'a'), (2,'b'), (3,'a'), (4,'c')")
      spark.sql("DELETE FROM rmcat.db.t WHERE grp = 'a'")
      assert(spark.sql("SELECT id FROM rmcat.db.t ORDER BY id").collect()
        .map(_.getInt(0)).toSeq === Seq(2, 4))
      // row count metadata stays exact through the SQL path
      assert(GraftTable.open(spark, s"$wh/db/t").rowCountFromMetadata() === 2L)
      // full-table DELETE routes through metadata-only truncate
      spark.sql("DELETE FROM rmcat.db.t")
      assert(spark.sql("SELECT count(*) FROM rmcat.db.t").head().getLong(0) === 0L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS rmcat.db.t")
      spark.conf.unset("spark.sql.catalog.rmcat")
    }
  }
}
