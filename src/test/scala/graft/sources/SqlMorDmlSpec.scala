package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.storage.GraftTable

/** Delta-based SQL row-level DML on `delete_mode = merge-on-read`
  * tables ([[org.apache.spark.sql.graft.GraftDeltaRowLevel]]): UPDATE /
  * MERGE / non-translatable DELETE write position deletes + appended
  * new rows instead of rewriting files — writes ∝ rows changed. Also
  * covers the row-lineage metadata columns the path keys on. */
class SqlMorDmlSpec extends SparkSpec {

  private lazy val wh: String = tmpDir("mor-wh")

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.catalog.mor", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.mor.warehouse", wh)
  }

  private var n = 0
  private def fresh(rows: Int = 1000): (String, GraftTable) = {
    n += 1
    val tbl = s"t$n"
    spark.sql(s"CREATE TABLE mor.db.$tbl (id BIGINT, grp STRING, v BIGINT) " +
      "USING graft OPTIONS (delete_mode 'merge-on-read')")
    spark.sql(s"INSERT INTO mor.db.$tbl SELECT id, concat('g', id % 7), id * 10 " +
      s"FROM range($rows)")
    (tbl, GraftTable.open(spark, s"$wh/db/$tbl"))
  }

  test("row-lineage metadata columns resolve and address every row") {
    val (tbl, t) = fresh()
    val rows = spark.sql(
      s"SELECT _graft_file, _graft_pos, id FROM mor.db.$tbl").collect()
    assert(rows.length === 1000)
    assert(rows.forall(_.getString(0).endsWith(".parquet")))
    // (file, pos) is unique — it IS the row address
    assert(rows.map(r => (r.getString(0), r.getLong(1))).distinct.length === 1000)
    // positions are per-file parquet row indexes, dense from 0
    val perFile = rows.groupBy(_.getString(0))
    perFile.values.foreach { fs =>
      assert(fs.map(_.getLong(1)).sorted.toSeq === (0L until fs.length).toSeq)
    }
  }

  test("SQL UPDATE writes sidecars + new versions, rewrites nothing") {
    val (tbl, t) = fresh()
    val before = t.committedFiles.toSet
    spark.sql(s"UPDATE mor.db.$tbl SET v = -1 WHERE id % 100 = 7")
    val t2 = GraftTable.open(spark, s"$wh/db/$tbl")
    assert(before.subsetOf(t2.committedFiles.toSet),
      "merge-on-read UPDATE must not rewrite any existing file")
    assert(t2.dvEntries.nonEmpty, "old versions die into sidecars")
    assert(t2.rowCountFromMetadata() === 1000L)
    assert(spark.sql(s"SELECT count(*) FROM mor.db.$tbl").head.getLong(0) === 1000L)
    assert(spark.sql(s"SELECT count(*) FROM mor.db.$tbl WHERE v = -1")
      .head.getLong(0) === 10L)
    assert(spark.sql(s"SELECT v FROM mor.db.$tbl WHERE id = 107").head.getLong(0) === -1L)
    // a second UPDATE over an already-vectored file unions correctly
    spark.sql(s"UPDATE mor.db.$tbl SET v = -2 WHERE id % 100 = 8")
    assert(spark.sql(s"SELECT count(*) FROM mor.db.$tbl").head.getLong(0) === 1000L)
    assert(spark.sql(s"SELECT count(*) FROM mor.db.$tbl WHERE v < 0")
      .head.getLong(0) === 20L)
  }

  test("DELETE / UPDATE with IN-subquery predicates land as position deletes (MOR path)") {
    import spark.implicits._
    val (tbl, t) = fresh()
    val before = t.committedFiles.toSet
    (0L until 100L).map(i => (i, "x")).toDF("kk", "why")
      .createOrReplaceTempView("mor_subq_keys")
    spark.sql(s"DELETE FROM mor.db.$tbl WHERE id IN (SELECT kk FROM mor_subq_keys)")
    val t2 = GraftTable.open(spark, s"$wh/db/$tbl")
    assert(before.subsetOf(t2.committedFiles.toSet),
      "subquery DELETE on the delta path must not rewrite any file")
    assert(t2.dvEntries.nonEmpty, "deletes land as position-delete sidecars")
    assert(spark.sql(s"SELECT count(*) FROM mor.db.$tbl").head.getLong(0) === 900L)
    assert(spark.sql(s"SELECT min(id) FROM mor.db.$tbl").head.getLong(0) === 100L)
    // UPDATE with IN-subquery: vectors + appended new versions, no rewrite
    val files2 = t2.committedFiles.toSet
    spark.sql(s"""UPDATE mor.db.$tbl SET v = -5
      WHERE id IN (SELECT kk + 200 FROM mor_subq_keys WHERE kk < 50)""")
    val t3 = GraftTable.open(spark, s"$wh/db/$tbl")
    assert(files2.subsetOf(t3.committedFiles.toSet))
    assert(spark.sql(s"SELECT count(*) FROM mor.db.$tbl").head.getLong(0) === 900L)
    assert(spark.sql(s"SELECT count(*) FROM mor.db.$tbl WHERE v = -5")
      .head.getLong(0) === 50L)
    assert(spark.sql(s"""SELECT count(*) FROM mor.db.$tbl
      WHERE v = -5 AND (id < 200 OR id >= 250)""").head.getLong(0) === 0L)
  }

  test("non-translatable SQL DELETE lands as position deletes only") {
    val (tbl, t) = fresh()
    val before = t.committedFiles.toSet
    spark.sql(s"DELETE FROM mor.db.$tbl WHERE upper(grp) = 'G3'")
    val t2 = GraftTable.open(spark, s"$wh/db/$tbl")
    assert(t2.committedFiles.toSet === before,
      "a pure delta DELETE adds and rewrites no data file")
    val expected = 1000L - (0L until 1000L).count(_ % 7 == 3)
    assert(t2.rowCountFromMetadata() === expected)
    assert(spark.sql(s"SELECT count(*) FROM mor.db.$tbl").head.getLong(0) === expected)
    assert(spark.sql(s"SELECT count(*) FROM mor.db.$tbl WHERE grp = 'g3'")
      .head.getLong(0) === 0L)
  }

  test("SQL MERGE: matched rows vector + reappend, unmatched insert; counts exact") {
    val (tbl, t) = fresh()
    val before = t.committedFiles.toSet
    spark.sql(s"""
      MERGE INTO mor.db.$tbl t USING (
        SELECT id * 50 AS id, 'merged' AS grp, CAST(-5 AS BIGINT) AS v
        FROM range(25)) s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    val t2 = GraftTable.open(spark, s"$wh/db/$tbl")
    assert(before.subsetOf(t2.committedFiles.toSet))
    // ids 0,50,...,1200: 20 matched (< 1000), 5 inserted (>= 1000)
    assert(t2.rowCountFromMetadata() === 1005L)
    assert(spark.sql(s"SELECT count(*) FROM mor.db.$tbl").head.getLong(0) === 1005L)
    assert(spark.sql(s"SELECT count(*) FROM mor.db.$tbl WHERE grp = 'merged'")
      .head.getLong(0) === 25L)
    assert(spark.sql(s"SELECT count(*) FROM mor.db.$tbl WHERE id = 1200")
      .head.getLong(0) === 1L)
    // the change feed reads the merge as delete(old)+insert(new versions + inserts)
    val diff = t2.changes(t2.version - 1, t2.version).collect()
    assert(diff.count(_.getAs[String]("_change_type") == "delete") === 20)
    assert(diff.count(_.getAs[String]("_change_type") == "insert") === 25)
  }

  test("MERGE NOT MATCHED BY SOURCE on the delta path: vectors, no rewrite") {
    import spark.implicits._
    n += 1
    val tbl = s"t$n"
    spark.sql(s"CREATE TABLE mor.db.$tbl (k INT, v STRING) USING graft " +
      "OPTIONS (sort_by 'k', delete_mode 'merge-on-read')")
    for (b <- 0 until 4)
      spark.sql(s"INSERT INTO mor.db.$tbl SELECT id, concat('old', id) " +
        s"FROM range(${b * 25}, ${(b + 1) * 25})")
    val before = GraftTable.open(spark, s"$wh/db/$tbl").committedFiles.toSet
    spark.sql("SELECT CAST(id AS INT) AS k, concat('new', id) AS v FROM range(0, 10) " +
      "UNION ALL SELECT 200, 'new200'").createOrReplaceTempView(s"src_$tbl")
    spark.sql(s"""
      MERGE INTO mor.db.$tbl t USING src_$tbl s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)
      WHEN NOT MATCHED BY SOURCE AND k < 90 THEN DELETE
      WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = 'stale'""")
    val t = GraftTable.open(spark, s"$wh/db/$tbl")
    val rows = spark.table(s"mor.db.$tbl").as[(Int, String)].collect().toMap
    assert(rows.size === 21, s"got ${rows.size}")
    assert(rows(5) === "new5" && rows(200) === "new200" && rows(95) === "stale")
    assert(!rows.contains(50))
    // the whole by-source sweep still lands as position deletes + small
    // appends — no candidate data file rewritten
    assert(before.subsetOf(t.committedFiles.toSet),
      "delta merge with by-source actions must not rewrite files")
    assert(t.rowCountFromMetadata() === 21L)
  }

  test("bucketed merge-on-read table keeps bucket purity through delta DML") {
    n += 1
    val tbl = s"t$n"
    spark.sql(s"CREATE TABLE mor.db.$tbl (id BIGINT, v BIGINT) USING graft " +
      "CLUSTERED BY (id) INTO 4 BUCKETS " +
      "OPTIONS (delete_mode 'merge-on-read')")
    spark.sql(s"INSERT INTO mor.db.$tbl SELECT id, id FROM range(400)")
    spark.sql(s"UPDATE mor.db.$tbl SET v = -1 WHERE id % 50 = 3")
    val t = GraftTable.open(spark, s"$wh/db/$tbl")
    // every committed file (incl. the delta-appended new versions) must
    // carry its bucket tag — the invariant storage-partitioned joins
    // stand on
    assert(t.committedFiles.forall(f => GraftTable.fileBucket(f).nonEmpty),
      s"untagged file after delta DML: ${t.committedFiles.mkString("\n")}")
    assert(spark.sql(s"SELECT count(*) FROM mor.db.$tbl WHERE v = -1")
      .head.getLong(0) === 8L)
    assert(spark.sql(s"SELECT count(*) FROM mor.db.$tbl").head.getLong(0) === 400L)
  }
}
