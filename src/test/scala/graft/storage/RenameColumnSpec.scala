package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** RENAME COLUMN as a rewrite: parquet binds by name (cstore's
  * metadata-only rename is a positional-format luxury), so the rename
  * rewrites every file under the new name and swaps files + schema +
  * renamed option references in one commit. */
class RenameColumnSpec extends SparkSpec {

  test("rename rewrites data under the new name; clustering follows") {
    import spark.implicits._
    val root = tmpDir("rename")
    val t = GraftTable.create(spark, s"$root/t",
      StructType(Seq(StructField("k", LongType), StructField("v", StringType))),
      GraftTableOptions(sortBy = Seq("k"), stripeRowCount = 1000L,
        blockRowCount = 1000L))
    for (lo <- Seq(0L, 1000L, 2000L))
      t.append((lo until lo + 1000L).map(i => (i, s"v$i")).toDF("k", "v"))
    t.renameColumn("k", "key")
    assert(t.schema.fieldNames.toSeq === Seq("key", "v"))
    assert(t.rowCountFromMetadata() === 3000L)
    val rows = t.read()
    assert(rows.columns.toSeq === Seq("key", "v"))
    assert(rows.agg(sum("key")).head.getLong(0) === (0L until 3000L).sum)
    // sort_by followed the rename and the rewrite kept files range-disjoint:
    // a point probe on the NEW name pins to one file
    assert(t.options.sortBy === Seq("key"))
    val kept = t.prunedFiles(Seq(org.apache.spark.sql.sources.EqualTo("key", 77L)))
    assert(kept.size === 1,
      s"zone maps must prune on the renamed column: kept ${kept.size}")
    // the old name is gone everywhere
    intercept[Exception](t.read().select("k").collect())
    intercept[IllegalArgumentException](t.renameColumn("k", "z"))
    intercept[IllegalArgumentException](t.renameColumn("v", "key"))
    GraftTable.drop(s"$root/t")
  }

  test("renaming the bucket column keeps the route valid (values unmoved)") {
    import spark.implicits._
    val root = tmpDir("rename-bkt")
    val t = GraftTable.create(spark, s"$root/t",
      StructType(Seq(StructField("k", LongType), StructField("v", StringType))),
      GraftTableOptions(bucketBy = Seq("k"), bucketCount = 4))
    t.append((1L to 400L).map(i => (i, s"v$i")).toDF("k", "v"))
    val allFiles = t.committedFiles.size
    t.renameColumn("k", "id")
    assert(t.options.bucketBy === Seq("id"))
    assert(t.read().count() === 400L)
    // the route function prunes a point lookup on the renamed column
    val kept = t.prunedFiles(Seq(org.apache.spark.sql.sources.EqualTo("id", 7L)))
    assert(kept.nonEmpty && kept.size < t.committedFiles.size,
      s"bucket route must prune on the renamed column: ${kept.size} of ${t.committedFiles.size}")
    assert(allFiles >= 4, "bucketed table should hold one file per bucket")
    GraftTable.drop(s"$root/t")
  }

  test("rename materializes ALTER-added synthesized defaults") {
    import spark.implicits._
    val root = tmpDir("rename-def")
    val t = GraftTable.create(spark, s"$root/t",
      StructType(Seq(StructField("a", IntegerType), StructField("b", StringType))))
    t.append(Seq((1, "x"), (2, "y")).toDF("a", "b"))
    t.addColumn("w", IntegerType, 7) // synthesized for the pre-ALTER file
    t.renameColumn("w", "weight")
    val rows = t.read().as[(Int, String, Int)].collect().toSet
    assert(rows === Set((1, "x", 7), (2, "y", 7)),
      "the synthesized default must survive the rename rewrite")
    GraftTable.drop(s"$root/t")
  }

  test("SQL ALTER TABLE RENAME COLUMN routes through the rewrite") {
    spark.conf.set("spark.sql.catalog.grn", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.grn.warehouse", tmpDir("rename-wh"))
    spark.sql("CREATE TABLE grn.db.t (a BIGINT, b STRING) USING graft")
    spark.sql("INSERT INTO grn.db.t SELECT id, concat('v', id) FROM range(100)")
    spark.sql("ALTER TABLE grn.db.t RENAME COLUMN a TO key")
    val df = spark.table("grn.db.t")
    assert(df.columns.toSeq === Seq("key", "b"))
    assert(df.agg(sum("key")).head.getLong(0) === (0L until 100L).sum)
    // renamed column keeps working for DML + inserts
    spark.sql("INSERT INTO grn.db.t VALUES (500, 'n')")
    spark.sql("DELETE FROM grn.db.t WHERE key < 10")
    assert(spark.table("grn.db.t").count() === 91L)
    spark.sql("DROP TABLE grn.db.t")
  }
}
