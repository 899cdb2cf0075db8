package graft.storage

import org.apache.spark.sql.types._

import graft.SparkSpec

/** auto_compact_min_files — opportunistic ingest hygiene: the appender
  * folds the small-file tail as it forms, so a trickle ingest never
  * degenerates without a scheduled maintenance job. Plus the `files`
  * introspection procedure that makes layout health observable. */
class AutoCompactSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType), StructField("v", StringType)))

  private def tiny(b: Int) = {
    import spark.implicits._
    (b * 10 until (b + 1) * 10).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
  }

  test("the small-file tail folds once it passes the threshold") {
    val t = GraftTable.create(spark, tmpDir("ac-on") + "/t", schema,
      GraftTableOptions(autoCompactMinFiles = 4))
    for (b <- 0 until 6) t.append(tiny(b))
    assert(t.read().count() === 60L)
    assert(t.rowCountFromMetadata() === 60L)
    assert(t.committedFiles.size < 6,
      s"the tail should have folded; got ${t.committedFiles.size} files")
    // disabled (default): every tiny append keeps its own file
    val u = GraftTable.create(spark, tmpDir("ac-off") + "/t", schema)
    for (b <- 0 until 6) u.append(tiny(b))
    assert(u.committedFiles.size === 6)
    GraftTable.drop(t.location); GraftTable.drop(u.location)
  }

  test("option validates, ALTERs on, and the files procedure reports layout") {
    intercept[IllegalArgumentException] {
      GraftTableOptions(autoCompactMinFiles = 1).validate()
    }
    val wh = tmpDir("ac-sql")
    spark.conf.set("spark.sql.catalog.gac", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gac.warehouse", wh)
    try {
      spark.sql("CREATE TABLE gac.db.a (id INT, v STRING) USING graft " +
        "TBLPROPERTIES ('delete_mode' = 'merge-on-read')")
      for (b <- 0 until 3)
        spark.sql(s"INSERT INTO gac.db.a SELECT id, concat('v', id) " +
          s"FROM range(${b * 10}, ${(b + 1) * 10})")
      spark.sql("DELETE FROM gac.db.a WHERE id % 10 = 3")
      val files = spark.sql("CALL gac.system.files('db.a')").collect()
      assert(files.length >= 3) // each INSERT writes ≥ 1 file
      assert(files.map(_.getLong(2)).sum === 30L, "footer rows per file")
      assert(files.map(_.getLong(3)).sum === 3L, "dead rows from the vectors")
      assert(files.forall(_.getLong(1) > 0L), "bytes reported")
      // ALTER the hygiene on; the next append folds the tail
      spark.sql("ALTER TABLE gac.db.a SET TBLPROPERTIES ('auto_compact_min_files' = '2')")
      spark.sql("INSERT INTO gac.db.a VALUES (100, 'x')")
      val after = spark.sql("CALL gac.system.files('db.a')").collect()
      assert(after.length < files.length,
        s"tail should fold after ALTER (${files.length} -> ${after.length})")
      assert(spark.table("gac.db.a").count() === 28L) // 30 - 3 deleted + 1
    } finally {
      spark.sql("DROP TABLE IF EXISTS gac.db.a")
      spark.conf.unset("spark.sql.catalog.gac")
    }
  }
}
