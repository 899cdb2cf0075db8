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

  test("tiered trigger: no per-append rewrite of the whole small set at min_files=2") {
    // The pathological shape: min_files=2 means a bare count trigger
    // would fire on EVERY append once one compaction output exists
    // (the output re-counts as small), rewriting the entire small set
    // each time — quadratic write amplification. The tiered gate
    // (sum >= 2*max) lets a compaction output of size S be rewritten
    // only after ~S bytes of newcomers accumulate, so over N
    // same-size appends rewrites happen at ~2, 4, 8, … appends —
    // O(log N) rewrites, each byte rewritten O(log N) times.
    val t = GraftTable.create(spark, tmpDir("ac-tier") + "/t", schema,
      GraftTableOptions(autoCompactMinFiles = 2))
    import spark.implicits._
    // appends big enough that file size is data-dominated (a 10-row
    // file is all parquet footer, which breaks the byte-tiering math)
    def chunk(b: Int) = (b * 5000 until (b + 1) * 5000)
      .map(i => (i, s"payload-$i-${"x" * 40}")).toDF("id", "v").coalesce(1)
    var rewrites = 0
    var prevFiles = Set.empty[String]
    for (b <- 0 until 8) {
      t.append(chunk(b))
      val now = t.committedFiles.toSet
      if (prevFiles.exists(!now.contains(_))) rewrites += 1 // a compaction replaced files
      prevFiles = now
    }
    assert(t.read().count() === 40000L)
    assert(rewrites <= 4,
      s"expected O(log n) compactions over 8 appends, got $rewrites (per-append rewrite)")
    assert(rewrites >= 1, "the tail must still fold sometimes")
    assert(t.committedFiles.size < 8, "hygiene still happens")
    GraftTable.drop(t.location)
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
