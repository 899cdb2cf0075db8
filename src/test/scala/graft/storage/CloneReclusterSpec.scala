package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deep CLONE (experiment branching: an independent table with the
  * source's data, options, zone maps, and planner stats) and RECLUSTER
  * (the legitimate route to changing sort_by/zorder_by — ALTER rejects
  * them because committed files written under the old order would
  * falsify the scan's proven-order claims; a full rewrite makes the new
  * claim true). */
class CloneReclusterSpec extends SparkSpec {

  private def schemaOf(pairs: (String, String)*) =
    org.apache.spark.sql.types.StructType(pairs.map { case (n, t) =>
      org.apache.spark.sql.types.StructField(n,
        org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parseDataType(t))
    })

  test("cloneTo: independent copy with data, options, zone maps, and stats") {
    import spark.implicits._
    val root = tmpDir("clone-src")
    val t = GraftTable.create(spark, s"$root/src",
      schemaOf("k" -> "bigint", "v" -> "string"),
      GraftTableOptions(compression = "snappy", sortBy = Seq("k")))
    t.append((1L to 100L).map(i => (i, s"v$i")).toDF("k", "v"))
    t.append((101L to 200L).map(i => (i, s"v$i")).toDF("k", "v"))
    t.analyze()

    val c = t.cloneTo(s"$root/dst")
    assert(c.rowCountFromMetadata() === 200L)
    assert(c.read().as[(Long, String)].collect().toSet ===
      t.read().as[(Long, String)].collect().toSet)
    assert(c.options.compression === "snappy" && c.options.sortBy === Seq("k"))
    // zone maps traveled: a point predicate prunes files on the clone too
    val kept = c.prunedFiles(Seq(org.apache.spark.sql.sources.EqualTo("k", 5L)))
    assert(kept.size < c.committedFiles.size,
      s"clone zone maps must prune: kept ${kept.size} of ${c.committedFiles.size}")
    // ANALYZE stats traveled
    assert(c.stats().exists(_.rowCount === 200L))

    // independence: mutations don't cross
    t.delete(Seq(org.apache.spark.sql.sources.LessThan("k", 50L)))
    assert(t.rowCountFromMetadata() === 151L)
    assert(c.rowCountFromMetadata() === 200L)
    c.append(Seq((999L, "new")).toDF("k", "v"))
    assert(c.rowCountFromMetadata() === 201L && t.rowCountFromMetadata() === 151L)

    // a clone over an existing table is refused
    intercept[IllegalArgumentException](t.cloneTo(s"$root/dst"))
    GraftTable.drop(s"$root/src"); GraftTable.drop(s"$root/dst")
  }

  test("cloneTo preserves bucket routing (SPJ layout survives the copy)") {
    import spark.implicits._
    val root = tmpDir("clone-bkt")
    val t = GraftTable.create(spark, s"$root/src",
      schemaOf("k" -> "bigint", "v" -> "string"),
      GraftTableOptions(bucketBy = Seq("k"), bucketCount = 4))
    t.append((1L to 400L).map(i => (i, s"v$i")).toDF("k", "v"))
    val c = t.cloneTo(s"$root/dst")
    assert(c.options.bucketBy === Seq("k") && c.options.bucketCount === 4)
    // bucket pruning works on the clone: a point lookup keeps 1/4 of files
    val kept = c.prunedFiles(Seq(org.apache.spark.sql.sources.EqualTo("k", 7L)))
    assert(kept.nonEmpty && kept.size * 4 <= c.committedFiles.size * 2,
      s"bucket route must prune on the clone: ${kept.size} of ${c.committedFiles.size}")
    GraftTable.drop(s"$root/src"); GraftTable.drop(s"$root/dst")
  }

  test("recluster sort_by: files become range-disjoint, option updates, ALTER still refuses") {
    import spark.implicits._
    val root = tmpDir("recluster")
    val t = GraftTable.create(spark, s"$root/t",
      schemaOf("k" -> "bigint", "v" -> "string"),
      GraftTableOptions(stripeRowCount = 1000L, blockRowCount = 1000L))
    // three shuffled appends: every file spans ~the whole key range, so a
    // point predicate prunes nothing
    for (seed <- Seq(7, 11, 13))
      t.append((1L to 1000L).map(i => ((i * seed) % 3000L, s"v$i")).toDF("k", "v"))
    val probe = Seq(org.apache.spark.sql.sources.EqualTo("k", 77L))
    val keptBefore = t.prunedFiles(probe).size
    assert(keptBefore > 1, "shuffled table: the probe should hit many files")

    val nFiles = t.recluster(sortBy = Seq("k"))
    assert(nFiles === t.committedFiles.size)
    assert(t.options.sortBy === Seq("k"))
    assert(t.rowCountFromMetadata() === 3000L)
    assert(t.read().count() === 3000L)
    // range-partitioned rewrite: the point predicate now prunes to ~1 file
    val keptAfter = t.prunedFiles(probe).size
    assert(keptAfter === 1,
      s"reclustered range-disjoint files must pin a point probe to one file, got $keptAfter")
    assert(keptAfter < keptBefore)
    // rows within each file are sorted (the clustering is real, not just claimed)
    t.committedFiles.foreach { f =>
      val ks = spark.read.parquet(f).select("k").as[Long].collect().toSeq
      assert(ks === ks.sorted, s"file $f must be sorted on k after recluster")
    }
    // ALTER continues to refuse the shortcut that would skip the rewrite
    intercept[IllegalArgumentException](t.setOptions(Map("sort_by" -> "k")))
    GraftTable.drop(s"$root/t")
  }

  test("recluster with no columns DE-clusters: plain rewrite, option cleared") {
    import spark.implicits._
    val root = tmpDir("recluster-none")
    val t = GraftTable.create(spark, s"$root/t",
      schemaOf("k" -> "bigint", "v" -> "string"),
      GraftTableOptions(sortBy = Seq("k")))
    t.append((1L to 200L).map(i => (i, s"v$i")).toDF("k", "v"))
    t.recluster(Seq.empty, Seq.empty) // '' , '' on the CALL surface
    assert(t.options.sortBy.isEmpty && t.options.zorderBy.isEmpty)
    assert(t.rowCountFromMetadata() === 200L)
    assert(t.read().count() === 200L)
    GraftTable.drop(s"$root/t")
  }

  test("recluster zorder_by prunes on BOTH listed columns; bad columns refused") {
    import spark.implicits._
    val root = tmpDir("recluster-z")
    val t = GraftTable.create(spark, s"$root/t",
      schemaOf("x" -> "bigint", "y" -> "bigint", "s" -> "string"),
      GraftTableOptions(stripeRowCount = 1000L, blockRowCount = 1000L))
    val rows = (0L until 4000L).map(i => ((i * 17) % 2000L, (i * 29) % 2000L, s"r$i"))
    t.append(rows.toDF("x", "y", "s"))
    t.recluster(zorderBy = Seq("x", "y"))
    assert(t.options.zorderBy === Seq("x", "y") && t.options.sortBy.isEmpty)
    assert(t.read().count() === 4000L)
    for (c <- Seq("x", "y")) {
      val kept = t.prunedFiles(Seq(org.apache.spark.sql.sources.EqualTo(c, 55L)))
      assert(kept.size < t.committedFiles.size,
        s"z-order must prune on $c: ${kept.size} of ${t.committedFiles.size}")
    }
    intercept[IllegalArgumentException](t.recluster(sortBy = Seq("no_such")))
    intercept[IllegalArgumentException](t.recluster(zorderBy = Seq("s", "x")))
    GraftTable.drop(s"$root/t")
  }

  test("SQL: CALL clone + recluster route through the catalog") {
    spark.conf.set("spark.sql.catalog.gcr", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcr.warehouse", tmpDir("clone-wh"))
    spark.sql("CREATE TABLE gcr.db.src (k BIGINT, v STRING) USING graft")
    spark.sql("INSERT INTO gcr.db.src SELECT id, concat('v', id) FROM range(500)")
    val cloned = spark.sql("CALL gcr.system.clone('db.src', 'db.dst')").collect()
    assert(cloned.head.getLong(2) === 500L)
    assert(spark.table("gcr.db.dst").count() === 500L)
    // path traversal in either argument is refused
    intercept[Exception](spark.sql("CALL gcr.system.clone('db.src', '../esc')"))
    val rec = spark.sql("CALL gcr.system.recluster('db.dst', 'k', '')").collect()
    assert(rec.head.getLong(2) >= 1L)
    assert(spark.table("gcr.db.dst").count() === 500L)
    spark.sql("DROP TABLE gcr.db.src"); spark.sql("DROP TABLE gcr.db.dst")
  }
}
