package graft.sources

import graft.SparkSpec
import graft.storage.GraftTable

/** SQL row-level DML through Spark's group-based ReplaceData machinery
  * (`SupportsRowLevelOperations`): `DELETE FROM` with predicates the
  * metadata path refuses, `UPDATE`, and `MERGE INTO` — the reference's
  * open row-level-mutation TODO (`TODO.md:25-28`) delivered as SQL on
  * the graft copy-on-write scan/write. Also proves the group contract:
  * files whose zone maps refute the DML condition are never rewritten. */
class SqlDmlSpec extends SparkSpec {

  private lazy val warehouse: String = tmpDir("graft-dml-warehouse")

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.catalog.gdml", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdml.warehouse", warehouse)
  }

  private def loc(t: String): String = s"$warehouse/db/$t"

  test("SQL DELETE with a non-translatable predicate rewrites through ReplaceData") {
    spark.sql("CREATE TABLE gdml.db.del_expr (a INT, b STRING) USING graft")
    spark.sql("INSERT INTO gdml.db.del_expr SELECT id, concat('v', id) FROM range(100)")
    // a % 2 = 0 does not translate to a source Filter, so canDeleteWhere
    // refuses it — before SupportsRowLevelOperations this statement FAILED
    spark.sql("DELETE FROM gdml.db.del_expr WHERE a % 2 = 0")
    val left = spark.table("gdml.db.del_expr")
    assert(left.count() === 50)
    assert(left.selectExpr("min(a % 2)").head.getInt(0) === 1)
    // the commit went through the metadata protocol: exact count updated
    assert(GraftTable.open(spark, loc("del_expr")).rowCountFromMetadata() === 50L)
    spark.sql("DROP TABLE gdml.db.del_expr")
  }

  test("SQL UPDATE rewrites matching groups, assignments read own columns") {
    spark.sql("CREATE TABLE gdml.db.upd (a INT, b STRING, c DOUBLE) USING graft")
    spark.sql("INSERT INTO gdml.db.upd SELECT id, concat('v', id), CAST(id AS DOUBLE) FROM range(60)")
    spark.sql("UPDATE gdml.db.upd SET c = c + 100.0, b = concat(b, '!') WHERE a % 3 = 0")
    val t = spark.table("gdml.db.upd")
    assert(t.count() === 60)
    assert(t.filter("a % 3 = 0 AND (c < 100 OR NOT endswith(b, '!'))").count() === 0)
    assert(t.filter("a % 3 != 0 AND (c >= 100 OR endswith(b, '!'))").count() === 0)
    assert(GraftTable.open(spark, loc("upd")).rowCountFromMetadata() === 60L)
    spark.sql("DROP TABLE gdml.db.upd")
  }

  test("SQL MERGE INTO: matched update, matched delete, not-matched insert") {
    import spark.implicits._
    spark.sql("CREATE TABLE gdml.db.mrg (k INT, v STRING) USING graft")
    spark.sql("INSERT INTO gdml.db.mrg SELECT id, concat('old', id) FROM range(10)")
    Seq((2, "upd2"), (4, "del"), (20, "new20"), (21, "new21"))
      .toDF("k", "v").createOrReplaceTempView("mrg_src")
    spark.sql("""
      MERGE INTO gdml.db.mrg t USING mrg_src s ON t.k = s.k
      WHEN MATCHED AND s.v = 'del' THEN DELETE
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    val rows = spark.table("gdml.db.mrg").as[(Int, String)].collect().toMap
    assert(rows.size === 11) // 10 - 1 deleted + 2 inserted
    assert(!rows.contains(4), "matched-delete must remove k=4")
    assert(rows(2) === "upd2")
    assert(rows(20) === "new20" && rows(21) === "new21")
    assert(rows(7) === "old7", "untouched rows carried")
    val g = GraftTable.open(spark, loc("mrg"))
    assert(g.rowCountFromMetadata() === 11L)
    spark.sql("DROP TABLE gdml.db.mrg")
  }

  test("MERGE with NOT MATCHED BY SOURCE actions: full sync + conditional by-source") {
    import spark.implicits._
    spark.sql("CREATE TABLE gdml.db.sync (k INT, v STRING) USING graft " +
      "OPTIONS (sort_by 'k')")
    // four clustered files: zone maps would happily "prune" the three
    // files outside the source's key range — which would be WRONG here,
    // since by-source actions target exactly the rows source keys never
    // touch. Correctness of rows 25..99 below proves no matched-key
    // group pruning (static or runtime) leaked into the by-source scan.
    for (b <- 0 until 4)
      spark.sql(s"INSERT INTO gdml.db.sync SELECT id, concat('old', id) " +
        s"FROM range(${b * 25}, ${(b + 1) * 25})")
    spark.sql("SELECT CAST(id AS INT) AS k, concat('new', id) AS v FROM range(0, 10) " +
      "UNION ALL SELECT 200, 'new200'").createOrReplaceTempView("sync_src")
    spark.sql("""
      MERGE INTO gdml.db.sync t USING sync_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)
      WHEN NOT MATCHED BY SOURCE AND k < 90 THEN DELETE
      WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = 'stale'""")
    val rows = spark.table("gdml.db.sync").as[(Int, String)].collect().toMap
    // 10 matched updates + 1 insert + 10 by-source "stale" (k 90..99)
    assert(rows.size === 21, s"got ${rows.size}")
    assert(rows(5) === "new5" && rows(200) === "new200")
    assert(rows(95) === "stale", "by-source UPDATE must reach rows in unmatched files")
    assert(!rows.contains(50), "by-source DELETE must reach rows in unmatched files")
    assert(GraftTable.open(spark, loc("sync")).rowCountFromMetadata() === 21L)
    spark.sql("DROP TABLE gdml.db.sync")
  }

  test("DELETE / UPDATE / MERGE with IN-subquery predicates (COW path)") {
    import spark.implicits._
    spark.sql("CREATE TABLE gdml.db.subq (k INT, v STRING) USING graft")
    spark.sql("INSERT INTO gdml.db.subq SELECT id, concat('v', id) FROM range(100)")
    // the key set lives in a separate relation — the predicate cannot
    // translate to source Filters, so the statement must run through
    // ReplaceData with the subquery joined into the candidate scan
    (0 until 30).map(i => (i, "del")).toDF("kk", "why")
      .createOrReplaceTempView("subq_keys")
    spark.sql("DELETE FROM gdml.db.subq WHERE k IN (SELECT kk FROM subq_keys)")
    assert(spark.table("gdml.db.subq").count() === 70)
    assert(spark.sql("SELECT min(k) FROM gdml.db.subq").head.getInt(0) === 30)
    // UPDATE with an IN-subquery
    spark.sql("""UPDATE gdml.db.subq SET v = 'marked'
      WHERE k IN (SELECT kk + 40 FROM subq_keys WHERE kk < 10)""")
    assert(spark.sql(
      "SELECT count(*) FROM gdml.db.subq WHERE v = 'marked'").head.getLong(0) === 10)
    assert(spark.sql("""SELECT count(*) FROM gdml.db.subq
      WHERE v = 'marked' AND (k < 40 OR k >= 50)""").head.getLong(0) === 0)
    // MERGE whose SOURCE is filtered by an IN-subquery
    spark.sql("""MERGE INTO gdml.db.subq t
      USING (SELECT id AS k, concat('m', id) AS v FROM range(200)
             WHERE id IN (SELECT kk + 60 FROM subq_keys WHERE kk < 5)) s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    assert(spark.sql(
      "SELECT count(*) FROM gdml.db.subq WHERE v LIKE 'm6%'").head.getLong(0) === 5)
    assert(spark.table("gdml.db.subq").count() === 70)
    // metadata row count tracked through every statement
    assert(GraftTable.open(spark, loc("subq")).rowCountFromMetadata() === 70L)
    // NOT IN flavor: anti-join path (no row has k in the set 90..99 + 1000)
    spark.sql("""DELETE FROM gdml.db.subq
      WHERE k NOT IN (SELECT kk FROM subq_keys WHERE kk >= 0)
        AND k < 95""")
    // survivors below 95: exactly keys 30..94 minus the non-subq_keys…
    // subq_keys is 0..29, so NOT IN keeps k >= 30; with k < 95 → 30..94
    // all deleted
    assert(spark.sql("SELECT count(*) FROM gdml.db.subq WHERE k < 95")
      .head.getLong(0) === 0)
    spark.sql("DROP TABLE gdml.db.subq")
  }

  test("DML scans report pruning metrics (group-filter skipped files visible)") {
    spark.sql("CREATE TABLE gdml.db.dmlmetr (k INT, v STRING) USING graft")
    // three one-file appends with disjoint key ranges
    for (base <- Seq(0, 1000, 2000))
      spark.sql(s"INSERT INTO gdml.db.dmlmetr SELECT /*+ REPARTITION(1) */ " +
        s"id, concat('v', id) FROM range($base, ${base + 100})")
    // the % predicate is non-translatable (ReplaceData path) but its
    // conjunct k < 100 group-filters to the first file only
    val res = spark.sql("DELETE FROM gdml.db.dmlmetr WHERE k % 2 = 0 AND k < 100")
    assert(spark.table("gdml.db.dmlmetr").count() === 250)
    // the DML's executed plan carries the COW scan; two of three files
    // were refuted by the group filter and metered as pruned
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] = p match {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => Seq(b)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
      case c: org.apache.spark.sql.execution.CommandResultExec =>
        scans(c.commandPhysicalPlan)
      case other => (other.children ++ other.subqueries).flatMap(scans)
    }
    val metered = scans(res.queryExecution.executedPlan)
      .filter(_.metrics.contains("graftFilesPrunedStatic"))
    assert(metered.nonEmpty, "the COW scan must declare the pruning metrics; plan:\n" +
      res.queryExecution.executedPlan.toString.take(1500))
    assert(metered.map(_.metrics("graftFilesPrunedStatic").value).max === 2,
      "two zone-map-refuted files must be metered on the DML scan")
    spark.sql("DROP TABLE gdml.db.dmlmetr")
  }

  test("group contract: files refuted by the condition are not rewritten") {
    spark.sql("CREATE TABLE gdml.db.grp (a INT, b STRING) USING graft " +
      "OPTIONS (sort_by 'a')")
    // three appends = three committed files with disjoint zone maps on a
    for (r <- Seq((0, 100), (100, 200), (200, 300)))
      spark.sql(s"INSERT INTO gdml.db.grp SELECT id, concat('v', id) " +
        s"FROM range(${r._1}, ${r._2})")
    val before = GraftTable.open(spark, loc("grp")).committedFiles.toSet
    assert(before.size >= 3)
    // translatable predicate — but routed through ReplaceData it must
    // still rewrite ONLY the file whose zone map intersects [0, 50).
    // (The metadata-delete shortcut may claim it instead; either path
    // must leave the other files' identity untouched.)
    spark.sql("DELETE FROM gdml.db.grp WHERE a < 50")
    val g = GraftTable.open(spark, loc("grp"))
    assert(g.rowCountFromMetadata() === 250L)
    val after = g.committedFiles.toSet
    val carried = before.intersect(after)
    assert(carried.size >= 2,
      s"zone-map-refuted groups must keep their committed files; " +
        s"before=${before.size} after=${after.size} carried=${carried.size}")
    spark.sql("DROP TABLE gdml.db.grp")
  }

  test("runtime group filtering prunes by clustered key on a non-translatable condition") {
    spark.sql("CREATE TABLE gdml.db.rtg (a INT, b STRING) USING graft " +
      "OPTIONS (sort_by 'a')")
    for (r <- Seq((0, 100), (100, 200), (200, 300)))
      spark.sql(s"INSERT INTO gdml.db.rtg SELECT id, concat('v', id) " +
        s"FROM range(${r._1}, ${r._2})")
    val before = GraftTable.open(spark, loc("rtg")).committedFiles.toSet
    // pmod is not a source Filter -> no static prune; the runtime
    // IN-subquery on the clustered column a (values 0..49 after the AND)
    // must confine the rewrite to the first file
    spark.sql("DELETE FROM gdml.db.rtg WHERE pmod(a, 100) = a AND a < 50")
    val g = GraftTable.open(spark, loc("rtg"))
    assert(g.rowCountFromMetadata() === 250L)
    val carried = before.intersect(g.committedFiles.toSet)
    assert(carried.size >= 2,
      s"runtime group filter should spare refuted files; carried=${carried.size}")
    spark.sql("DROP TABLE gdml.db.rtg")
  }

  test("runtime group filtering prunes on an UNCLUSTERED table via the stats-ranked column") {
    spark.sql("CREATE TABLE gdml.db.rtu (a INT, v DOUBLE, b STRING) USING graft")
    // three appends with naturally disjoint a-ranges (a monotonic insert
    // key) but fully overlapping v-ranges — the zone-map separation
    // ranking must pick a, and declaring it (instead of all columns,
    // which Spark turns into an untranslatable struct-IN) lets the
    // runtime IN-subquery confine the rewrite to the first file
    for (r <- Seq((0, 100), (100, 200), (200, 300)))
      spark.sql(s"INSERT INTO gdml.db.rtu SELECT id, rand(42), concat('v', id) " +
        s"FROM range(${r._1}, ${r._2})")
    val g0 = GraftTable.open(spark, loc("rtu"))
    assert(g0.bestRuntimeFilterColumn() === Some("a"),
      "the monotonic insert key must outrank the overlapping double column")
    val before = g0.committedFiles.toSet
    assert(before.size >= 3)
    spark.sql("DELETE FROM gdml.db.rtu WHERE pmod(a, 100) = a AND a < 50")
    val g = GraftTable.open(spark, loc("rtu"))
    assert(g.rowCountFromMetadata() === 250L)
    val carried = before.intersect(g.committedFiles.toSet)
    assert(carried.size >= 2,
      s"stats-ranked runtime filter column should spare refuted files; " +
        s"carried=${carried.size}")
    spark.sql("DROP TABLE gdml.db.rtu")
  }

  test("sort_by clustering survives the SQL DML rewrite (declared write order)") {
    import spark.implicits._
    spark.sql("CREATE TABLE gdml.db.srt (a INT, b STRING) USING graft " +
      "OPTIONS (sort_by 'a')")
    // shuffled insert: without the declared write order the rewrite
    // would freeze this arbitrary order into the replacement file
    spark.sql("INSERT INTO gdml.db.srt SELECT CAST(pmod(id * 37, 200) AS INT), " +
      "concat('v', id) FROM range(200)")
    val before = GraftTable.open(spark, loc("srt")).committedFiles.toSet
    spark.sql("DELETE FROM gdml.db.srt WHERE a % 2 = 0") // non-translatable -> COW
    val g = GraftTable.open(spark, loc("srt"))
    val rewritten = g.committedFiles.filterNot(before)
    assert(rewritten.nonEmpty)
    rewritten.foreach { f =>
      val as = spark.read.parquet(f).select("a").as[Int].collect().toSeq
      assert(as === as.sorted, s"rewritten file $f must stay clustered on a")
    }
    spark.sql("DROP TABLE gdml.db.srt")
  }

  test("pure-insert MERGE (no key overlap) does not rewrite existing groups") {
    import spark.implicits._
    spark.sql("CREATE TABLE gdml.db.pim (k INT, v STRING) USING graft " +
      "OPTIONS (sort_by 'k')")
    for (r <- Seq((0, 100), (100, 200)))
      spark.sql(s"INSERT INTO gdml.db.pim SELECT id, concat('v', id) " +
        s"FROM range(${r._1}, ${r._2})")
    val before = GraftTable.open(spark, loc("pim")).committedFiles.toSet
    Seq((500, "n500"), (501, "n501")).toDF("k", "v")
      .createOrReplaceTempView("pim_src")
    spark.sql("""
      MERGE INTO gdml.db.pim t USING pim_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    val g = GraftTable.open(spark, loc("pim"))
    assert(g.rowCountFromMetadata() === 202L)
    assert(spark.table("gdml.db.pim").filter("k >= 500").count() === 2)
    val carried = before.intersect(g.committedFiles.toSet)
    assert(carried === before,
      s"a no-match MERGE must not rewrite any existing group; " +
        s"carried ${carried.size} of ${before.size}")
    spark.sql("DROP TABLE gdml.db.pim")
  }

  test("whole-table UPDATE (no WHERE) rewrites everything, count preserved") {
    spark.sql("CREATE TABLE gdml.db.updall (a INT, b STRING) USING graft")
    spark.sql("INSERT INTO gdml.db.updall SELECT id, 'x' FROM range(30)")
    spark.sql("UPDATE gdml.db.updall SET b = 'y'")
    val t = spark.table("gdml.db.updall")
    assert(t.count() === 30 && t.filter("b != 'y'").count() === 0)
    assert(GraftTable.open(spark, loc("updall")).rowCountFromMetadata() === 30L)
    spark.sql("DROP TABLE gdml.db.updall")
  }

  test("SQL DML works after ADD COLUMN DEFAULT (defaults materialize in the rewrite)") {
    import spark.implicits._
    spark.sql("CREATE TABLE gdml.db.altdml (a INT, b STRING) USING graft")
    spark.sql("INSERT INTO gdml.db.altdml SELECT id, concat('v', id) FROM range(10)")
    GraftTable.open(spark, loc("altdml"))
      .addColumn("w", org.apache.spark.sql.types.IntegerType, 7)
    // the guard must compare persisted schemas, not the metadata-tagged
    // read schema — this UPDATE used to abort as a phantom concurrent
    // schema change on any table with ALTER-added defaults
    spark.sql("UPDATE gdml.db.altdml SET b = 'upd' WHERE a % 2 = 0")
    val rows = spark.table("gdml.db.altdml").as[(Int, String, Int)].collect()
    assert(rows.length === 10)
    assert(rows.forall(_._3 === 7), "synthesized default must survive the rewrite")
    assert(rows.filter(_._1 % 2 == 0).forall(_._2 == "upd"))
    spark.sql("DROP TABLE gdml.db.altdml")
  }

  test("a delete-heavy MERGE (shrinking rowcount) still fails a stream as a change commit") {
    import spark.implicits._
    spark.sql("CREATE TABLE gdml.db.delhvy (k INT, v STRING) USING graft")
    spark.sql("INSERT INTO gdml.db.delhvy SELECT id, concat('o', id) FROM range(5)")
    val tableLoc = loc("delhvy")
    val ckpt = tmpDir("delhvy-ckpt")
    val q = spark.readStream.format("graft").load(tableLoc)
      .writeStream.format("memory").queryName("delhvy_sink")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      // 3 matched deletes + 1 insert: rowCount SHRINKS, but the insert
      // hides in a rewrite file — skipping by row-growth alone would
      // silently lose it; the stream must fail with guidance instead
      Seq((1, "del"), (2, "del"), (3, "del"), (50, "new"))
        .toDF("k", "v").createOrReplaceTempView("delhvy_src")
      spark.sql("""
        MERGE INTO gdml.db.delhvy t USING delhvy_src s ON t.k = s.k
        WHEN MATCHED THEN DELETE
        WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
      assert(GraftTable.open(spark, tableLoc).rowCountFromMetadata() === 3L)
      val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(err.getMessage.contains("change commit") ||
        Option(err.getCause).exists(_.getMessage.contains("change commit")))
    } finally q.stop()
    spark.sql("DROP TABLE gdml.db.delhvy")
  }

  test("replaceFilesCommit rebases over a concurrent append; refuses after compaction/ALTER") {
    import spark.implicits._
    val loc = tmpDir("dml-races") + "/t"
    val t = GraftTable.create(spark, loc,
      spark.range(0).selectExpr("CAST(id AS INT) a", "'x' b").schema)
    t.append(Seq((1, "a"), (2, "b")).toDF("a", "b"))
    val scanned = t.committedFiles
    val schemaAtScan = t.readSchema()

    // stage a replacement (the COW write's output shape: one dir of parquet)
    def stage(rows: Seq[(Int, String)]): String = {
      val dir = s"$loc/data/batch-cow-race${rows.hashCode.abs}"
      rows.toDF("a", "b").coalesce(1).write.parquet(dir)
      dir
    }

    // concurrent APPEND between scan and commit: the commit must rebase
    // and keep the appended file
    t.append(Seq((9, "z")).toDF("a", "b"))
    t.replaceFilesCommit(scanned, stage(Seq((1, "A"))), schemaAtScan, "TEST")
    val after = GraftTable.open(spark, loc)
    assert(after.read().as[(Int, String)].collect().toSet === Set((1, "A"), (9, "z")),
      "replacement applied, concurrent append preserved")
    assert(after.rowCountFromMetadata() === 2L)

    // concurrent COMPACTION between scan and commit: the scanned files
    // are gone from the committed list — the commit must refuse
    val scanned2 = after.committedFiles
    val schema2 = after.readSchema()
    after.compact()
    val staged2 = stage(Seq((1, "AA")))
    val e = intercept[IllegalArgumentException](
      after.replaceFilesCommit(scanned2, staged2, schema2, "TEST"))
    assert(e.getMessage.contains("concurrent compaction"))

    // concurrent ALTER between scan and commit: refuse on schema drift
    val scanned3 = after.committedFiles
    val schema3 = after.readSchema()
    after.addColumn("c", org.apache.spark.sql.types.IntegerType, 0)
    val e2 = intercept[IllegalArgumentException](
      after.replaceFilesCommit(scanned3, stage(Seq((5, "e"))), schema3, "TEST"))
    assert(e2.getMessage.contains("concurrent schema change"))
    GraftTable.drop(loc)
  }

  test("a stream fails on a SQL MERGE change commit unless skipChangeCommits") {
    import spark.implicits._
    spark.sql("CREATE TABLE gdml.db.chg (k INT, v STRING) USING graft")
    spark.sql("INSERT INTO gdml.db.chg SELECT id, concat('o', id) FROM range(5)")
    val tableLoc = loc("chg")

    // SQL MERGE with update + insert => change commit (mixed files)
    Seq((1, "u1"), (50, "n50")).toDF("k", "v").createOrReplaceTempView("chg_src")
    spark.sql("""
      MERGE INTO gdml.db.chg t USING chg_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    assert(GraftTable.open(spark, tableLoc).rowCountFromMetadata() === 6L)

    // default: the stream must FAIL with the change-commit guidance
    val ckptFail = tmpDir("chg-ckpt-fail")
    val qf = spark.readStream.format("graft").load(tableLoc)
      .writeStream.format("memory").queryName("chg_sink_fail")
      .option("checkpointLocation", ckptFail).start()
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      qf.processAllAvailable()
    }
    assert(err.getMessage.contains("change commit") ||
      Option(err.getCause).exists(_.getMessage.contains("change commit")))
    qf.stop()

    // with skipChangeCommits: initial snapshot (which already contains
    // the merge result) delivers; the change commit version is skipped
    val ckptSkip = tmpDir("chg-ckpt-skip")
    val qs = spark.readStream.format("graft")
      .option("skipChangeCommits", "true").load(tableLoc)
      .writeStream.format("memory").queryName("chg_sink_skip")
      .option("checkpointLocation", ckptSkip).start()
    try {
      qs.processAllAvailable()
      // initial load is the oldest retained snapshot (pre-merge, 5 rows);
      // the change commit after it is skipped
      assert(spark.table("chg_sink_skip").count() === 5L)
      // later appends still flow
      spark.sql("INSERT INTO gdml.db.chg VALUES (99, 'n99')")
      qs.processAllAvailable()
      assert(spark.table("chg_sink_skip").count() === 6L)
    } finally qs.stop()
    spark.sql("DROP TABLE gdml.db.chg")
  }
}
