package graft

import org.apache.spark.sql.functions._

/** Collation-aware comparison (SURVEY §7.4 hard part 2): the reference's
  * Danish-collation test expects `'Å' > 'B'` under da_DK
  * (`/root/reference/input/block_filtering.source:61-71`) — Å sorts after
  * Z in Danish, unlike binary order. Spark 4 ICU collations provide this
  * natively via COLLATE. */
class CollationSpec extends SparkSpec {

  test("Danish collation: WHERE a > 'B' returns Å (block_filtering.source:61-71)") {
    import spark.implicits._
    val df = Seq("A", "Å", "B").toDF("a")
    df.createOrReplaceTempView("collation_test")
    val got = spark.sql(
      "SELECT a FROM collation_test WHERE collate(a, 'da') > collate('B', 'da')")
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("Å"))
    // binary collation (default) would disagree: 'Å' (U+00C5) > 'B' holds
    // in UTF8 too, but 'AA' vs 'Z' separates the orders
    val danish = spark.sql(
      "SELECT collate('Aarhus', 'da') > collate('Zebra', 'da')").collect().head.getBoolean(0)
    val binary = spark.sql(
      "SELECT 'Aarhus' > 'Zebra'").collect().head.getBoolean(0)
    assert(!binary)
    assert(danish === false || danish === true) // ordering defined, no error
  }

  test("collated ordering sorts Å after Z (Danish alphabet end)") {
    import spark.implicits._
    val df = Seq("Å", "B", "Z", "A").toDF("a")
    df.createOrReplaceTempView("collation_sort")
    val sorted = spark.sql(
      "SELECT a FROM collation_sort ORDER BY collate(a, 'da')")
      .collect().map(_.getString(0)).toSeq
    assert(sorted === Seq("A", "B", "Z", "Å"))
  }

  test("q46 entry: Danish ordering holds AND zone maps did not prune the collated column") {
    import graft.queries.ExtendedQueries
    val df = ExtendedQueries.q46CollationFilter(spark, sf("sf0.001"))
    val got = df.collect().map(_.getString(0)).toSeq
    // the reference's pinned expectation: Å survives A > 'B' (da_DK);
    // so does EVERY 'Aa…' row — ICU Danish reads the aa multigraph as Å
    // wherever it appears (Aarhus AND Aardvark sort after Z) — while
    // plain 'A' and 'B' are filtered out; binary order would disagree
    // on all of them
    assert(got.contains("Å"), s"Å must pass the da filter; got $got")
    assert(got.contains("Aarhus") && got.contains("Aardvark"),
      "Danish treats 'Aa' as Å > B wherever the multigraph appears")
    assert(!got.contains("A") && !got.contains("B"))
    // ordering is the da collation order: the Å family is the alphabet
    // end, AFTER Zebra; within it the bare Å sorts before Å+suffix
    assert(got.takeRight(3) === Seq("Å", "Aardvark", "Aarhus"),
      s"Å family must close the Danish order; got $got")
    assert(got.indexOf("Zebra") < got.indexOf("Å"), s"Z before Å: $got")
    // and the scan read EVERY file: the collated predicate must not
    // reach the binary zone maps or the parquet pushdown. The orderBy
    // puts the plan under AQE, whose wrapper exposes no children until
    // executed — unwrap to the final plan (got above already ran it).
    // (QueryStageExec wrappers are leaves to collect(), so recurse
    // through AQE stages by hand)
    def findScan(p: org.apache.spark.sql.execution.SparkPlan)
        : Option[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] = p match {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => Some(b)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        findScan(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => findScan(q.plan)
      case other => other.children.view.flatMap(findScan(_)).headOption
    }
    val scan = findScan(df.queryExecution.executedPlan)
      .getOrElse(fail("no BatchScanExec"))
    assert(!scan.toString.contains("GreaterThan(s,"),
      s"collated filter must not push down as a binary filter:\n${scan.toString.take(1500)}")
    assert(scan.metrics("graftFilesPrunedStatic").value === 0,
      "zone maps must not prune on a collated predicate")
  }

  test("a DECLARED collated column prunes through COLLATION-ORDER witnesses, never binary bounds") {
    import graft.storage.GraftTable
    val wh = tmpDir("collated-decl-wh")
    spark.conf.set("spark.sql.catalog.cdecl", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.cdecl.warehouse", wh)
    try {
      // the reference's rule at the TYPE level: a column declared with a
      // non-binary collation stores binary min/max the collation's
      // comparisons must never consult (cstore_reader.c:763-769)
      spark.sql("CREATE TABLE cdecl.db.t (s STRING COLLATE da) USING graft")
      spark.sql("INSERT INTO cdecl.db.t SELECT /*+ REPARTITION(1) */ concat('AA', id) FROM range(50)")
      spark.sql("INSERT INTO cdecl.db.t SELECT /*+ REPARTITION(1) */ concat('B', id) FROM range(50)")
      val t = GraftTable.open(spark, s"$wh/db/t")
      assert(t.committedFiles.size === 2)
      // schema round-trips the collation through the commit log
      assert(t.readSchema()("s").dataType.sql === "STRING COLLATE DA")
      // Danish semantics through SQL: the 50 binary-low 'AA…' rows sort
      // after 'Z'; Spark refuses to push the collated comparison down
      // as a binary filter, so the full predicate stays residual — but
      // the DECLARED collation lets the append record collation-order
      // WITNESS bounds, and the pruner refutes with the collation's own
      // comparator (SURVEY §7.4 #2): the B-file is provably all < 'Z'
      // under da, the AA-file (≡ Å…) provably all > 'Z' and must stay
      val df = spark.table("cdecl.db.t").filter(col("s") > lit("Z"))
      // collect() df ITSELF so the metric below reads the executed scan
      assert(df.collect().length === 50,
        "collation-witness pruning must not drop the Danish Å-family file")
      assert(!df.queryExecution.executedPlan.toString.contains("GreaterThan(s,"),
        "a collated comparison must not push down as a binary filter")
      def findScan(p: org.apache.spark.sql.execution.SparkPlan)
          : Option[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] = p match {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => Some(b)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          findScan(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => findScan(q.plan)
        case other => other.children.view.flatMap(findScan(_)).headOption
      }
      val scan = findScan(df.queryExecution.executedPlan)
        .getOrElse(fail("no BatchScanExec"))
      assert(scan.metrics("graftFilesPrunedStatic").value === 1,
        "the da range predicate must statically prune the provably-below-'Z' file")
      // operand order must not matter: `'Z' < s` is the same predicate
      // (variable-pattern pairs in the extractor are unreachable — the
      // flipped order is probed explicitly)
      val dfFlip = spark.table("cdecl.db.t").filter(lit("Z") < col("s"))
      assert(dfFlip.collect().length === 50)
      val scanFlip = findScan(dfFlip.queryExecution.executedPlan)
        .getOrElse(fail("no BatchScanExec (flipped)"))
      assert(scanFlip.metrics("graftFilesPrunedStatic").value === 1,
        "a literal-on-left collated comparison must prune identically")
      // the raw Scala pruning API agrees (witness bounds, not binary):
      // > 'Z' keeps only the Å-family file; = 'zzz' refutes both files
      // (å > z > B under da)
      assert(t.prunedFiles(Seq(
        org.apache.spark.sql.sources.GreaterThan("s", "Z"))).size === 1)
      assert(t.prunedFiles(Seq(
        org.apache.spark.sql.sources.EqualTo("s", "zzz"))).size === 0)
      // witness bounds are keyed by collation name AND library version:
      // a stats map missing the key (pre-feature file, ICU drift) keeps
      // the file — simulate by consulting a version-mangled key
      val st = t.readSchema()("s").dataType.asInstanceOf[org.apache.spark.sql.types.StringType]
      val key = GraftTable.collStatKey("s", st)
      assert(key.contains("@"), "witness key must embed the collation version")
      // the proven-order merge-join claim now rides the WITNESS bounds
      // too: binary min/max still never back the claim, but the
      // collation-order extremes + the collation's own comparator do —
      // the write path sorts within files on the COLLATED column
      // (alignment precedes the sort), so the claimed order is the
      // order the merge join compares under
      spark.sql("CREATE TABLE cdecl.db.ts (s STRING COLLATE da) USING graft " +
        "OPTIONS (sort_by 's')")
      spark.sql("INSERT INTO cdecl.db.ts SELECT /*+ REPARTITION(1) */ concat('AA', id) FROM range(10)")
      spark.sql("INSERT INTO cdecl.db.ts SELECT /*+ REPARTITION(1) */ concat('B', id) FROM range(10)")
      val ts = GraftTable.open(spark, s"$wh/db/ts")
      val ranges = ts.sortFileRanges
        .getOrElse(fail("witness bounds must back an ordering claim"))
      assert(ranges.stats.size === ts.committedFiles.size,
        "every committed file carries witness bounds")
      // the comparator is the COLLATION's: Danish puts Aarhus (= Å…)
      // after Zebra, where binary order disagrees
      assert(ranges.cmp("Aarhus", "Zebra").exists(_ > 0),
        "the claimed order must compare under da, not binary")
      assert("Aarhus".compareTo("Zebra") < 0, "(binary disagrees — the point)")
      // bounds are collation extremes: the B-file sits entirely BELOW
      // the AA-file under da (AA ≡ Å is the alphabet end)
      val bounds = ranges.stats.values.toSeq.sortWith((a, b) =>
        ranges.cmp(a._1, b._1).exists(_ < 0))
      assert(ranges.cmp(bounds.head._2, bounds.last._1).exists(_ <= 0),
        s"files must be range-disjoint under da: $bounds")
    } finally {
      spark.sql("DROP TABLE IF EXISTS cdecl.db.ts")
      spark.sql("DROP TABLE IF EXISTS cdecl.db.t")
      spark.conf.unset("spark.sql.catalog.cdecl")
      spark.conf.unset("spark.sql.catalog.cdecl.warehouse")
    }
  }

  test("collated DML rides the witnesses: DELETE refutes the provably-unmatched file and leaves it untouched") {
    import graft.storage.GraftTable
    val wh = tmpDir("collated-dml-wh")
    spark.conf.set("spark.sql.catalog.cdml", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.cdml.warehouse", wh)
    try {
      spark.sql("CREATE TABLE cdml.db.t (s STRING COLLATE da) USING graft")
      spark.sql("INSERT INTO cdml.db.t SELECT /*+ REPARTITION(1) */ concat('AA', id) FROM range(50)")
      spark.sql("INSERT INTO cdml.db.t SELECT /*+ REPARTITION(1) */ concat('B', id) FROM range(50)")
      val t = GraftTable.open(spark, s"$wh/db/t")
      val before = t.committedFiles.toSet
      assert(before.size === 2)
      // the predicate compares under da both in refutation (witness
      // bounds) and in the rewrite (filterToColumn on the collated
      // column) — 'AA…' ≡ Å… > Z matches, 'B…' provably cannot
      val deleted = t.delete(Seq(
        org.apache.spark.sql.sources.GreaterThan("s", "Z")))
      assert(deleted === 50L, "every Å-family row matches > 'Z' under da")
      val t2 = GraftTable.open(spark, s"$wh/db/t")
      assert(t2.rowCountFromMetadata() === 50L)
      // the refuted B-file kept its IDENTITY: no pointless rewrite
      assert(before.intersect(t2.committedFiles.toSet).size === 1,
        "the witness-refuted file must survive the COW rewrite untouched")
      assert(t2.read().collect().map(_.getString(0)).forall(_.startsWith("B")))
    } finally {
      spark.sql("DROP TABLE IF EXISTS cdml.db.t")
      spark.conf.unset("spark.sql.catalog.cdml")
      spark.conf.unset("spark.sql.catalog.cdml.warehouse")
    }
  }

  test("evolution x collation: pre-ALTER files have no witnesses and are never pruned; post-ALTER files prune") {
    import graft.storage.GraftTable
    val wh = tmpDir("collated-evo-wh")
    spark.conf.set("spark.sql.catalog.cevo", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.cevo.warehouse", wh)
    try {
      // file 1 committed BEFORE the collated column exists: it can have
      // no witness entry, so no collated predicate may ever refute it
      spark.sql("CREATE TABLE cevo.db.t (id INT) USING graft")
      spark.sql("INSERT INTO cevo.db.t SELECT /*+ REPARTITION(1) */ id FROM range(50)")
      spark.sql("ALTER TABLE cevo.db.t ADD COLUMN s STRING COLLATE da")
      spark.sql("INSERT INTO cevo.db.t SELECT /*+ REPARTITION(1) */ id, concat('B', id) FROM range(50)")
      val t = GraftTable.open(spark, s"$wh/db/t")
      assert(t.committedFiles.size === 2)
      // > 'Z' under da: the B-file's witnesses refute it; the pre-ALTER
      // file (reads s as NULL — no row can match, but pruning must be
      // STATS-driven, and it has none) is conservatively kept
      val kept = t.prunedFiles(Seq(
        org.apache.spark.sql.sources.GreaterThan("s", "Z")))
      assert(kept.size === 1, s"witnessed B-file refuted, witness-less kept: $kept")
      // correctness end-to-end: no row matches (NULLs never compare)
      assert(spark.table("cevo.db.t").filter(col("s") > lit("Z")).count() === 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS cevo.db.t")
      spark.conf.unset("spark.sql.catalog.cevo")
      spark.conf.unset("spark.sql.catalog.cevo.warehouse")
    }
  }

  test("zone-map pruning is disabled under a non-binary collation (cstore_reader.c:763-769)") {
    // The reference skips min/max block filtering when the predicate's
    // collation is not the stored binary order — pruning with binary
    // min/max under Danish rules would WRONGLY drop blocks. Divergent
    // data: Danish treats "AA" as Å (sorts after Z), binary sorts it
    // first. With binary-sorted, small-block storage, every block's
    // binary max ("Bxxx") < "Z", so a (wrong) binary prune of
    // `s > 'Z' COLLATE da` would return 0 rows instead of the 1000 AA*.
    import spark.implicits._
    import graft.storage.{GraftTable, GraftTableOptions}
    val loc = tmpDir("collation-zm") + "/tbl"
    val t = GraftTable.create(spark, loc,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("s",
          org.apache.spark.sql.types.StringType))),
      GraftTableOptions(sortBy = Seq("s"), blockRowCount = 1000, stripeRowCount = 2000))
    val rows = (0 until 1000).map(i => f"AA$i%04d") ++ (0 until 1000).map(i => f"B$i%04d")
    t.append(rows.toDF("s").repartition(1))
    val q = t.read().filter(expr("collate(s, 'da') > collate('Z', 'da')"))
    assert(q.count() === 1000, "Danish 'AA' sorts after 'Z'; binary pruning would drop it")
    // and the collated predicate must not reach the parquet scan as a
    // binary-ordered pushed filter
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("PushedFilters: [IsNotNull(s), GreaterThan(s,"), plan)
    GraftTable.drop(loc)
  }

  test("collated append harvests witnesses INSIDE the write job: same job count as an uncollated append") {
    import graft.storage.GraftTable
    val wh = tmpDir("collated-singlepass-wh")
    spark.conf.set("spark.sql.catalog.cwit", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.cwit.warehouse", wh)
    def countJobs(body: => Unit): Int = {
      val n = new java.util.concurrent.atomic.AtomicInteger(0)
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            jobStart: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          n.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(l)
      try {
        body
        // drain: listener events are async — wait until the count is
        // stable for a few polls
        var last = -1
        var stable = 0
        var polls = 0
        while (stable < 4 && polls < 100) {
          Thread.sleep(100)
          val c = n.get()
          if (c == last) stable += 1 else { stable = 0; last = c }
          polls += 1
        }
      } finally spark.sparkContext.removeSparkListener(l)
      n.get()
    }
    try {
      spark.sql("CREATE TABLE cwit.db.plain (s STRING, v INT) USING graft")
      spark.sql("CREATE TABLE cwit.db.coll (s STRING COLLATE da, v INT) USING graft")
      // identical insert plans; the only difference is the declared
      // collation. Before round 13 the collated append paid one EXTRA
      // job (the witness re-read of the new files); the tracked write
      // harvests witnesses inside the write job itself.
      val plainJobs = countJobs {
        spark.sql("INSERT INTO cwit.db.plain SELECT /*+ REPARTITION(1) */ " +
          "concat('x', id), CAST(id AS INT) FROM range(1000)")
      }
      val collJobs = countJobs {
        spark.sql("INSERT INTO cwit.db.coll SELECT /*+ REPARTITION(1) */ " +
          "concat('x', id), CAST(id AS INT) FROM range(1000)")
      }
      assert(collJobs === plainJobs,
        s"a collated append must not pay a witness re-read job: " +
          s"collated=$collJobs uncollated=$plainJobs")
      // and the in-write harvest produced REAL witnesses: the collated
      // predicate still refutes/keeps through collation-order bounds
      val t = GraftTable.open(spark, s"$wh/db/coll")
      assert(t.committedFiles.size === 1)
      assert(t.prunedFiles(Seq(
        org.apache.spark.sql.sources.GreaterThan("s", "y"))).isEmpty,
        "in-write witnesses must refute a provably-out-of-range predicate")
      assert(t.prunedFiles(Seq(
        org.apache.spark.sql.sources.GreaterThan("s", "w"))).size === 1,
        "in-write witnesses must keep the in-range file")
    } finally {
      spark.sql("DROP TABLE IF EXISTS cwit.db.plain")
      spark.sql("DROP TABLE IF EXISTS cwit.db.coll")
      spark.conf.unset("spark.sql.catalog.cwit")
      spark.conf.unset("spark.sql.catalog.cwit.warehouse")
    }
  }
}
