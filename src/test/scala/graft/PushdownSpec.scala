package graft

import org.apache.spark.sql.functions._

import graft.queries.CoreQueries

/** Metrics-based proof that projection/predicate pushdown and block
  * skipping engage — the Spark replacement for the reference's
  * `filtered_row_count` EXPLAIN ANALYZE harness
  * (`/root/reference/input/block_filtering.source:11-27`). */
class PushdownSpec extends SparkSpec {

  /** Reference setup: sorted 1..10,000 int column, 1,000-row blocks
    * (`input/block_filtering.source:30-38`) → here small parquet row
    * groups. A BETWEEN over ~1/10 of the range must not read most rows. */
  test("range predicate skips row groups on a sorted column (zone maps)") {
    import spark.implicits._
    val path = tmpDir("skip") + "/t"
    (1 to 10000).toDF("x").repartition(1).sortWithinPartitions("x")
      .write.option("parquet.block.size", "16384").parquet(path)
    val df = spark.read.parquet(path).filter(col("x").between(1000, 2000))
    // collect() executes this exact plan, populating its scan metrics
    assert(df.collect().length === 1001)
    val scan = df.queryExecution.executedPlan.collectLeaves().head
    val scanRows = scan.metrics("numOutputRows").value
    // the scan must emit far fewer rows than the table: blocks whose
    // min/max refute the predicate are never materialized
    assert(scanRows < 10000, s"scan read all $scanRows rows - no skipping")
    assert(scanRows >= 1001)
  }

  test("filters are pushed to the parquet scan (PushedFilters)") {
    val df = CoreQueries.q06RangeFilter(spark, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.contains("GreaterThanOrEqual(l_orderkey,1000)"), plan)
    assert(plan.contains("LessThanOrEqual(l_orderkey,2000)"), plan)
  }

  test("column pruning reaches the scan (ReadSchema)") {
    val df = Tables.load(spark, sf("sf0.001"), "lineitem")
      .select("l_orderkey", "l_quantity")
      .filter(col("l_quantity") > 25)
    val plan = df.queryExecution.executedPlan.toString
    // only the two referenced columns in the parquet read schema
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"), plan)
  }

  test("q11 broadcasts the dimension table and q04 plans top-k") {
    val j = CoreQueries.q11MultiJoin(spark, sf("sf0.001"))
    assert(j.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    val t = CoreQueries.q04SortLimit(spark, sf("sf0.001"))
    assert(t.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
  }

  test("MIN/MAX/COUNT push down to parquet footers on a graft scan") {
    import spark.implicits._
    import graft.storage.GraftTable
    import org.apache.spark.sql.types._
    val loc = tmpDir("aggpush") + "/t"
    val t = GraftTable.create(spark, loc, StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("v", StringType))))
    t.append((1 to 5000).map(i => (i, s"v$i")).toDF("id", "v"))
    val key = "spark.sql.parquet.aggregatePushdown"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      val df = spark.read.format("graft").load(loc)
        .agg(min("id").as("mn"), max("id").as("mx"), count(lit(1)).as("c"))
      assert(df.head() === org.apache.spark.sql.Row(1, 5000, 5000L))
      // the delegate inherits parquet aggregate pushdown: the answer
      // comes from footer statistics, not a data scan
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregation: [MIN(id), MAX(id), COUNT(*)]"),
        s"expected footer-served aggregates:\n${plan.take(1500)}")
      // schema evolution makes footer aggregates UNSOUND: pre-ALTER
      // files lack the new column, whose default is synthesized at read
      // time — pushdown must be refused and the answer must include the
      // synthesized values
      t.addColumn("flag", IntegerType, default = 7)
      val df2 = spark.read.format("graft").load(loc)
        .agg(min("flag").as("mn"), count(lit(1)).as("c"))
      assert(df2.head() === org.apache.spark.sql.Row(7, 5000L),
        "the synthesized default must reach the aggregate")
      val plan2 = df2.queryExecution.executedPlan.toString
      assert(!plan2.contains("PushedAggregation: [MIN(flag)"),
        s"footer aggregates must be refused under synthesized columns:\n${plan2.take(1200)}")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
      GraftTable.drop(loc)
    }
  }

  test("footer aggregates refuse on EVOLVED columns (null-default ADD + mergeSchema) until a full rewrite") {
    import spark.implicits._
    import graft.storage.GraftTable
    import org.apache.spark.sql.types._
    val loc = tmpDir("aggpush-evo") + "/t"
    val t = GraftTable.create(spark, loc, StructType(Seq(
      StructField("id", IntegerType, nullable = false))))
    t.append((1 to 100).map(i => Tuple1(i)).toDF("id"))
    val key = "spark.sql.parquet.aggregatePushdown"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      // mergeSchema evolution: pre-evolution files lack the column — a
      // footer aggregate over them would fail or drop the NULLs
      t.appendMergeSchema(Seq((101, 9)).toDF("id", "flag"))
      val df = spark.read.format("graft").load(loc)
        .agg(count(col("flag")).as("c"), min("flag").as("mn"))
      assert(df.head() === org.apache.spark.sql.Row(1L, 9),
        "pre-evolution rows contribute NULL, not garbage")
      assert(!df.queryExecution.executedPlan.toString.contains("PushedAggregation: [COUNT"),
        "footer aggregates must refuse while files predate the column")
      // same rule for a plain ALTER ADD COLUMN with NO default
      t.addColumn("note", IntegerType)
      val df2 = spark.read.format("graft").load(loc).agg(count(col("note")).as("c"))
      assert(df2.head() === org.apache.spark.sql.Row(0L))
      assert(!df2.queryExecution.executedPlan.toString.contains("PushedAggregation: [COUNT"))
      // a FULL rewrite materializes the columns into every file — the
      // markers lift and footer aggregates are sound again
      t.compact()
      val df3 = spark.read.format("graft").load(loc)
        .agg(min("id").as("mn"), max("id").as("mx"), count(lit(1)).as("c"))
      assert(df3.head() === org.apache.spark.sql.Row(1, 101, 101L))
      assert(df3.queryExecution.executedPlan.toString.contains("PushedAggregation: [MIN(id)"),
        "after compaction every file carries the schema; pushdown re-enables")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
      GraftTable.drop(loc)
    }
  }

  test("footer aggregates are refused on a VERSION AS OF snapshot with synthesized columns") {
    import spark.implicits._
    import graft.storage.GraftTable
    import org.apache.spark.sql.types._
    val wh = tmpDir("aggsnap-wh")
    spark.conf.set("spark.sql.catalog.aggsnap", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.aggsnap.warehouse", wh)
    val key = "spark.sql.parquet.aggregatePushdown"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      spark.sql("CREATE TABLE aggsnap.db.t (id INT, v STRING) USING graft")
      spark.sql("INSERT INTO aggsnap.db.t VALUES (1, 'a'), (2, 'b')")
      val t = GraftTable.open(spark, s"$wh/db/t")
      // ADD COLUMN ... DEFAULT: pre-ALTER files lack `flag`; its value is
      // synthesized at read time, so footer MIN/MAX over a snapshot taken
      // after the ALTER is just as unsound as on the live table
      t.addColumn("flag", IntegerType, default = 7)
      val head = GraftTable.open(spark, s"$wh/db/t").version
      val df = spark.sql(
        s"SELECT min(flag) AS mn, count(1) AS c FROM aggsnap.db.t VERSION AS OF $head")
      assert(df.head() === org.apache.spark.sql.Row(7, 2L),
        "the synthesized default must reach the time-travel aggregate")
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("PushedAggregation: [MIN(flag)"),
        s"footer aggregates must be refused on a synthesized-column snapshot:\n${plan.take(1200)}")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
      spark.sql("DROP TABLE IF EXISTS aggsnap.db.t")
      spark.conf.unset("spark.sql.catalog.aggsnap")
      spark.conf.unset("spark.sql.catalog.aggsnap.warehouse")
    }
  }

  test("metadata-only count: q01 reads no data columns") {
    val df = CoreQueries.q01Count(spark, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<>"), plan)
  }

  // -- pruning observability: DSv2 custom metrics (VERDICT r9 #4) -------
  //
  // The reference proves skipping to the USER via EXPLAIN ANALYZE
  // rows-removed (`input/block_filtering.source:11-27`); the graft scan
  // must surface the same facts in every query's executed-plan metrics,
  // not only in spec-internal counters.

  private def graftScanExec(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.execution.datasources.v2.BatchScanExec =
    df.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.getOrElse(fail("no BatchScanExec in plan"))

  /** Three one-file appends with disjoint id ranges 0-99/1000-1099/2000-2099. */
  private def mkMetricTable(prefix: String): graft.storage.GraftTable = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val loc = tmpDir(prefix) + "/tbl"
    val t = graft.storage.GraftTable.create(spark, loc, StructType(Seq(
      StructField("id", IntegerType), StructField("v", StringType))))
    for (base <- Seq(0, 1000, 2000))
      t.append((base until base + 100).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    t
  }

  test("static zone-map pruning reports graftFilesPrunedStatic in plan metrics") {
    val t = mkMetricTable("metr-static")
    val df = spark.read.format("graft").load(t.location).filter(col("id") === 1050)
    assert(df.collect().length === 1)
    val scan = graftScanExec(df)
    assert(scan.metrics.contains("graftFilesPrunedStatic"),
      s"scan must declare the metric; has ${scan.metrics.keys.mkString(",")}")
    assert(scan.metrics("graftFilesPrunedStatic").value === 2,
      "two of three files are refuted by the id=1050 zone maps")
    assert(scan.metrics("graftFilesPrunedRuntime").value === 0)
    graft.storage.GraftTable.drop(t.location)
  }

  test("trunc/year equality predicates rewrite to ranges and prune files (GraftTruncRangeRule)") {
    import org.apache.spark.sql.types._
    // three one-file appends, one calendar month each (timestamps)
    val loc = tmpDir("metr-trunc") + "/tbl"
    val t = graft.storage.GraftTable.create(spark, loc, StructType(Seq(
      StructField("ts", TimestampType), StructField("v", IntegerType))))
    for (m <- Seq("01", "02", "03")) {
      val df = spark.range(50).selectExpr(
        s"timestamp'2024-$m-01 00:00:00' + make_interval(0,0,0,CAST(id % 27 AS INT),1,0,0) AS ts",
        "CAST(id AS INT) AS v")
      t.append(df.coalesce(1))
    }
    val hit = spark.read.format("graft").load(loc)
      .filter(expr("date_trunc('month', ts) = timestamp'2024-02-01 00:00:00'"))
    // collect() so the SAME QueryExecution runs (count() plans afresh
    // and the inspected scan's metrics would stay zero)
    assert(hit.collect().length === 50, "the rewrite must preserve semantics")
    val scan = graftScanExec(hit)
    assert(scan.metrics("graftFilesPrunedStatic").value === 2,
      "the range form must reach the zone maps and drop the other months")
    // an UNALIGNED literal is not rewritten (always-false for non-null
    // input) — correctness unchanged, nothing pruned by the rule
    val un = spark.read.format("graft").load(loc)
      .filter(expr("date_trunc('month', ts) = timestamp'2024-02-15 00:00:00'"))
    assert(un.collect().isEmpty)
    // INEQUALITIES rewrite too (trunc is monotone; an aligned literal
    // is its unit's infimum): >= keeps Feb+Mar, literal-on-left <
    // keeps Mar only
    val ge = spark.read.format("graft").load(loc)
      .filter(expr("date_trunc('month', ts) >= timestamp'2024-02-01 00:00:00'"))
    assert(ge.collect().length === 100)
    assert(graftScanExec(ge).metrics("graftFilesPrunedStatic").value === 1,
      "the one-sided lower bound must drop January's file")
    val flip = spark.read.format("graft").load(loc)
      .filter(expr("timestamp'2024-02-01 00:00:00' < date_trunc('month', ts)"))
    assert(flip.collect().length === 50)
    assert(graftScanExec(flip).metrics("graftFilesPrunedStatic").value === 2,
      "literal-on-left strict > must resolve to ts >= the NEXT month")
    graft.storage.GraftTable.drop(loc)

    // DATE column: trunc() and year() both prune
    val loc2 = tmpDir("metr-trunc-d") + "/tbl"
    val t2 = graft.storage.GraftTable.create(spark, loc2, StructType(Seq(
      StructField("d", DateType), StructField("v", IntegerType))))
    for (y <- Seq("2023", "2024", "2025")) {
      val df = spark.range(50).selectExpr(
        s"date_add(date'$y-03-01', CAST(id % 28 AS INT)) AS d",
        "CAST(id AS INT) AS v")
      t2.append(df.coalesce(1))
    }
    val dHit = spark.read.format("graft").load(loc2)
      .filter(expr("trunc(d, 'month') = date'2024-03-01'"))
    assert(dHit.collect().length === 50)
    assert(graftScanExec(dHit).metrics("graftFilesPrunedStatic").value === 2)
    val yHit = spark.read.format("graft").load(loc2)
      .filter(expr("year(d) = 2025"))
    assert(yHit.collect().length === 50)
    assert(graftScanExec(yHit).metrics("graftFilesPrunedStatic").value === 2,
      "year() equality must prune to the one matching file")
    graft.storage.GraftTable.drop(loc2)
  }

  test("trunc 'day' rewrite declines when an offset transition falls inside the day") {
    import org.apache.spark.sql.types._
    // Spark truncates DAY at each ROW's own offset, so on a day with a
    // DST transition rows after it truncate to a DIFFERENT instant
    // than the literal midnight — the rewrite must decline there and
    // fire on transition-free days (UTC always qualifies).
    val loc = tmpDir("metr-dst") + "/tbl"
    val t = graft.storage.GraftTable.create(spark, loc, StructType(Seq(
      StructField("ts", TimestampType))))
    t.append(spark.range(5).selectExpr(
      "timestamp'2025-11-02 10:00:00' + make_interval(0,0,0,0,CAST(id AS INT),0,0) AS ts")
      .coalesce(1))
    withConf("spark.sql.session.timeZone", "America/New_York") {
      // 2025-11-02: US fall-back (02:00 -> 01:00) — transition inside
      val bad = spark.read.format("graft").load(loc)
        .filter(expr("date_trunc('day', ts) = timestamp'2025-11-02 00:00:00'"))
      assert(bad.queryExecution.optimizedPlan.toString.contains("date_trunc"),
        "a day containing an offset transition must not rewrite")
      // 2025-11-03: transition-free — rewrites to the range form
      val ok = spark.read.format("graft").load(loc)
        .filter(expr("date_trunc('day', ts) = timestamp'2025-11-03 00:00:00'"))
      val p = ok.queryExecution.optimizedPlan.toString
      assert(!p.contains("date_trunc") && p.contains(">="),
        s"a transition-free day must rewrite to a range:\n$p")
    }
    graft.storage.GraftTable.drop(loc)
  }

  test("CAST(ts AS DATE)/to_date comparisons rewrite to ranges and prune files; exact on DST days") {
    import org.apache.spark.sql.types._
    // three one-file appends, one calendar DAY each
    val loc = tmpDir("metr-cast") + "/tbl"
    val t = graft.storage.GraftTable.create(spark, loc, StructType(Seq(
      StructField("ts", TimestampType), StructField("v", IntegerType))))
    for (d <- Seq("01", "02", "03")) {
      val df = spark.range(50).selectExpr(
        s"timestamp'2024-02-$d 00:00:00' + make_interval(0,0,0,0,0,CAST(id AS INT),0) AS ts",
        "CAST(id AS INT) AS v")
      t.append(df.coalesce(1))
    }
    val hit = spark.read.format("graft").load(loc)
      .filter(expr("CAST(ts AS DATE) = date'2024-02-02'"))
    assert(hit.collect().length === 50, "the rewrite must preserve semantics")
    assert(graftScanExec(hit).metrics("graftFilesPrunedStatic").value === 2,
      "the range form must reach the zone maps and drop the other days")
    // the to_date(ts) spelling analyzes to the same Cast and prunes too
    val td = spark.read.format("graft").load(loc)
      .filter(expr("to_date(ts) = date'2024-02-02'"))
    assert(td.collect().length === 50)
    assert(graftScanExec(td).metrics("graftFilesPrunedStatic").value === 2,
      "to_date must land in the same rewrite")
    // inequality forms ride the same bounds: >= keeps day 2+3
    val ge = spark.read.format("graft").load(loc)
      .filter(expr("CAST(ts AS DATE) >= date'2024-02-02'"))
    assert(ge.collect().length === 100)
    assert(graftScanExec(ge).metrics("graftFilesPrunedStatic").value === 1,
      "the one-sided lower bound must drop the first day's file")
    graft.storage.GraftTable.drop(loc)

    // DST fall-back day: unlike trunc('day') (which declines there),
    // the cast rewrite is EXACT — local date is monotone in the
    // instant, and the 25-hour day maps to [startOfDay, nextStartOfDay)
    val loc2 = tmpDir("metr-cast-dst") + "/tbl"
    val t2 = graft.storage.GraftTable.create(spark, loc2, StructType(Seq(
      StructField("ts", TimestampType))))
    // 72 hourly UTC instants 2025-11-01T00Z .. 2025-11-03T23Z (session
    // tz is UTC while building)
    t2.append(spark.range(72).selectExpr(
      "timestamp'2025-11-01 00:00:00' + make_interval(0,0,0,0,CAST(id AS INT),0,0) AS ts")
      .coalesce(1))
    withConf("spark.sql.session.timeZone", "America/New_York") {
      // NY 2025-11-02 spans UTC [11-02T04:00Z, 11-03T05:00Z): 25 hours
      val dst = spark.read.format("graft").load(loc2)
        .filter(expr("CAST(ts AS DATE) = date'2025-11-02'"))
      assert(dst.collect().length === 25,
        "the fall-back day has 25 hourly instants — the rewrite must keep all of them")
      val p = dst.queryExecution.optimizedPlan.toString
      assert(p.contains(">="),
        s"the cast rewrite must fire on the DST day (it is exact there):\n$p")
    }
    graft.storage.GraftTable.drop(loc2)
  }

  test("runtime (join-driven) pruning reports graftFilesPrunedRuntime") {
    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    val t = mkMetricTable("metr-runtime")
    val df = spark.read.format("graft").load(t.location)
    val scan = graftScanExec(df).scan
      .asInstanceOf[org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering]
    // drive the runtime-filter path the way BatchScanExec does at
    // execution: filter(), then re-plan, then driver metrics
    scan.filter(Array(new Predicate("IN",
      Array(Expressions.column("id"),
        Expressions.literal(1005), Expressions.literal(1050)))))
    assert(scan.toBatch.planInputPartitions().length === 1)
    val reported = scan.asInstanceOf[org.apache.spark.sql.connector.read.Scan]
      .reportDriverMetrics().map(m => m.name -> m.value).toMap
    assert(reported("graftFilesPrunedRuntime") === 2,
      "two refuted files must be metered as runtime-pruned")
    graft.storage.GraftTable.drop(t.location)
  }

  test("deletion-vector suppressed rows report graftDvRowsFiltered") {
    import org.apache.spark.sql.sources.LessThan
    val t = mkMetricTable("metr-dv")
    assert(t.deleteMor(Seq(LessThan("id", 30))) === 30L)
    val df = spark.read.format("graft").load(t.location)
    assert(df.collect().length === 270)
    val scan = graftScanExec(df)
    assert(scan.metrics("graftDvRowsFiltered").value === 30,
      "every DV-dead row the readers suppressed must be metered")
    graft.storage.GraftTable.drop(t.location)
  }
}
