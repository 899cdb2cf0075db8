package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.storage.{GraftTable, Selectivity}

/** ANALYZE's planner role (`cstore_fdw.c:2061-2082` feeding the
  * selectivity estimate at `cstore_fdw.c:1628-1638`): collected column
  * stats must change what Catalyst believes about a FILTERED graft scan
  * — before ANALYZE the estimate is a byte-size guess; after, an
  * equality predicate on a high-ndv column shrinks the estimate enough
  * to flip a join to broadcast. */
class GraftStatsSpec extends SparkSpec {

  private def mkTable(loc: String, rows: Int): GraftTable = {
    import spark.implicits._
    val t = GraftTable.create(spark, loc, StructType(Seq(
      StructField("k", IntegerType),
      StructField("grp", IntegerType),
      StructField("pad", StringType))))
    t.append((0 until rows).map(i => (i, i % 50, "x" * 200)).toDF("k", "grp", "pad"))
    t
  }

  test("selectivity estimator follows the System-R rules") {
    val stats = GraftTable.TableStats(10000L, 1L << 20, Map(
      "k" -> GraftTable.ColumnStats("0", "9999", 10000L, 0L),
      "grp" -> GraftTable.ColumnStats("0", "49", 50L, 0L),
      "n" -> GraftTable.ColumnStats("0", "100", 100L, 2500L),
      "d" -> GraftTable.ColumnStats("2024-01-01", "2024-12-31", 366L, 0L)))
    val schema = StructType(Seq(
      StructField("k", IntegerType), StructField("grp", IntegerType),
      StructField("n", IntegerType), StructField("d", DateType)))
    def rows(f: Filter): Long = Selectivity.estimateRows(Seq(f), stats, schema)
    assert(rows(EqualTo("k", 5)) === 1L)              // 1/ndv
    assert(rows(EqualTo("grp", 3)) === 200L)          // 10000/50
    assert(rows(In("grp", Array(1, 2, 3, 4))) === 800L)
    assert(rows(IsNull("n")) === 2500L)
    assert(rows(IsNotNull("n")) === 7500L)
    // range interpolation: k < 1000 is ~10% of [0, 9999]
    val r = rows(LessThan("k", 1000))
    assert(r > 900L && r < 1100L, s"range estimate $r")
    // date ranges interpolate in the epoch-day domain
    val dr = rows(GreaterThanOrEqual("d", java.sql.Date.valueOf("2024-10-01")))
    assert(dr > 1800L && dr < 3200L, s"date range estimate $dr")
    // conjunction multiplies; unknown columns never shrink the estimate
    assert(rows(And(EqualTo("grp", 3), LessThan("k", 1000))) < 50L)
    assert(rows(EqualTo("nosuch", 1)) === 50L) // default eq 0.005
  }

  test("ANALYZE changes the filtered-scan estimate and flips a join to broadcast") {
    val loc = tmpDir("gstats") + "/fact"
    mkTable(loc, 20000)
    def filteredStats(): (Option[BigInt], BigInt) = {
      val df = spark.read.format("graft").load(loc).filter(col("grp") === 3)
      val s = df.queryExecution.optimizedPlan.collect {
        case r: DataSourceV2ScanRelation => r.stats
      }.head
      (s.rowCount, s.sizeInBytes)
    }
    val (preRows, preSize) = filteredStats()
    GraftTable.open(spark, loc).analyze()
    val (postRows, postSize) = filteredStats()
    // post-ANALYZE: ~20000/50 = 400 rows; pre-ANALYZE: a byte-size guess
    assert(postRows.exists(r => r >= 400 && r < 800), s"post-ANALYZE rows $postRows")
    assert(postSize < preSize,
      s"ANALYZE should shrink the filtered estimate ($preSize -> $postSize)")

    // the planner acts on it: threshold sits between the two estimates
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (postSize * 2).toString)
    try {
      import spark.implicits._
      val big = spark.range(200000).toDF("k2")
      val joined = big.join(
        spark.read.format("graft").load(loc).filter(col("grp") === 3), $"k2" === $"k")
      val plan = joined.queryExecution.sparkPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"filtered graft side should broadcast post-ANALYZE:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    GraftTable.drop(loc)
  }

  test("ANALYZE collects exact MCVs and equality selectivity becomes skew-aware") {
    val loc = tmpDir("gstats-mcv") + "/t"
    import spark.implicits._
    val t = GraftTable.create(spark, loc, StructType(Seq(
      StructField("k", IntegerType), StructField("cat", StringType))))
    // planted skew: 60% 'hot', 20% 'warm', the rest spread over ~500
    // cold values — the shape where uniform 1/ndv estimation is off by
    // orders of magnitude in both directions
    t.append((0 until 10000).map { i =>
      val cat =
        if (i % 10 < 6) "hot" else if (i % 10 < 8) "warm" else s"cold_${i % 500}"
      (i, cat)
    }.toDF("k", "cat"))
    val st = t.analyze()
    val mcv = st.columns("cat").mcvs
    assert(mcv.size <= 10, s"MCV list bounded: $mcv")
    assert(mcv.toMap.get("hot") === Some(6000L), s"exact hot count: $mcv")
    assert(mcv.toMap.get("warm") === Some(2000L), s"exact warm count: $mcv")
    val schema = StructType(Seq(
      StructField("k", IntegerType), StructField("cat", StringType)))
    val hotRows = Selectivity.estimateRows(Seq(EqualTo("cat", "hot")), st, schema)
    val coldRows = Selectivity.estimateRows(Seq(EqualTo("cat", "cold_7")), st, schema)
    assert(hotRows === 6000L, s"MCV hit uses the measured frequency: $hotRows")
    assert(coldRows < 100L, s"non-MCV value gets the residual mass: $coldRows")
    // IN mixes measured and residual estimates per value
    val inRows = Selectivity.estimateRows(
      Seq(In("cat", Array("hot", "cold_7"))), st, schema)
    assert(inRows >= 6000L && inRows < 6100L, s"IN estimate $inRows")
    // MCVs survive the stats-file round trip
    val reread = GraftTable.open(spark, loc).stats().get
    assert(reread.columns("cat").mcvs.toMap.get("hot") === Some(6000L))
    // ambiguously-rendered value types (timestamps: toString appends
    // '.0'; floats/decimals: trailing zeros) must NOT take the MCV path:
    // a spurious miss would hand a hot value the near-zero residual —
    // they get the uniform 1/ndv estimate instead
    val tsStats = GraftTable.TableStats(10000L, 1L << 20, Map(
      "ts" -> GraftTable.ColumnStats("2024-01-01 00:00:00", "2024-01-10 00:00:00",
        10L, 0L, mcvs = Seq("2024-01-01 00:00:00" -> 9000L))))
    val tsSchema = StructType(Seq(StructField("ts", TimestampType)))
    val tsEst = Selectivity.estimateRows(
      Seq(EqualTo("ts", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))),
      tsStats, tsSchema)
    assert(tsEst === 1000L, s"timestamp eq must fall back to 1/ndv, got $tsEst")
    GraftTable.drop(loc)
  }

  test("ANALYZE histogram bounds make range selectivity skew-aware") {
    val loc = tmpDir("gstats-hist") + "/t"
    import spark.implicits._
    val t = GraftTable.create(spark, loc, StructType(Seq(
      StructField("v", LongType))))
    // quadratic skew: v = i² over i ∈ [0, 10000) — half the rows sit
    // below 1/4 of the [min, max] domain, where uniform interpolation
    // under-counts a low-range filter by 2×
    t.append((0L until 10000L).map(i => Tuple1(i * i)).toDF("v"))
    val st = t.analyze()
    val hist = st.columns("v").hist
    assert(hist.size === GraftTable.HistBuckets + 1, s"bounds: $hist")
    val schema = StructType(Seq(StructField("v", LongType)))
    // true count below 25M (= 5000²): 5000 rows; uniform interpolation
    // off min/max would say 25M/1e8 * 10000 = 2500
    val est = Selectivity.estimateRows(
      Seq(LessThan("v", java.lang.Long.valueOf(25000000L))), st, schema)
    assert(est > 4400L && est < 5600L,
      s"histogram range estimate should be ~5000, got $est")
    // bounds survive the stats-file round trip
    val reread = GraftTable.open(spark, loc).stats().get
    assert(reread.columns("v").hist === hist)
    GraftTable.drop(loc)
  }

  test("DATE histogram bounds flip a skewed date-range join to broadcast (q07's shape)") {
    val loc = tmpDir("gstats-dhist") + "/t"
    import spark.implicits._
    val t = GraftTable.create(spark, loc, StructType(Seq(
      StructField("d", DateType), StructField("pad", StringType))))
    val base = java.time.LocalDate.parse("2024-01-01")
    // planted skew, q07's date-window shape: 95% of rows in the first
    // ten days of the year, 5% in November/December. Uniform min/max
    // interpolation of `d >= 2024-11-01` says ~15% of the year's span;
    // the truth is 5%.
    t.append((0 until 20000).map { i =>
      val d =
        if (i % 100 < 95) base.plusDays(i % 10)
        else base.plusDays(305 + (i % 55))
      (java.sql.Date.valueOf(d), "x" * 200)
    }.toDF("d", "pad"))
    val st = t.analyze()
    assert(st.columns("d").hist.size === GraftTable.HistBuckets + 1,
      s"date bounds: ${st.columns("d").hist}")
    val schema = StructType(Seq(
      StructField("d", DateType), StructField("pad", StringType)))
    val probe = java.sql.Date.valueOf("2024-11-01")
    val withHist = Selectivity.estimateRows(
      Seq(GreaterThanOrEqual("d", probe)), st, schema)
    // same stats with the histogram stripped = the old uniform path
    val stripped = st.copy(columns = st.columns.map { case (k, cs) =>
      k -> cs.copy(hist = Nil) })
    val uniform = Selectivity.estimateRows(
      Seq(GreaterThanOrEqual("d", probe)), stripped, schema)
    // truth is 1000. The histogram resolves the probe into the last
    // bucket (6.25% of rows); within-bucket linear interpolation can
    // under-read a tail concentrated at the bucket's far end — the same
    // known property as PG's ineq_histogram_selectivity — but it must
    // land well BELOW the uniform over-count and closer to the truth.
    assert(withHist < 1600L, s"histogram date estimate too high: $withHist")
    assert(uniform > 2400L, s"uniform interpolation must over-count, got $uniform")
    assert(math.abs(withHist - 1000L) < math.abs(uniform - 1000L),
      s"histogram ($withHist) must beat uniform ($uniform) against truth 1000")

    // the planner acts on it: pick a broadcast threshold BETWEEN the
    // two estimates' sizes — only the histogram-informed estimate fits
    def scanStats(): (Option[BigInt], BigInt) = {
      val df = spark.read.format("graft").load(loc).filter(col("d") >= lit(probe))
      val s = df.queryExecution.optimizedPlan.collect {
        case r: DataSourceV2ScanRelation => r.stats
      }.head
      (s.rowCount, s.sizeInBytes)
    }
    val (postRows, postSize) = scanStats()
    assert(postRows.exists(r => r < 1600), s"plan rows $postRows")
    val perRow = postSize.toDouble / postRows.get.toDouble
    val threshold = (postSize * 2).toString
    assert(uniform * perRow > postSize.toDouble * 2,
      "the uniform estimate must sit ABOVE the chosen threshold for the flip to be real")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    try {
      val big = spark.range(200000).toDF("k2")
        .withColumn("d2", date_add(lit(probe), (col("k2") % 55).cast("int")))
      val joined = big.join(
        spark.read.format("graft").load(loc).filter(col("d") >= lit(probe)),
        col("d2") === col("d"))
      val plan = joined.queryExecution.sparkPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"date-filtered graft side should broadcast with histogram stats:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    GraftTable.drop(loc)
  }

  test("STRING histogram bounds make string-range selectivity skew-aware") {
    val loc = tmpDir("gstats-shist") + "/t"
    import spark.implicits._
    val t = GraftTable.create(spark, loc, StructType(Seq(
      StructField("s", StringType))))
    // 90% of values start with 'a', 10% with 'z' — byte-proxy min/max
    // interpolation puts `s > 'm'` at ~half the domain; the truth is 10%
    t.append((0 until 20000).map { i =>
      if (i % 10 < 9) f"aaa_$i%06d" else f"zz_$i%06d"
    }.toDF("s"))
    val st = t.analyze()
    val hist = st.columns("s").hist
    assert(hist.size === GraftTable.HistBuckets + 1, s"string bounds: $hist")
    val schema = StructType(Seq(StructField("s", StringType)))
    val withHist = Selectivity.estimateRows(Seq(GreaterThan("s", "m")), st, schema)
    assert(withHist > 1200L && withHist < 2800L,
      s"string histogram estimate should be ~2000, got $withHist")
    // without bounds, the proxy interpolation across [min, max] misreads
    val stripped = st.copy(columns = st.columns.map { case (k, cs) =>
      k -> cs.copy(hist = Nil) })
    val uniform = Selectivity.estimateRows(Seq(GreaterThan("s", "m")), stripped, schema)
    assert(uniform > 6000L, s"proxy min/max interpolation over-counts, got $uniform")
    // bounds survive the stats-file round trip
    val reread = GraftTable.open(spark, loc).stats().get
    assert(reread.columns("s").hist === hist)
    GraftTable.drop(loc)
  }

  test("wide-schema ANALYZE: MCV counting chunks into bounded aggregate jobs") {
    val loc = tmpDir("gstats-wide") + "/t"
    val nCols = 100
    // 100 columns × 5 candidate values each = 500 exact-count
    // expressions — far past one codegen'd aggregate's comfort; the
    // chunked pass-2 must still produce exact MCVs for every column
    val schema = StructType((0 until nCols).map(j =>
      StructField(s"c$j", IntegerType)))
    val t = GraftTable.create(spark, loc, schema)
    val rows = (0 until 200).map { i =>
      org.apache.spark.sql.Row.fromSeq((0 until nCols).map(j => (i + j) % 5))
    }
    t.append(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema))
    val st = t.analyze()
    (0 until nCols by 17).foreach { j =>
      val mcv = st.columns(s"c$j").mcvs.toMap
      assert(mcv.size === 5, s"c$j MCVs: $mcv")
      assert(mcv.values.forall(_ === 40L), s"c$j exact counts: $mcv")
    }
    GraftTable.drop(loc)
  }

  test("sampled ANALYZE: stats within tolerance of the full scan, broadcast flip intact") {
    val loc = tmpDir("gstats-sample") + "/fact"
    import spark.implicits._
    val t = GraftTable.create(spark, loc, StructType(Seq(
      StructField("k", IntegerType),
      StructField("grp", IntegerType),
      StructField("n", IntegerType),
      StructField("pad", StringType))))
    // several files so file-grain sampling has something to choose from;
    // n is null on ~25% of rows to exercise null-count scaling
    for (b <- 0 until 8) {
      t.append((0 until 2500).map { i =>
        val id = b * 2500 + i
        (id, id % 50, if (id % 4 == 0) null.asInstanceOf[Integer]
          else Integer.valueOf(id % 100), "x" * 100)
      }.toDF("k", "grp", "n", "pad"))
    }
    val full = t.analyze()
    val sampled = t.analyze(sampleFraction = 0.25)
    // the row count is EXACT (from metadata), never sampled
    assert(sampled.rowCount === 20000L)
    // scaled null count within 20% of truth (5000)
    val nNulls = sampled.columns("n").nullCount
    assert(nNulls > 4000L && nNulls < 6000L, s"scaled null count $nNulls")
    // low-cardinality domains are fully seen by the sample (saturation
    // regime of the NDV estimator)
    assert(sampled.columns("grp").ndv === full.columns("grp").ndv)
    // high-cardinality columns extrapolate linearly: k is all-distinct
    val kNdv = sampled.columns("k").ndv
    assert(kNdv > 15000L && kNdv <= 20000L, s"extrapolated ndv $kNdv")
    // and the planner still flips the filtered join to broadcast off
    // SAMPLED stats — the reference ANALYZE's whole purpose
    def filteredSize(): BigInt = {
      val df = spark.read.format("graft").load(loc).filter(col("grp") === 3)
      df.queryExecution.optimizedPlan.collect {
        case r: DataSourceV2ScanRelation => r.stats.sizeInBytes
      }.head
    }
    val postSize = filteredSize()
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (postSize * 2).toString)
    try {
      val big = spark.range(200000).toDF("k2")
      val joined = big.join(
        spark.read.format("graft").load(loc).filter(col("grp") === 3), $"k2" === $"k")
      assert(joined.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"),
        "filtered graft side should broadcast off sampled stats")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    intercept[IllegalArgumentException] { t.analyze(sampleFraction = 0.0) }
    intercept[IllegalArgumentException] { t.analyze(sampleFraction = 1.5) }
    GraftTable.drop(loc)
  }

  test("CALL graft.system.analyze_sample collects sampled stats") {
    val wh = tmpDir("gstats-proc-wh")
    spark.conf.set("spark.sql.catalog.gsp", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsp.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE gsp.db")
      spark.sql("CREATE TABLE gsp.db.t (a INT, b STRING) USING graft")
      spark.sql("INSERT INTO gsp.db.t SELECT id, concat('v', id) FROM range(1000)")
      val out = spark.sql("CALL gsp.system.analyze_sample('db.t', 0.5)").collect()
      assert(out.head.getLong(2) === 1000L, "rows_analyzed is the exact count")
      val st = GraftTable.open(spark, s"$wh/db/t").stats()
      assert(st.exists(_.rowCount == 1000L))
      assert(st.get.columns("a").ndv > 0L)
      spark.sql("DROP TABLE gsp.db.t")
    } finally {
      spark.conf.unset("spark.sql.catalog.gsp")
      spark.conf.unset("spark.sql.catalog.gsp.warehouse")
    }
  }

  test("SQL ANALYZE TABLE routes through GraftTable.analyze") {
    // extensions bind at session construction: build a sibling session on
    // the same SparkContext with the graft extensions installed
    // (spark.sql.extensions is a static conf, so for an already-running
    // context the programmatic withExtensions form is the way in)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .withExtensions(new GraftExtensions())
      .getOrCreate()
    try {
      val wh = tmpDir("gstats-wh")
      s2.conf.set("spark.sql.catalog.gan", classOf[GraftCatalog].getName)
      s2.conf.set("spark.sql.catalog.gan.warehouse", wh)
      s2.sql("CREATE NAMESPACE gan.db")
      s2.sql("CREATE TABLE gan.db.t (a INT, b STRING) USING graft")
      s2.sql("INSERT INTO gan.db.t SELECT id, concat('v', id) FROM range(1000)")
      assert(GraftTable.open(s2, s"$wh/db/t").stats().isEmpty)
      s2.sql("ANALYZE TABLE gan.db.t COMPUTE STATISTICS")
      val st = GraftTable.open(s2, s"$wh/db/t").stats()
      assert(st.exists(_.rowCount == 1000L), s"stats after SQL ANALYZE: $st")
      assert(st.get.columns("a").ndv > 900L)
      // NOSCAN refreshes counts without dropping column stats
      s2.sql("INSERT INTO gan.db.t SELECT id, 'z' FROM range(10)")
      s2.sql("ANALYZE TABLE gan.db.t COMPUTE STATISTICS NOSCAN")
      val st2 = GraftTable.open(s2, s"$wh/db/t").stats()
      assert(st2.exists(_.rowCount == 1010L))
      assert(st2.get.columns("a").ndv > 900L, "NOSCAN must keep column stats")
      s2.sql("DROP TABLE gan.db.t")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }

  test("EXPLAIN on a graft scan prints the table's storage metadata") {
    import spark.implicits._
    val loc = tmpDir("gexplain") + "/tbl"
    val t = GraftTable.create(spark, loc, StructType(Seq(
      StructField("a", IntegerType))), graft.storage.GraftTableOptions(compression = "snappy"))
    t.append(Seq(1, 2, 3).toDF("a"))
    val explain = spark.read.format("graft").load(loc)
      .queryExecution.explainString(org.apache.spark.sql.execution.ExtendedMode)
    for (key <- Seq("GraftLocation", "GraftFiles", "GraftRows", "GraftSizeBytes",
        "GraftCompression")) {
      assert(explain.contains(key), s"EXPLAIN missing $key:\n$explain")
    }
    assert(explain.contains("snappy"))
    GraftTable.drop(loc)
  }
}
