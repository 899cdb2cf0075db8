package graft.sources

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.storage.GraftTable

/** Storage-partitioned joins over bucketed graft tables — the 100 TB
  * fact-fact join with NO exchange on either side. `bucket_by` routes
  * every written file to one hash bucket of the key; the scan reports
  * `KeyGroupedPartitioning(bucket(n, key))`, the catalog's registered
  * `bucket` function proves both sides co-partitioned, and Spark plans
  * the join shuffle-free (the Iceberg SPJ contract, on graft storage).
  * The invariant must survive the full maintenance surface — compaction
  * and SQL DML rewrite through the same value-deterministic route — and
  * must degrade to a plain (shuffled, still correct) join whenever the
  * handshake can't be proven. */
class StoragePartitionedJoinSpec extends SparkSpec {

  private lazy val warehouse: String = tmpDir("graft-spj")

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.catalog.spj", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.spj.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS spj.db")
  }

  /** Count shuffle exchanges in the executed plan. AQE wraps materialized
    * stages in QueryStageExec LEAVES (their subtree hangs off `.plan`, not
    * `children` — Spark 4's ResultQueryStage root included), so a plain
    * `collect` sees nothing: recurse through the stages explicitly. */
  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
      case e: ShuffleExchangeExec => 1 + e.children.map(walk).sum
      case other => other.children.map(walk).sum
    }
    df.collect() // materialize so the AQE-final plan is what we inspect
    walk(df.queryExecution.executedPlan)
  }

  /** Run `body` with SPJ planning enabled and broadcasting off. */
  private def withSpj(body: => Unit): Unit =
    withConf("spark.sql.sources.v2.bucketing.enabled", "true") {
      withConf("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true") {
        withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
          body
        }
      }
    }

  private def bucketViolations(location: String, n: Int,
      of: Any => Int): Seq[String] = {
    val t = GraftTable.open(spark, location)
    t.committedFiles.flatMap { f =>
      val b = GraftTable.fileBucket(f)
      if (b.isEmpty) Seq(s"$f: no bucket tag")
      else spark.read.parquet(f).select(col(t.options.bucketBy.head)).collect()
        .toSeq.filter(r => of(r.get(0)) != b.get)
        .map(r => s"$f: key ${r.get(0)} not in bucket ${b.get}")
    }
  }

  test("co-bucketed long-key tables join with zero exchanges, exact result") {
    import spark.implicits._
    spark.sql("CREATE TABLE spj.db.fact (k BIGINT, v STRING) USING graft " +
      "CLUSTERED BY (k) INTO 8 BUCKETS")
    spark.sql("CREATE TABLE spj.db.dim (k BIGINT, w DOUBLE) USING graft " +
      "OPTIONS (bucket_by 'k', bucket_count '8')")
    spark.range(0, 10000).select($"id".as("k"), concat(lit("v"), $"id").as("v"))
      .writeTo("spj.db.fact").append()
    spark.range(0, 10000).filter($"id" % 3 === 0)
      .select($"id".as("k"), ($"id" * 1.5).as("w"))
      .writeTo("spj.db.dim").append()

    withSpj {
      val j = spark.sql(
        "SELECT a.k, a.v, b.w FROM spj.db.fact a JOIN spj.db.dim b ON a.k = b.k")
      assert(shuffles(j) === 0, "co-bucketed join must not exchange")
      val got = j.as[(Long, String, Double)].collect().toSet
      val expect = (0L until 10000L).filter(_ % 3 == 0)
        .map(k => (k, s"v$k", k * 1.5)).toSet
      assert(got === expect)
    }

    // same join with SPJ explicitly OFF (it defaults ON in Spark 4):
    // default shuffled path, same rows
    withConf("spark.sql.sources.v2.bucketing.enabled", "false") {
      withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
        val j = spark.sql(
          "SELECT a.k, a.v, b.w FROM spj.db.fact a JOIN spj.db.dim b ON a.k = b.k")
        assert(shuffles(j) === 2, "without v2 bucketing the plan shuffles both sides")
        assert(j.count() === 3334)
      }
    }
  }

  /** Count SortExec nodes (AQE-aware, like [[shuffles]]). */
  private def sorts(df: org.apache.spark.sql.DataFrame): Int = {
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
      case s: org.apache.spark.sql.execution.SortExec => 1 + s.children.map(walk).sum
      case other => other.children.map(walk).sum
    }
    df.collect()
    walk(df.queryExecution.executedPlan)
  }

  test("bucket_by + sort_by: merge join with zero sorts AND zero shuffles") {
    import spark.implicits._
    spark.sql("CREATE TABLE spj.db.oa (k BIGINT, v DOUBLE) USING graft " +
      "CLUSTERED BY (k) INTO 4 BUCKETS OPTIONS (sort_by 'k')")
    spark.sql("CREATE TABLE spj.db.ob (k BIGINT, w DOUBLE) USING graft " +
      "CLUSTERED BY (k) INTO 4 BUCKETS OPTIONS (sort_by 'k')")
    spark.range(0, 20000).select($"id".as("k"), ($"id" * 0.5).as("v"))
      .writeTo("spj.db.oa").append()
    spark.range(0, 20000).filter($"id" % 2 === 0)
      .select($"id".as("k"), ($"id" * 2.0).as("w")).writeTo("spj.db.ob").append()

    // the scan's rows must ACTUALLY arrive sorted per partition — a wrong
    // ordering claim would silently corrupt the merge join
    val perPartitionSorted = spark.table("spj.db.oa").select("k")
      .rdd.mapPartitions { it =>
        val ks = it.map(_.getLong(0)).toSeq
        Iterator.single(ks == ks.sorted)
      }.collect()
    assert(perPartitionSorted.forall(identity), "claimed order must be real")

    withSpj {
      val j = spark.sql("SELECT a.k, a.v, b.w FROM spj.db.oa a JOIN spj.db.ob b ON a.k = b.k")
      assert(shuffles(j) === 0 && sorts(j) === 0,
        "zone-map-proven order: merge join needs neither exchange nor sort")
      val got = j.as[(Long, Double, Double)].collect().toSet
      val expect = (0L until 20000L by 2).map(k => (k, k * 0.5, k * 2.0)).toSet
      assert(got === expect)
    }

    // a RANGE-DISJOINT second append keeps the claim (files concatenate
    // in min-order); an OVERLAPPING third append drops it — that side
    // re-sorts, the clean side still doesn't
    spark.range(20000, 21000).select($"id".as("k"), ($"id" * 0.5).as("v"))
      .writeTo("spj.db.oa").append()
    withSpj {
      val j = spark.sql("SELECT a.k, b.w FROM spj.db.oa a JOIN spj.db.ob b ON a.k = b.k")
      assert(sorts(j) === 0, "disjoint appends preserve the per-bucket order proof")
    }
    spark.range(500, 600).select($"id".as("k"), ($"id" * 0.5).as("v"))
      .writeTo("spj.db.oa").append()
    withSpj {
      val j = spark.sql("SELECT a.k, b.w FROM spj.db.oa a JOIN spj.db.ob b ON a.k = b.k")
      assert(shuffles(j) === 0, "overlap affects ordering, not co-partitioning")
      assert(sorts(j) === 1, "only the overlapping side re-sorts")
      assert(j.count() === 10050, "10000 even keys + 50 even keys of the dup range")
    }
  }

  test("groupBy on the bucket column aggregates with zero exchanges") {
    // KeyGroupedPartitioning satisfies the aggregate's ClusteredDistribution
    // too: at 100 TB a per-key rollup of a bucketed fact table is a pure
    // map-side pass — partial and final HashAggregate fuse in one stage
    // directly over the scan, no shuffle at all
    import spark.implicits._
    withSpj {
      val agg = spark.table("spj.db.fact").groupBy($"k")
        .agg(count(lit(1)).as("n"), max($"v").as("mv"))
      assert(shuffles(agg) === 0, "bucket-column aggregation must not exchange")
      val got = agg.as[(Long, Long, String)].collect()
      assert(got.length === 10000 && got.forall(_._2 == 1L))
    }
  }

  test("every committed file is bucket-pure (the write-path invariant)") {
    val bad = bucketViolations(s"$warehouse/db/fact", 8,
      v => GraftTable.bucketOfLong(v.asInstanceOf[Long], 8))
    assert(bad.isEmpty, bad.take(5).mkString("; "))
  }

  test("string-key bucketing: crc32 route, SPJ holds, nulls land in bucket 0") {
    import spark.implicits._
    spark.sql("CREATE TABLE spj.db.sa (name STRING, v INT) USING graft " +
      "CLUSTERED BY (name) INTO 4 BUCKETS")
    spark.sql("CREATE TABLE spj.db.sb (name STRING, w INT) USING graft " +
      "CLUSTERED BY (name) INTO 4 BUCKETS")
    val names = (0 until 500).map(i => s"user-$i")
    (names.map(n => (Option(n), n.length)) :+ (None, -1)).toDF("name", "v")
      .writeTo("spj.db.sa").append()
    names.filter(_.hashCode % 2 == 0).map(n => (n, n.length * 10)).toDF("name", "w")
      .writeTo("spj.db.sb").append()

    val bad = bucketViolations(s"$warehouse/db/sa", 4, {
      case null => 0
      case s: String =>
        GraftTable.bucketOfUtf8(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), 4)
    })
    assert(bad.isEmpty, bad.take(5).mkString("; "))

    withSpj {
      val j = spark.sql(
        "SELECT a.name, a.v, b.w FROM spj.db.sa a JOIN spj.db.sb b ON a.name = b.name")
      assert(shuffles(j) === 0, "co-bucketed string join must not exchange")
      val got = j.as[(String, Int, Int)].collect().toSet
      val expect = names.filter(_.hashCode % 2 == 0)
        .map(n => (n, n.length, n.length * 10)).toSet
      assert(got === expect)
    }
  }

  test("date-key bucketing: days-since-epoch route, SPJ holds, pruning works") {
    import spark.implicits._
    spark.sql("CREATE TABLE spj.db.da (d DATE, v INT) USING graft " +
      "CLUSTERED BY (d) INTO 4 BUCKETS")
    spark.sql("CREATE TABLE spj.db.db2 (d DATE, w INT) USING graft " +
      "CLUSTERED BY (d) INTO 4 BUCKETS")
    val days = (0 until 200).map(i => java.time.LocalDate.of(2024, 1, 1).plusDays(i))
    days.map(d => (java.sql.Date.valueOf(d), d.getDayOfYear)).toDF("d", "v")
      .writeTo("spj.db.da").append()
    days.filter(_.getDayOfMonth <= 10)
      .map(d => (java.sql.Date.valueOf(d), d.getMonthValue)).toDF("d", "w")
      .writeTo("spj.db.db2").append()

    val bad = bucketViolations(s"$warehouse/db/da", 4, {
      case null => 0
      case d: java.sql.Date => GraftTable.bucketOfLong(d.toLocalDate.toEpochDay, 4)
      case d: java.time.LocalDate => GraftTable.bucketOfLong(d.toEpochDay, 4)
    })
    assert(bad.isEmpty, bad.take(5).mkString("; "))

    withSpj {
      val j = spark.sql(
        "SELECT a.d, a.v, b.w FROM spj.db.da a JOIN spj.db.db2 b ON a.d = b.d")
      assert(shuffles(j) === 0, "co-bucketed date join must not exchange")
      assert(j.count() === days.count(_.getDayOfMonth <= 10))
    }

    // point-lookup pruning by the route function on the date column
    val t = GraftTable.open(spark, s"$warehouse/db/da")
    val probe = java.sql.Date.valueOf("2024-02-15")
    val kept = t.prunedFiles(Seq(org.apache.spark.sql.sources.EqualTo("d", probe)))
    assert(kept.nonEmpty && kept.forall(f => GraftTable.fileBucket(f).contains(
      GraftTable.bucketOfLong(probe.toLocalDate.toEpochDay, 4))))
    val got = spark.sql("SELECT v FROM spj.db.da WHERE d = DATE'2024-02-15'")
      .as[Int].collect()
    assert(got.toSeq === Seq(46))
  }

  test("compaction preserves bucket purity and the shuffle-free join") {
    import spark.implicits._
    // many small appends -> compact -> files re-routed by the same function
    val t = GraftTable.open(spark, s"$warehouse/db/dim")
    (1 to 3).foreach { i =>
      spark.range(10000L * i, 10000L * i + 50)
        .select($"id".as("k"), ($"id" * 1.5).as("w"))
        .writeTo("spj.db.dim").append()
    }
    t.compact()
    val bad = bucketViolations(s"$warehouse/db/dim", 8,
      v => GraftTable.bucketOfLong(v.asInstanceOf[Long], 8))
    assert(bad.isEmpty, bad.take(5).mkString("; "))
    withSpj {
      val j = spark.sql(
        "SELECT a.k, b.w FROM spj.db.fact a JOIN spj.db.dim b ON a.k = b.k")
      assert(shuffles(j) === 0, "compacted bucketed join must stay exchange-free")
      assert(j.count() === 3334, "compaction must not change the join result")
    }
  }

  test("SQL MERGE/DELETE rewrite preserves bucket purity and SPJ") {
    import spark.implicits._
    spark.sql("CREATE TABLE spj.db.mut (k BIGINT, v STRING) USING graft " +
      "CLUSTERED BY (k) INTO 8 BUCKETS")
    spark.range(0, 2000).select($"id".as("k"), lit("old").as("v"))
      .writeTo("spj.db.mut").append()
    spark.range(1500, 2500).select($"id".as("k"), lit("new").as("v"))
      .createOrReplaceTempView("mut_src")
    spark.sql(
      """MERGE INTO spj.db.mut t USING mut_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin)
    spark.sql("DELETE FROM spj.db.mut WHERE k % 100 = 7")

    val bad = bucketViolations(s"$warehouse/db/mut", 8,
      v => GraftTable.bucketOfLong(v.asInstanceOf[Long], 8))
    assert(bad.isEmpty, bad.take(5).mkString("; "))

    withSpj {
      val j = spark.sql(
        "SELECT a.k, a.v, b.v AS bv FROM spj.db.mut a JOIN spj.db.mut b ON a.k = b.k")
      assert(shuffles(j) === 0, "post-DML bucketed self-join must stay exchange-free")
    }
    val rows = spark.table("spj.db.mut").as[(Long, String)].collect().toMap
    assert(rows.size === 2500 - 25, "2500 keys minus the 25 deleted k%100=7 keys")
    assert(rows(100L) === "old" && rows(1600L) === "new" && rows(2400L) === "new")
    assert(!rows.contains(207L))
  }

  test("mismatched bucket counts degrade to a shuffled, correct join") {
    import spark.implicits._
    spark.sql("CREATE TABLE spj.db.dim16 (k BIGINT, w DOUBLE) USING graft " +
      "CLUSTERED BY (k) INTO 16 BUCKETS")
    spark.range(0, 1000).select($"id".as("k"), ($"id" * 2.0).as("w"))
      .writeTo("spj.db.dim16").append()
    withSpj {
      val j = spark.sql(
        "SELECT a.k, b.w FROM spj.db.fact a JOIN spj.db.dim16 b ON a.k = b.k")
      assert(shuffles(j) > 0, "8- vs 16-bucket tables are not co-partitioned")
      assert(j.count() === 1000)
    }
  }

  test("bucket pruning: a point lookup reads only its bucket's files") {
    // zone maps are useless on the bucket column (k % n makes every file
    // span the key range) — the route function itself prunes instead
    import spark.implicits._
    val t = GraftTable.open(spark, s"$warehouse/db/fact")
    val kept = t.prunedFiles(Seq(org.apache.spark.sql.sources.EqualTo("k", 5000L)))
    assert(kept.size * 8 <= t.committedFiles.size * 2,
      s"a point predicate must keep ~1/8 of the files, kept ${kept.size} of ${t.committedFiles.size}")
    assert(kept.forall(f => GraftTable.fileBucket(f).contains(
      GraftTable.bucketOfLong(5000L, 8))))

    val keptIn = t.prunedFiles(Seq(
      org.apache.spark.sql.sources.In("k", Array(5000L, 5001L))))
    assert(keptIn.map(f => GraftTable.fileBucket(f).get).toSet ===
      Set(GraftTable.bucketOfLong(5000L, 8), GraftTable.bucketOfLong(5001L, 8)))

    // a null probe or a non-equality shape keeps everything (conservative)
    val keptNull = t.prunedFiles(Seq(org.apache.spark.sql.sources.EqualTo("k", null)))
    assert(keptNull.size === t.committedFiles.size)

    // and the pruning is CORRECT end-to-end through SQL
    val got = spark.sql("SELECT v FROM spj.db.fact WHERE k = 5000").as[String].collect()
    assert(got.toSeq === Seq("v5000"))
  }

  test("ALTER protects the bucket route; clustering columns drop gracefully") {
    import spark.implicits._
    val loc = tmpDir("alterbucket") + "/t"
    val t = GraftTable.create(spark, loc,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("s", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType))),
      graft.storage.GraftTableOptions(bucketBy = Seq("k"), bucketCount = 4,
        sortBy = Seq("s")))
    t.append(Seq((1, 10L, 1.0), (2, 20L, 2.0)).toDF("k", "s", "v"))

    // structural: the bucket column can neither drop nor leave the
    // integral-widening lane (long→double is coercible but re-routes)
    intercept[IllegalArgumentException] { t.dropColumn("k") }
    intercept[IllegalArgumentException] {
      t.alterColumnType("k", org.apache.spark.sql.types.DoubleType)
    }
    // integral widening preserves floorMod: allowed, and new writes
    // still route to the same buckets as the old files
    t.alterColumnType("k", org.apache.spark.sql.types.LongType)
    t.append(Seq((5L, 50L, 5.0)).toDF("k", "s", "v"))
    // old files read back int32, post-widen files int64 — same route
    val bad = bucketViolations(loc, 4,
      v => GraftTable.bucketOfLong(v.asInstanceOf[Number].longValue(), 4))
    assert(bad.isEmpty, bad.take(5).mkString("; "))

    // sort_by only shapes future writes: dropping its column drops the
    // property instead of stranding the writer
    t.dropColumn("s")
    assert(GraftTable.open(spark, loc).options.sortBy.isEmpty)
    t.append(Seq((6L, 6.0)).toDF("k", "v"))
    assert(GraftTable.open(spark, loc).read().count() === 4)
  }

  test("create-time validation rejects bad bucket specs") {
    intercept[IllegalArgumentException] {
      GraftTable.create(spark, tmpDir("badbucket") + "/t",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("d", org.apache.spark.sql.types.DoubleType))),
        graft.storage.GraftTableOptions(bucketBy = Seq("d"), bucketCount = 4))
    }
    intercept[IllegalArgumentException] {
      graft.storage.GraftTableOptions(bucketBy = Seq("k")).validate()
    }
    intercept[IllegalArgumentException] {
      graft.storage.GraftTableOptions(bucketCount = 4).validate()
    }
    intercept[IllegalArgumentException] {
      graft.storage.GraftTableOptions(
        bucketBy = Seq("k"), bucketCount = 4,
        zorderBy = Seq("a", "b")).validate()
    }
  }
}
