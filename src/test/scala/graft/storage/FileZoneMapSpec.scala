package graft.storage

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** File-level zone maps: per-file min/max/null stats recorded in the
  * graft metadata at append time (from the parquet footers) and used to
  * drop whole files before the scan is planned — the reference's
  * stripe skip list (`cstore_reader.c:744-806`) at file granularity. */
class FileZoneMapSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("name", StringType),
    StructField("d", DateType)))

  private def mkTable(prefix: String): GraftTable = {
    import spark.implicits._
    val loc = tmpDir(prefix) + "/tbl"
    val t = GraftTable.create(spark, loc, schema)
    // three appends = three files with disjoint id ranges
    for (base <- Seq(0, 1000, 2000)) {
      t.append((base until base + 100)
        .map(i => (i, s"n$i", java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i / 10))))
        .toDF("id", "name", "d").coalesce(1))
    }
    t
  }

  test("pruning drops refuted files, keeps possible ones") {
    val t = mkTable("zm-prune")
    assert(t.committedFiles.size === 3)
    // only the middle file can contain 1000 <= id < 1100
    assert(t.prunedFiles(Seq(And(GreaterThanOrEqual("id", 1000),
      LessThan("id", 1100)))).size === 1)
    // equality outside every range prunes everything
    assert(t.prunedFiles(Seq(EqualTo("id", 5000))).isEmpty)
    // strings prune too (binary/ASCII order)
    assert(t.prunedFiles(Seq(GreaterThanOrEqual("name", "n2000"))).size < 3)
    // dates: epoch-day domain conversion
    assert(t.prunedFiles(Seq(LessThan("d",
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(5))))).size === 1)
    // OR is refuted only when both sides are; unknown columns never refute
    assert(t.prunedFiles(Seq(Or(EqualTo("id", 5000), EqualTo("id", 1)))).size === 1)
    assert(t.prunedFiles(Seq(EqualTo("nosuch", 1))).size === 3)
    // no nulls anywhere: IS NULL is refutable, IS NOT NULL is not
    assert(t.prunedFiles(Seq(IsNull("id"))).isEmpty)
    assert(t.prunedFiles(Seq(IsNotNull("id"))).size === 3)
    GraftTable.drop(t.location)
  }

  test("DSv2 scan plans only the surviving files under a pushed filter") {
    val t = mkTable("zm-dsv2")
    val df = spark.read.format("graft").load(t.location)
    def partitionsFor(filtered: org.apache.spark.sql.DataFrame): Int =
      filtered.queryExecution.executedPlan.collectFirst {
        case b: BatchScanExec => b.inputRDD.getNumPartitions
      }.getOrElse(fail("no BatchScanExec in plan"))
    val all = partitionsFor(df.filter(col("id") >= 0))
    val pruned = partitionsFor(df.filter(col("id") === 1500))
    assert(pruned < all, s"zone maps should shrink the planned scan ($pruned vs $all)")
    // and correctness is untouched
    assert(df.filter(col("id") === 1050).count() === 1)
    assert(df.filter(col("id") >= 1000 && col("id") < 1100).count() === 100)
    assert(df.filter(col("id") === 5000).count() === 0)
    GraftTable.drop(t.location)
  }

  test("zone maps survive metadata re-open and clear on truncate") {
    val t = mkTable("zm-reopen")
    val reopened = GraftTable.open(spark, t.location)
    assert(reopened.prunedFiles(Seq(EqualTo("id", 5000))).isEmpty)
    reopened.truncate()
    assert(reopened.prunedFiles(Seq(EqualTo("id", 5000))).isEmpty) // no files at all
    import spark.implicits._
    reopened.append(Seq((1, "a", java.sql.Date.valueOf("2024-01-01")))
      .toDF("id", "name", "d"))
    assert(reopened.prunedFiles(Seq(EqualTo("id", 1))).size === 1)
    GraftTable.drop(t.location)
  }
}
