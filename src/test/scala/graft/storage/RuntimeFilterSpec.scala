package graft.storage

import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Runtime (join-driven) file pruning: the graft DSv2 scan implements
  * `SupportsRuntimeV2Filtering`, so a broadcast join's build-side key
  * set reaches the file-level zone maps AT EXECUTION TIME and drops
  * whole files before their tasks are scheduled — dynamic partition
  * pruning for a table with no partition columns. */
class RuntimeFilterSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("v", StringType)))

  /** Three files with disjoint id ranges 0-99 / 1000-1099 / 2000-2099. */
  private def mkTable(prefix: String): GraftTable = {
    import spark.implicits._
    val loc = tmpDir(prefix) + "/tbl"
    val t = GraftTable.create(spark, loc, schema)
    for (base <- Seq(0, 1000, 2000))
      t.append((base until base + 100).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    t
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame): SupportsRuntimeV2Filtering =
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan
    }.getOrElse(fail("no BatchScanExec in plan")) match {
      case s: SupportsRuntimeV2Filtering => s
      case other => fail(s"graft scan must support runtime filtering, got $other")
    }

  test("scan declares filterable columns and prunes files on a runtime IN") {
    val t = mkTable("rtf-mech")
    val df = spark.read.format("graft").load(t.location)
    val scan = scanOf(df)
    assert(scan.filterAttributes().map(_.fieldNames.head).toSet === Set("id", "v"))

    def partitionCount: Int = scan.toBatch.planInputPartitions().length
    val before = partitionCount
    assert(before === 3, "one planned partition per file before filtering")

    // runtime IN on ids that only the middle file can contain
    scan.filter(Array(new Predicate("IN",
      Array(Expressions.column("id"),
        Expressions.literal(1005), Expressions.literal(1050)))))
    assert(partitionCount === 1, "two refuted files must drop out")

    // a key set outside every file's range prunes the whole scan
    scan.filter(Array(new Predicate("IN",
      Array(Expressions.column("id"), Expressions.literal(555555)))))
    assert(partitionCount === 0)
    GraftTable.drop(t.location)
  }

  test("broadcast join injects a runtime filter; result stays exact") {
    val t = mkTable("rtf-join")
    import spark.implicits._
    val fact = spark.read.format("graft").load(t.location)
    // dim spans every fact range; the SELECTIVE predicate (grp = 'mid')
    // keeps only the middle file's keys — the classic DPP shape. The dim
    // must be FILE-backed: a local relation constant-folds its filter
    // away before the pruning rule looks for a selective predicate.
    val dimPath = tmpDir("rtf-dim") + "/dim.parquet"
    (0 until 3000).map(i =>
      (i, if (i >= 1000 && i < 1100) "mid" else s"g${i % 7}")).toDF("k", "grp")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    withDppConfs {
      val joined = fact.join(broadcast(dim.filter(col("grp") === "mid")),
        col("id") === col("k"))
      val rows = joined.count()
      assert(rows === 100L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("dynamicpruning"),
        s"expected a runtime filter on the graft scan:\n${plan.take(3000)}")
    }
    GraftTable.drop(t.location)
  }

  private def withDppConfs[T](f: => T): T = {
    val keys = Seq(
      "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      // test tables are bytes-sized; the benefit heuristic needs a shove
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "100000")
    val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
