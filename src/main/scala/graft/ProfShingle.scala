package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated microbench for the shingle-family expressions (optimization
  * round 18, guide §1): times ONLY the expression-bearing stage — scan →
  * expression → cheap aggregate — over the documents table, several
  * repetitions, so the per-expression cost is separable from the noisy
  * end-to-end entries (whose CPU readings swing ±30% with GC accounting
  * in a shared JVM). Reps after the first are steady state. */
object ProfShingle {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("PROF_REPS", "5").toInt
    val spark = SparkSession.builder()
      .withExtensions(new graft.sources.GraftExtensions())
      .master(s"local[$cpus]")
      .appName("graft-profshingle")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(Tables.sessionConfs)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def cpuSec: Double = osBean.getProcessCpuTime / 1e9

    val docs = Tables.fanned(
      Tables.load(spark, sfDir, "documents")
        .select(col("doc_id").cast("long").as("doc_id"), col("text")),
      "doc_id")

    import graft.functions.Shingles._
    import graft.functions.SimhashText.simhashFast
    val stages: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "shingles_distinct" -> docs.select(
        explode(shinglesDistinctFast(col("text"))).as("s"))
        .select(sum(length(col("s")))),
      "shingles_all" -> docs.select(
        explode(shinglesFast(col("text"), 3)).as("s"))
        .select(sum(length(col("s")))),
      "gram_hashes" -> docs.select(
        explode(gramHashesFast(col("text"), 10, 1000000007L)).as("h"))
        .select(sum(col("h"))),
      "simhash" -> docs.select(
        simhashFast(col("text"), 3, 998244353L, 48).as("x"))
        .select(sum(col("x"))))

    stages.foreach { case (name, df) =>
      (1 to reps).foreach { r =>
        val w0 = System.nanoTime(); val c0 = cpuSec
        val v = df.collect()(0).get(0)
        println(f"[profshingle] $name%-18s rep$r wall ${(System.nanoTime() - w0) / 1e9}%6.3f cpu ${cpuSec - c0}%7.3f v=$v")
      }
    }
    spark.stop()
  }
}
