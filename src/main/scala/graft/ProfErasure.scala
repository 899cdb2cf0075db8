package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Erasure-cost profile (VERDICT r12 #6): SCALE_r15 §12d measured the
  * DV-aware probe scan only in the ZERO-deletion case; this main pins
  * the documented cost model — probe/audit walls ∝ deleted mass, not
  * index size — by cloning the dir's committed int8+PQ index root and
  * measuring s17/s9 probe, audit, and repair walls at 0%, 1%, and 10%
  * of vectors erased (merge-on-read sidecars; erasure batches chunked
  * under the 65536 bound). Run at 1× (sf0.1) and on the MakeScale
  * 100× copy for the scale exponent.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.ProfErasure */
object ProfErasure {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config(Tables.sessionConfs).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import graft.operators.Similarity
    import graft.storage.GraftTable

    // force the composed build (postings/centroids + PQ + int8 + bin)
    Similarity.s9AnnIvfPq(spark, dir).count()
    Similarity.s17AnnInt8Persisted(spark, dir).count()
    Similarity.s22AnnBinPersisted(spark, dir).count()
    val root = Similarity.int8IndexDir(spark, dir)
    // clone — the memoized root must never be mutated in place
    val work = java.nio.file.Files.createTempDirectory("prof-erasure").toString
    Seq("centroids", "postings", "codebook", "codes", "i8meta", "codes_i8",
      "codes_bin").foreach(t =>
      GraftTable.open(spark, s"$root/$t").cloneTo(s"$work/$t"))
    val post = GraftTable.open(spark, s"$work/postings")
    val q = post.read().filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
      .persist()
    q.count()
    val n = post.rowCountFromMetadata()
    println(s"[prof-erasure] dir=$dir vectors=$n")

    def timeIt(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[prof-erasure] $label%-24s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
    }
    def probes(tag: String): Unit = {
      timeIt(s"s17_probe_$tag") { Similarity.probeIvfInt8(spark, work, q).count(); () }
      timeIt(s"s9_probe_$tag") { Similarity.probeIvfPq(spark, work, q).count(); () }
      timeIt(s"s22_probe_$tag") { Similarity.probeIvfBin(spark, work, q).count(); () }
      timeIt(s"audit_int8_$tag") { Similarity.verifyInt8Index(spark, work); () }
      timeIt(s"repair_int8_$tag") { Similarity.repairInt8Index(spark, work); () }
    }
    probes("0pct")

    // victim ids: everything except the query batch, deterministic order
    val all = post.read().select("vec_id").filter(col("vec_id") >= 5)
      .orderBy("vec_id").collect().map(_.getLong(0))
    def chunked(ids: Array[Long]): Unit =
      ids.grouped(60000).foreach { c =>
        Similarity.deleteFromIndex(spark, work, c.toSeq); ()
      }
    val onePct = all.take((n / 100).toInt.max(1))
    timeIt("erase_1pct") { chunked(onePct) }
    probes("1pct")
    val toTen = all.slice(onePct.length, (n / 10).toInt)
    timeIt("erase_to_10pct") { chunked(toTen) }
    probes("10pct")
    spark.stop()
  }
}
