package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Wall profile of the round-13 index CREATION path: buildIvfIndexFrom
  * + quantizeIndex on each rung over SPARK_GRAFT_SF_DIR's embeddings
  * (run at sf0.1 and the MakeScale 100× copy for the scale exponent) —
  * pins that the build is ∝ corpus (Lloyd passes + one clustered
  * write) and that a probe through each freshly GROWN rung stays
  * probe-priced. */
object ProfBuild {
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
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val root = java.nio.file.Files.createTempDirectory("prof-build").toString
    def timeIt(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[prof-build] $label%-18s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
    }
    println(s"[prof-build] dir=$dir vectors=${vecs.count()}")
    timeIt("build_ivf") {
      Similarity.buildIvfIndexFrom(spark, vecs, root, nLists = 16); ()
    }
    Seq("bin", "int8", "pq").foreach { rung =>
      timeIt(s"quantize_$rung") { Similarity.quantizeIndex(spark, root, rung); () }
    }
    val q = GraftTable.open(spark, s"$root/postings").read()
      .filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
      .persist()
    q.count()
    timeIt("probe_fp") { Similarity.probeIvf(spark, root, q).count(); () }
    timeIt("probe_bin") { Similarity.probeIvfBin(spark, root, q).count(); () }
    timeIt("probe_int8") { Similarity.probeIvfInt8(spark, root, q).count(); () }
    timeIt("probe_pq") { Similarity.probeIvfPq(spark, root, q).count(); () }
    spark.stop()
  }
}
