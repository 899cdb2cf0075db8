package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Wall profile of the round-13 index MAINTENANCE verbs: build an index
  * over SPARK_GRAFT_SF_DIR's embeddings, fragment it with K incremental
  * appends (each commits new small files per touched list per rung),
  * then measure ann_stats (metadata-only — must stay ~constant),
  * ann_compact (∝ small-file tail + overlap mass, NOT index size), and
  * the probe wall before/after compaction. Run at sf0.1 and the
  * MakeScale 100× copy for the exponents. */
object ProfCompact {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config(Tables.sessionConfs).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val appends = sys.env.getOrElse("SPARK_GRAFT_APPENDS", "5").toInt
    import graft.operators.Similarity
    import graft.storage.GraftTable
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val maxId = vecs.agg(max("vec_id")).head.getLong(0)
    val root = java.nio.file.Files.createTempDirectory("prof-compact").toString
    def timeIt(label: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[prof-compact] $label%-22s ${(System.nanoTime() - t0) / 1e9}%7.2fs $r")
    }
    println(s"[prof-compact] dir=$dir vectors=${vecs.count()} appends=$appends")
    timeIt("build_ivf") {
      Similarity.buildIvfIndexFrom(spark, vecs, root, nLists = 16)
    }
    timeIt("quantize_int8") { Similarity.quantizeIndex(spark, root, "int8") }
    // fragment: K appends of 500 fresh twins of the first vectors —
    // strided by (maxId+1)·k so two sampled ids can never collide
    // across appends (limit(500) samples arbitrary ids after the
    // shuffle; a fixed +1000k stride collided at the 100× id range and
    // silently double-inserted through the uncheck append — review r13)
    for (k <- 1 to appends) {
      val fresh = vecs.limit(500)
        .select((col("vec_id") + lit((maxId + 1) * k)).as("vec_id"),
          col("embedding"))
      timeIt(s"append_$k") { Similarity.appendToIvfIndex(spark, root, fresh) }
    }
    timeIt("stats_fragmented") {
      Similarity.annIndexStats(spark, root)
        .filter(kv => kv._1 == "postings.files" ||
          kv._1 == "postings.files_per_list_x100").toMap
    }
    val qr = GraftTable.open(spark, s"$root/postings").read()
      .filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qn")).persist()
    qr.count()
    timeIt("probe_fragmented") { Similarity.probeIvf(spark, root, qr).count() }
    // tail-only pass: with smallBytes = 256 KB the healthy build files
    // (∼MB each at the 100× scale) are NOT classified small, so this
    // folds ONLY the append tail — the ∝-tail claim, isolated
    timeIt("compact_tail_256k") {
      Similarity.annCompactIndex(spark, root, smallBytes = 1L << 18).toMap
    }
    timeIt("stats_tail") {
      Similarity.annIndexStats(spark, root)
        .filter(kv => kv._1 == "postings.files").toMap
    }
    timeIt("ann_compact") { Similarity.annCompactIndex(spark, root).toMap }
    timeIt("stats_compacted") {
      Similarity.annIndexStats(spark, root)
        .filter(kv => kv._1 == "postings.files" ||
          kv._1 == "postings.files_per_list_x100").toMap
    }
    timeIt("probe_compacted") { Similarity.probeIvf(spark, root, qr).count() }
    spark.stop()
  }
}
