package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.storage.GraftTable

/** Reader-safe index maintenance (VERDICT r14 #7): `ann_compact` must
  * run under LIVE serving. The machinery that makes it so is the table
  * layer's snapshot isolation — a probe opens each sibling table at
  * probe start (one atomic metadata read), a compaction commit swaps
  * the file LIST atomically but deletes nothing (replaced files stay
  * on disk until vacuum), and the fold is row/cluster/DV-preserving,
  * so even a probe whose siblings straddle the swap (centroids
  * pre-fold, postings post-fold) scores the same rows. The remaining
  * exclusive windows are writers (the maintenance marker — unchanged)
  * and `vacuum` (documented). */
class AnnReaderSafetySpec extends SparkSpec {

  private def dir = sf("sf0.001")

  test("probes concurrent with ann_compact are bit-identical before, during, and after the fold") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val root = tmpDir("ann-reader-safe")
    Similarity.buildIvfIndexFrom(spark, vecs.filter(col("vec_id") < 100),
      root, nLists = 4)
    // quantized siblings widen the fold's window (more tables to walk)
    Similarity.quantizeIndex(spark, root, "bin")
    Similarity.quantizeIndex(spark, root, "int8")
    // fragment every list: five incremental appends, each landing ≥1
    // small file per touched list per sibling
    (0 until 5).foreach { i =>
      Similarity.appendToIvfIndex(spark, root,
        vecs.filter(col("vec_id") >= 100 && col("vec_id") % 5 === i))
    }
    val post = GraftTable.open(spark, s"$root/postings")
    assert(post.committedFiles.size > 4,
      s"appends must fragment the postings (${post.committedFiles.size} files)")
    // the query frame is PINNED (localCheckpoint): this test isolates
    // the probe path's snapshot behavior, not the query side's
    val q = post.read().filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qn"))
      .localCheckpoint(true)
    def probe() = Similarity.probeIvf(spark, root, q, nprobe = 2)
      .orderBy("q_id", "rank").collect().map(_.toSeq).toSeq
    val baseline = probe()
    assert(baseline.nonEmpty)

    // fold on a background thread; probe in a tight loop meanwhile —
    // ANY interleaving must serve the baseline bit-identically
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    @volatile var compacting = true
    val fut = Future {
      try Similarity.annCompactIndex(spark, root)
      finally compacting = false
    }
    var during = 0
    var total = 0
    val bad = scala.collection.mutable.ListBuffer[Int]()
    while ({ // at least one probe even if the fold wins the race
      val wasDuring = compacting
      if (probe() != baseline) bad += total
      if (wasDuring) during += 1
      total += 1
      compacting && total < 50
    }) ()
    val folded = Await.result(fut,
      scala.concurrent.duration.Duration.Inf)
    assert(folded.exists(_._2 > 0), s"the fold must fold files: $folded")
    assert(bad.isEmpty,
      s"probes racing ann_compact diverged at iterations $bad of $total " +
        s"($during overlapped the fold)")
    assert(probe() === baseline, "the post-fold probe must match too")
    // the fold actually shrank the file count (the probes above were
    // served across a REAL swap, not a no-op)
    assert(GraftTable.open(spark, s"$root/postings").committedFiles.size <
      post.committedFiles.size, "compaction must shrink the postings")
  }
}
