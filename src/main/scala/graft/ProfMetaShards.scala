package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

import graft.storage.GraftTable

/** Metadata-scale profile of per-file-stats shards: the trickle-ingest
  * shape (many single-file commits into a wide table) where the
  * pre-shard design rewrote EVERY file's zone maps into both the
  * pointer and the history snapshot on each commit.
  *
  * Measures, for N one-file appends of a W-column schema:
  *  - bytes actually written to `_graft_history` + `_graft_manifest` +
  *    the final pointer (the durable metadata cost of the whole run),
  *  - the inline counterfactual: sum over commits v of v × (one file's
  *    stats bytes) — what the same run serializes when every snapshot
  *    inlines every file's stats (the pre-shard design, still used
  *    below the 16-file threshold, so the per-file stats bytes are
  *    measured from the run's own inline phase, not assumed),
  *  - commit wall clock for the first vs last 10 commits (the shard
  *    path must stay flat as the table grows).
  *
  * The 100 TB claim under test: durable metadata bytes per commit are
  * ∝ the commit's own files (plus the amortized 1/32 compaction), not
  * ∝ table files — at a million files the difference is ~3 GB per
  * append vs ~3 KB. */
object ProfMetaShards {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(120)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").config(Tables.sessionConfs)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val wide = StructType((0 until 12).map(i =>
      StructField(s"c$i", if (i % 2 == 0) IntegerType else StringType)))
    val dir = java.nio.file.Files.createTempDirectory("prof-meta").toString
    val t = GraftTable.create(spark, s"$dir/t", wide)
    def batch(b: Int) = {
      val df = (0 until 50).map { r =>
        (0 until 12).map(i => if (i % 2 == 0) (b * 100 + r).toString else s"v$b-$r-$i")
      }.map(v => (v(0).toInt, v(1), v(2).toInt, v(3), v(4).toInt, v(5),
        v(6).toInt, v(7), v(8).toInt, v(9), v(10).toInt, v(11)))
        .toDF(wide.fieldNames.toIndexedSeq: _*).coalesce(1)
      df
    }

    var inlinePerFileBytes = 0L
    val walls = Array.ofDim[Double](n)
    for (b <- 0 until n) {
      val t0 = System.nanoTime()
      t.append(batch(b))
      walls(b) = (System.nanoTime() - t0) / 1e9
      if (b == 2) {
        // measure one file's inline stats bytes from the run's own
        // inline phase: pointer growth per single-file commit
        val p1 = java.nio.file.Files.size(java.nio.file.Paths.get(dir, "t/_graft_meta.json"))
        t.append(batch(990 + b))
        val p2 = java.nio.file.Files.size(java.nio.file.Paths.get(dir, "t/_graft_meta.json"))
        inlinePerFileBytes = p2 - p1
      }
    }

    def treeBytes(rel: String): Long = {
      val p = java.nio.file.Paths.get(dir, rel)
      if (!java.nio.file.Files.exists(p)) 0L
      else {
        val s = java.nio.file.Files.list(p)
        try {
          val it = s.iterator(); var sum = 0L
          while (it.hasNext) sum += java.nio.file.Files.size(it.next())
          sum
        } finally s.close()
      }
    }
    val historyB = treeBytes("t/_graft_history")
    val statsB = treeBytes("t/_graft_manifest")
    val pointerB = java.nio.file.Files.size(java.nio.file.Paths.get(dir, "t/_graft_meta.json"))
    def countIn(rel: String): Int = {
      val p = java.nio.file.Paths.get(dir, rel)
      if (!java.nio.file.Files.exists(p)) 0
      else {
        val s = java.nio.file.Files.list(p)
        try { val it = s.iterator(); var c = 0; while (it.hasNext) { it.next(); c += 1 }; c }
        finally s.close()
      }
    }
    // counterfactual: every snapshot v inlines v files' stats, and the
    // pointer is rewritten each commit at the same size
    val files = t.history().last._3.toLong
    val counterfactual = (1L to files).map(v => v * inlinePerFileBytes).sum * 2
    println(f"[prof] commits=$files%d cols=12 segments=${countIn("t/_graft_manifest")}%d")
    println(f"[prof] per-file inline stats bytes ≈ $inlinePerFileBytes%d")
    println(f"[prof] shard-list cap check: final pointer carries ${pointerB}%d bytes")
    println(f"[prof] durable metadata written: history=$historyB%d segments=$statsB%d pointer=$pointerB%d total=${historyB + statsB + pointerB}%d")
    println(f"[prof] inline counterfactual (Σ v×b × 2 writes) ≈ $counterfactual%d  (${counterfactual.toDouble / (historyB + statsB + pointerB)}%.1fx)")
    println(f"[prof] commit wall first10=${walls.take(10).sum / 10}%.3fs last10=${walls.takeRight(10).sum / 10}%.3fs")
    // lifecycle tail: a cold reader replays at most the live (≤32-cap)
    // segment list, and expiry + vacuum reclaim the superseded segments
    // history still referenced during the run
    GraftTable.invalidateSegmentCacheUnder(s"$dir/t")
    val t0 = System.nanoTime()
    val cold = GraftTable.open(spark, s"$dir/t")
    val rows = cold.read().count()
    println(f"[prof] cold open+hydrate+count: ${(System.nanoTime() - t0) / 1e9}%.3fs rows=$rows%d liveSegments=${cold.manifestReport().size}%d")
    cold.expireHistory(keepLast = 2)
    // the aged-orphan rule guards in-flight commits; zero grace here
    // because this profiler owns the table exclusively
    spark.conf.set("spark.graft.commit.claimGraceMs", "-1")
    val reclaimed = try cold.vacuum()
      finally spark.conf.unset("spark.graft.commit.claimGraceMs")
    println(f"[prof] after expire(keepLast=2)+vacuum: reclaimed=$reclaimed%d onDiskSegments=${countIn("t/_graft_manifest")}%d")
    spark.stop()
  }
}
