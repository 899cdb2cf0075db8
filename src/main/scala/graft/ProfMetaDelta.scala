package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

import graft.storage.GraftTable

/** Per-tick METADATA cost of the streaming delta refresh, before/after
  * the O(churn) change-range readers (VERDICT r15 #1 / r16; the
  * companion of SCALE_r18's data-path table): a delta tick calls
  * `isAppendOnlyRange` + `changes` once each, and those used to
  * hydrate the FULL manifest for every version in the range — an
  * ∝-table-files driver term per tick. This harness measures, at a 1×
  * and a ~100×-file-count table (tiny appends, the MakeScale shape):
  *   - the tick's actual history/segment bytes parsed from storage
  *     (cold segment cache — `GraftTable.MetaIo`), and
  *   - the counterfactual per-version FULL hydration cost (two
  *     `readHistoryMeta` calls, cold cache) the old readers paid.
  *
  * Usage: runMain graft.ProfMetaDelta */
object ProfMetaDelta {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config(Tables.sessionConfs).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val scratch = java.nio.file.Files.createTempDirectory("meta-delta").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", LongType)))

    def batch(base: Long, n: Long, parts: Int) =
      spark.range(base, base + n, 1L, parts)
        .selectExpr("id", "id * 10 AS v")

    // (label, commits, files per commit): 1× = 6 files, 100× = 608
    for ((label, commits, parts) <- Seq(("1x", 3, 2), ("100x", 38, 16))) {
      val loc = s"$scratch/t_$label"
      val t = GraftTable.create(spark, loc, schema)
      var base = 0L
      (0 until commits).foreach { _ =>
        t.append(batch(base, 1000L, parts)); base += 1000L
      }
      val files = t.committedFiles.size
      val from = t.version
      t.append(batch(base, 100L, 1)) // the tick's commit: 1 file

      // the tick's reads, cold cache
      GraftTable.invalidateSegmentCacheUnder(loc)
      val (h0, hb0, s0, sb0) = GraftTable.MetaIo.snapshot()
      val w0 = System.nanoTime()
      val gate = t.isAppendOnlyRange(from)
      val n = t.changes(from, t.version).count()
      val tickSec = (System.nanoTime() - w0) / 1e9
      val (h1, hb1, s1, sb1) = GraftTable.MetaIo.snapshot()

      // counterfactual: the pre-r16 readers hydrated EVERY version in
      // the range — two full-manifest replays per tick (cold cache)
      GraftTable.invalidateSegmentCacheUnder(loc)
      val (_, hb2, _, sb2) = GraftTable.MetaIo.snapshot()
      val w1 = System.nanoTime()
      GraftTable.readHistoryMeta(loc, from)
      GraftTable.invalidateSegmentCacheUnder(loc)
      GraftTable.readHistoryMeta(loc, t.version)
      val hydrateSec = (System.nanoTime() - w1) / 1e9
      val (_, hb3, _, sb3) = GraftTable.MetaIo.snapshot()

      println(f"[prof] $label%-5s files=$files%5d gate=$gate rows=$n " +
        f"tick: hist=${h1 - h0} (${hb1 - hb0}%d B) seg=${s1 - s0} " +
        f"(${sb1 - sb0}%d B) wall=$tickSec%.4fs | " +
        f"old per-version hydration: ${hb3 - hb2}%d hist B + " +
        f"${sb3 - sb2}%d seg B wall=$hydrateSec%.4fs")
    }
    spark.stop()
  }
}
