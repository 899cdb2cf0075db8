package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

import graft.storage.GraftTable

/** Per-trigger cost of the streaming PROGRESS probe, before/after the
  * raw rewrite (VERDICT r16 #1): Spark's MicroBatchExecution calls
  * `reportLatestOffset` every trigger — idle ones included — and the
  * graft file stream's implementation was a full hydrating
  * `GraftTable.open(...).version` (pointer parse + complete manifest
  * replay, ∝ table files), while the admission path next to it had
  * already gone raw. This harness measures, at ProfMetaDelta's
  * 100×-file table, what ONE idle trigger's probe reads from storage
  * (cold segment cache, `GraftTable.MetaIo`):
  *   - new: `committedVersion` — pointer parse + one negative
  *     existence probe, zero history/segment parses;
  *   - old counterfactual: the hydrating open the probe used to pay.
  *
  * Usage: runMain graft.ProfIdleProbe */
object ProfIdleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config(Tables.sessionConfs).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val scratch = java.nio.file.Files.createTempDirectory("idle-probe").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", LongType)))

    def batch(base: Long, n: Long, parts: Int) =
      spark.range(base, base + n, 1L, parts)
        .selectExpr("id", "id * 10 AS v")

    for ((label, commits, parts) <- Seq(("1x", 3, 2), ("100x", 38, 16))) {
      val loc = s"$scratch/t_$label"
      val t = GraftTable.create(spark, loc, schema)
      var base = 0L
      (0 until commits).foreach { _ =>
        t.append(batch(base, 1000L, parts)); base += 1000L
      }
      val files = t.committedFiles.size
      val iters = 20

      // new probe: what reportLatestOffset now reads per idle trigger
      GraftTable.invalidateSegmentCacheUnder(loc)
      val (h0, hb0, s0, sb0) = GraftTable.MetaIo.snapshot()
      val w0 = System.nanoTime()
      var v = 0L
      (0 until iters).foreach(_ => v = GraftTable.committedVersion(loc))
      val newSec = (System.nanoTime() - w0) / 1e9 / iters
      val (h1, hb1, s1, sb1) = GraftTable.MetaIo.snapshot()

      // old counterfactual: the hydrating open, cold cache each time
      // (an idle trigger arrives with whatever the last one left, but
      // at the 1M-file design point the replay CPU dominates either way)
      val w1 = System.nanoTime()
      val (_, hb2, _, sb2) = GraftTable.MetaIo.snapshot()
      (0 until iters).foreach { _ =>
        GraftTable.invalidateSegmentCacheUnder(loc)
        assert(GraftTable.open(spark, loc).version == v)
      }
      val oldSec = (System.nanoTime() - w1) / 1e9 / iters
      val (_, hb3, _, sb3) = GraftTable.MetaIo.snapshot()

      println(f"[prof] $label%-5s files=$files%5d head=v$v " +
        f"new probe: hist=${(h1 - h0) / iters} (${(hb1 - hb0) / iters}%d B) " +
        f"seg=${(s1 - s0) / iters} (${(sb1 - sb0) / iters}%d B) " +
        f"wall=${newSec * 1000}%.3fms | old hydrating open: " +
        f"${(hb3 - hb2) / iters}%d hist B + ${(sb3 - sb2) / iters}%d seg B " +
        f"wall=${oldSec * 1000}%.3fms")
    }
    spark.stop()
  }
}
