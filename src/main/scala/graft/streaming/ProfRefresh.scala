package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Multimodal
import graft.storage.GraftTable

/** Tick-cost profile of the refreshable stream-static sides (VERDICT
  * r14 #6): SCALE_r17 covers the batch intake paths; this measures the
  * REFRESH itself — what one version tick costs a live stream at 1×
  * and 100× corpus scale, before (full re-collapse per tick) and after
  * (delta merge, VERDICT r14 #4) — plus the no-tick trigger overhead
  * (one metadata read) and the serving-side cost of a delta stack vs a
  * freshly folded base.
  *
  * The corpus is synthetic fingerprints (the collapse shuffle is the
  * cost under test, not the decode): ~2 docs per distinct fingerprint,
  * the m9/SCALE_r16 duplicate structure.
  *
  * Usage: runMain graft.streaming.ProfRefresh */
object ProfRefresh {
  private def sec(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  private def p(name: String, s: Double, extra: String = ""): Unit =
    println(f"[prof] $name%-38s $s%8.3fs $extra")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config(graft.Tables.sessionConfs).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val scratch = java.nio.file.Files.createTempDirectory("refresh-prof")
      .toString
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("hi", LongType), StructField("lo", LongType)))
    def fps(from: Long, until: Long): DataFrame =
      spark.range(from, until).select(col("id").as("doc_id"),
        ((col("id") / 2).cast("long") * 2654435761L).as("hi"),
        (((col("id") / 2).cast("long") * 40503L) % 65536L).as("lo"))

    for ((label, n) <- Seq(("1x", 5000L), ("100x", 500000L))) {
      println(s"== $label corpus ($n fingerprints, ~${n / 2} distinct)")
      val deltaRows = math.max(50L, n / 1000) // a daily intake batch
      def mkTable(suffix: String): GraftTable = {
        val t = GraftTable.create(spark, s"$scratch/fps_${label}_$suffix",
          schema)
        t.append(fps(0, n))
        t
      }

      // ---- FULL-REBUILD discipline (pre-r15: every tick ∝ corpus)
      val tFull = mkTable("full")
      val rsFull = new RefreshableStatic[DataFrame](tFull.location,
        df => Multimodal.collapseFpsReps(df).localCheckpoint(true), _ => ())
      p("initial build (either discipline)",
        sec { rsFull.get(spark).count(); () })
      var s = 0.0
      (1 to 10).foreach(_ => s += sec { rsFull.get(spark); () })
      p("no-tick trigger overhead (avg of 10)", s / 10,
        "one raw committedVersion probe (round 16: no manifest hydration)")
      tFull.append(fps(n, n + deltaRows))
      p(s"tick, FULL rebuild ($deltaRows-row append)",
        sec { rsFull.get(spark).count(); () }, "∝ corpus")
      rsFull.close()

      // ---- DELTA discipline (r15: append-only tick ∝ delta)
      val tDelta = mkTable("delta")
      var depth = 0
      val rsDelta = new RefreshableStatic[DataFrame](tDelta.location,
        df => { depth = 0
          Multimodal.collapseFpsReps(df).localCheckpoint(true) }, _ => (),
        applyDelta = Some((cur, d, _) => {
          if (depth >= 8) None
          else { depth += 1
            Some(cur.unionByName(Multimodal.collapseFpsReps(
              d.select("doc_id", "hi", "lo")).localCheckpoint(true))) }
        }))
      rsDelta.get(spark).count() // initial build, untimed
      var stacked: DataFrame = null
      (1 to 8).foreach { k =>
        tDelta.append(fps(n + k * deltaRows, n + (k + 1) * deltaRows))
        val w = sec { stacked = rsDelta.get(spark); () }
        if (k == 1 || k == 8)
          p(s"tick $k, DELTA merge ($deltaRows-row append)", w, "∝ delta")
      }
      // the 9th tick trips the fold bound → one full rebuild
      tDelta.append(fps(n + 9 * deltaRows, n + 10 * deltaRows))
      p("tick 9, fold (stack bound reached)",
        sec { rsDelta.get(spark).count(); () }, "∝ corpus, every 8th tick")

      // ---- serving cost: 8-deep delta stack vs freshly folded base
      val batch = fps(2 * n + 1000000, 2 * n + 1001000)
        .localCheckpoint(true)
      val folded = rsDelta.get(spark)
      p("match 1k batch vs FOLDED base",
        sec { Multimodal.matchCollapsedAgainst(folded, batch).count(); () })
      rsDelta.close()
      // rebuild the 8-deep stack to measure its serving penalty
      val tStack = mkTable("stack")
      var depth2 = 0
      val rsStack = new RefreshableStatic[DataFrame](tStack.location,
        df => { depth2 = 0
          Multimodal.collapseFpsReps(df).localCheckpoint(true) }, _ => (),
        applyDelta = Some((cur, d, _) => { depth2 += 1
          Some(cur.unionByName(Multimodal.collapseFpsReps(
            d.select("doc_id", "hi", "lo")).localCheckpoint(true))) }))
      rsStack.get(spark).count()
      (1 to 8).foreach { k =>
        tStack.append(fps(n + k * deltaRows, n + (k + 1) * deltaRows))
        rsStack.get(spark)
      }
      val stack8 = rsStack.get(spark)
      p("match 1k batch vs 8-DEEP delta stack",
        sec { Multimodal.matchCollapsedAgainst(stack8, batch).count(); () })
      rsStack.close()

      // ---- the DedupStream twin: the postings index's tick under both
      // disciplines (text corpus, shingle pass ∝ corpus vs ∝ delta)
      if (label == "1x") {
        val docs = graft.Tables.load(spark, "/root/testdata/sf0.01",
          "documents").select("doc_id", "text")
        def mkDocs(sfx: String): GraftTable = {
          val dt = GraftTable.create(spark, s"$scratch/docs_$sfx",
            StructType(Seq(StructField("doc_id", LongType),
              StructField("text", StringType))))
          dt.append(docs)
          dt
        }
        val dtF = mkDocs("full")
        val rsPF = new RefreshableStatic[graft.operators.Dedup.PostingsIndex](
          dtF.location, graft.operators.Dedup.PostingsIndex.build, _.release())
        p("postings index initial build (sf0.01)",
          sec { rsPF.get(spark); () })
        dtF.append(docs.limit(5).select(col("doc_id") + 1000000L, col("text")))
        p("postings tick, FULL rebuild (5-doc append)",
          sec { rsPF.get(spark); () }, "∝ corpus")
        rsPF.close()
        val dtD = mkDocs("delta")
        val rsPD = new RefreshableStatic[graft.operators.Dedup.PostingsIndex](
          dtD.location, graft.operators.Dedup.PostingsIndex.build, _.release(),
          applyDelta = Some((cur, d, _) =>
            Some(cur.withDocs(d.select("doc_id", "text")))))
        rsPD.get(spark)
        dtD.append(docs.limit(5).select(col("doc_id") + 1000000L, col("text")))
        p("postings tick, DELTA merge (5-doc append)",
          sec { rsPD.get(spark); () }, "∝ delta (round 15)")
        rsPD.close()
      }
    }
    spark.stop()
  }
}
