package graft

import org.apache.spark.sql.SparkSession

/** Per-query CPU attribution (optimization round 17, guide §1).
  *
  * The bench's in-suite walls are queue-contention accounting and its solo
  * profile covers only the top-10 — neither attributes the suite's total
  * process-CPU (the quantity that bounds the suite wall at full
  * utilization: wall ≈ Σ cpu / effective-parallelism). This harness runs
  * every SparkEntry query SEQUENTIALLY in the suite's LPT order after the
  * bench's own warm-up, measuring each query's process-CPU delta and wall:
  * sequential isolation makes the CPU delta the query's own cost.
  *
  * Two passes: pass 1 pays one-time plan/codegen/cache-build costs (the
  * fingerprint-keyed operator caches mean the FIRST consumer of a shared
  * stage carries it); pass 2 is steady state. Both are printed — the
  * optimization target is pass-1 CPU (what the suite pays), pass-2
  * separates per-run cost from one-time cost.
  *
  * Output: one line per query, `[profcpu] name pass1_wall pass1_cpu
  * pass2_wall pass2_cpu`, plus a total line. Sort externally.
  */
object ProfCpu {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only: Option[Set[String]] =
      if (args.nonEmpty) Some(args(0).split(",").toSet) else None
    val b = SparkSession.builder()
      .withExtensions(new graft.sources.GraftExtensions())
      .master(s"local[$cpus]")
      .appName("graft-profcpu")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(Tables.sessionConfs)
    // A/B experiments: PROF_CONF overrides land AFTER sessionConfs
    sys.env.get("PROF_CONF").foreach(_.split(",").filter(_.nonEmpty).foreach { kv =>
      val Array(k, v) = kv.split("=", 2); b.config(k, v)
    })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def cpuSec: Double = osBean.getProcessCpuTime / 1e9
    // task-level CPU + count (sequential run ⇒ attributable per query)
    val taskCpuNs = new java.util.concurrent.atomic.AtomicLong(0)
    val taskN = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null) {
          taskCpuNs.addAndGet(e.taskMetrics.executorCpuTime)
          taskN.incrementAndGet(); ()
        }
    })

    // the bench's warm-up, verbatim
    Tables.all.foreach(t => Tables.load(spark, sfDir, t).count())
    queries.CoreQueries.q11MultiJoin(spark, sfDir).count()
    operators.Similarity.ivfIndexDir(spark, sfDir)
    operators.Similarity.ivfPqIndexDir(spark, sfDir)
    queries.MutationQueries.warmTemplate(spark, sfDir)

    val heavyFirst = Seq(
      "d7_dedup_clusters", "d13_tfidf_cosine", "d6_embed_neardup_ann", "s5_pq_ann",
      "c8_cluster_split", "d2b_ngram_capped", "d4_simhash", "d5_embed_neardup",
      "d3_minhash_lsh", "s2_ann_ivf", "s9_ann_ivfpq", "s4_kmeans", "m4_png_decode",
      "m7_avi_decode", "m12_video_neardup", "m10_incremental_phash",
      "c2_decontaminate", "t11_bpe_tokens", "e5_funnel", "e8_transitions",
      "d8_window_dedup", "p1_clean_corpus", "d10_containment",
      "d2_ngram_jaccard", "d9_edit_distance", "s1_ann_brute", "s6_range_search",
      "s3_ann_lsh", "t3_lang_id", "c1_stratified_sample",
    ).zipWithIndex.toMap
    val ordered = SparkEntry.queries.toSeq
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .sortBy { case (name, _) => (heavyFirst.getOrElse(name, Int.MaxValue), name) }

    def onePass(): Seq[(String, Double, Double, Double, Long)] = ordered.map { case (name, fn) =>
      val w0 = System.nanoTime(); val c0 = cpuSec
      val tc0 = taskCpuNs.get; val tn0 = taskN.get
      try fn(spark, sfDir).count()
      catch { case e: Throwable =>
        System.err.println(s"[profcpu] $name FAILED: ${e.getMessage}")
      }
      Thread.sleep(50) // listener drain
      (name, (System.nanoTime() - w0) / 1e9, cpuSec - c0,
        (taskCpuNs.get - tc0) / 1e9, taskN.get - tn0)
    }
    val p1 = onePass()
    val p2 = onePass()
    val p2m = p2.map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    p1.foreach { case (n, w1, c1, t1, k1) =>
      val (w2, c2, t2, k2) = p2m(n)
      println(f"[profcpu] $n%-28s p1 $w1%7.2f $c1%7.2f tc $t1%7.2f nt $k1%5d  p2 $w2%7.2f $c2%7.2f tc $t2%7.2f nt $k2%5d")
    }
    println(f"[profcpu] TOTAL p1 wall ${p1.map(_._2).sum}%.1f cpu ${p1.map(_._3).sum}%.1f taskcpu ${p1.map(_._4).sum}%.1f tasks ${p1.map(_._5).sum}" +
      f" | p2 wall ${p2.map(_._2).sum}%.1f cpu ${p2.map(_._3).sum}%.1f taskcpu ${p2.map(_._4).sum}%.1f tasks ${p2.map(_._5).sum}")
    spark.stop()
  }
}
