package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact's self-certification (VERDICT r15 #2): pass
  * agreement alone stamped the round-15 driver artifact — a 155 s
  * headline from a uniformly degraded window whose two best passes
  * agreed within 1.017x — as `window_suspect:false`, while the
  * artifact's OWN discriminators (in-suite spin median 0.964 during
  * the certified pass vs the 0.6-0.7 clean reference) said otherwise.
  * [[Bench.windowSuspectStamp]] is pure exactly so these recorded
  * artifacts can be replayed here. */
class BenchStampSpec extends AnyFunSuite {

  test("replaying the r15 driver artifact's numbers stamps window_suspect:true") {
    // BENCH_r15.json (driver): suite_sec_runs [710.139, 507.632,
    // 246.007, 157.812, 155.239] — two best agree at 1.017x — with
    // calib_insuite_best_sec 0.964, pre/post spin 0.702/0.713,
    // pre/post par-spin 1.541/0.817. The old stamp said false.
    assert(Bench.windowSuspectStamp(multiPass = true, twoBestAgree = true,
      calibInsuiteBest = 0.964, preSpin = 0.702, preParSpin = 1.541,
      postSpin = 0.713, postParSpin = 0.817, insuiteMedian = 1.029),
      "a hot in-suite spin during the certified pass must stamp suspect " +
        "even when the two best passes agree")
  }

  test("a clean-window run stays window_suspect:false") {
    // the r15 judge rerun / r16 local clean runs: best-pass spin
    // median 0.66-0.69, par-spin ~= spin, passes agreeing
    assert(!Bench.windowSuspectStamp(multiPass = true, twoBestAgree = true,
      calibInsuiteBest = 0.685, preSpin = 0.621, preParSpin = 0.648,
      postSpin = 0.613, postParSpin = 0.657, insuiteMedian = 0.692))
  }

  test("a cpu-starved certified pass stamps suspect even when calib and agreement both read clean") {
    // round-17 local recording, literal numbers: suite_sec_runs
    // [178.275, 117.669, 126.255] — two best agree at 1.073 — with
    // calib_insuite_best 0.72 (under the 0.8 bar) in a window a rerun
    // showed is ~31-46 s clean. The certified pass burned 436.8 CPU-s
    // over 117.7 wall-s = 3.7 cpu/wall vs the clean 10.5: flat CPU +
    // inflated wall is ambient contention, and it is the one
    // discriminator a uniformly-degraded window cannot dodge.
    assert(Bench.windowSuspectStamp(multiPass = true, twoBestAgree = true,
      calibInsuiteBest = 0.72, preSpin = 0.65, preParSpin = 0.70,
      postSpin = 0.66, postParSpin = 0.71, insuiteMedian = 0.74,
      certCpuPerWall = 436.8 / 117.669, cpus = 32),
      "3.7 cpu/wall at 32 cores must stamp suspect")
    // …while the clean recording (10.5 cpu/wall) stays unmarked
    assert(!Bench.windowSuspectStamp(multiPass = true, twoBestAgree = true,
      calibInsuiteBest = 0.679, preSpin = 0.65, preParSpin = 0.70,
      postSpin = 0.66, postParSpin = 0.71, insuiteMedian = 0.70,
      certCpuPerWall = 330.8 / 31.424, cpus = 32))
    // …and a REAL regression keeps its ratio: wall 3× with cpu 3× is
    // not starved and publishes unmarked
    assert(!Bench.windowSuspectStamp(multiPass = true, twoBestAgree = true,
      calibInsuiteBest = 0.68, preSpin = 0.65, preParSpin = 0.70,
      postSpin = 0.66, postParSpin = 0.71, insuiteMedian = 0.70,
      certCpuPerWall = 990.0 / 94.0, cpus = 32))
  }

  test("the in-suite-spin bar is relative to the run's own idle brackets (round-17 clock drift)") {
    // round-17 local recording, literal numbers: idle spin 0.733/0.774
    // (the VM clocks slower this round than the 0.6-0.7 historical
    // envelope), certified-pass in-suite spin 0.807 = 1.04× its own
    // idle reading, passes [29.568, 19.358, 24.192] agreeing, cpu/wall
    // 284.4/19.358 = 14.7. The absolute 0.8 bar stamped this clean run
    // suspect; the machine-relative bar must not.
    assert(!Bench.windowSuspectStamp(multiPass = true, twoBestAgree = true,
      calibInsuiteBest = 0.807, preSpin = 0.733, preParSpin = 1.005,
      postSpin = 0.774, postParSpin = 0.920, insuiteMedian = 0.792,
      certCpuPerWall = 284.4 / 19.358, cpus = 32))
    // …a genuinely hot in-suite spin on the same slow-clocked box still
    // stamps (1.3 × 0.733 = 0.953 < 1.05)
    assert(Bench.windowSuspectStamp(multiPass = true, twoBestAgree = true,
      calibInsuiteBest = 1.05, preSpin = 0.733, preParSpin = 1.005,
      postSpin = 0.774, postParSpin = 0.920, insuiteMedian = 1.01,
      certCpuPerWall = 284.4 / 19.358, cpus = 32),
      "a 1.4x-over-idle in-suite spin must still stamp suspect")
    // …and slow BRACKETS mark the window degraded outright instead of
    // raising the in-suite allowance
    assert(Bench.windowSuspectStamp(multiPass = true, twoBestAgree = true,
      calibInsuiteBest = 1.3, preSpin = 1.35, preParSpin = 1.4,
      postSpin = 1.31, postParSpin = 1.45, insuiteMedian = 1.32,
      certCpuPerWall = 284.4 / 19.358, cpus = 32),
      "idle brackets over 1.2 s are themselves the degradation signal")
  }

  test("sustained quota throttling (par-spin hot at BOTH brackets) stamps suspect even with a clean single spin") {
    assert(Bench.windowSuspectStamp(multiPass = true, twoBestAgree = true,
      calibInsuiteBest = 0.65, preSpin = 0.65, preParSpin = 2.8,
      postSpin = 0.66, postParSpin = 2.5, insuiteMedian = 0.66))
    // …but a transient spike at ONE bracket (drained window) does not
    assert(!Bench.windowSuspectStamp(multiPass = true, twoBestAgree = true,
      calibInsuiteBest = 0.65, preSpin = 0.70, preParSpin = 1.54,
      postSpin = 0.71, postParSpin = 0.82, insuiteMedian = 0.66))
  }

  test("non-agreeing best passes still stamp suspect; single-pass smoke self-reports from the in-suite median") {
    assert(Bench.windowSuspectStamp(multiPass = true, twoBestAgree = false,
      calibInsuiteBest = 0.6, preSpin = 0.6, preParSpin = 0.6,
      postSpin = 0.6, postParSpin = 0.6, insuiteMedian = 0.6))
    assert(Bench.windowSuspectStamp(multiPass = false, twoBestAgree = true,
      calibInsuiteBest = 0.0, preSpin = 0.6, preParSpin = 0.6,
      postSpin = 0.6, postParSpin = 0.6, insuiteMedian = 0.9))
    assert(!Bench.windowSuspectStamp(multiPass = false, twoBestAgree = true,
      calibInsuiteBest = 0.0, preSpin = 0.6, preParSpin = 0.6,
      postSpin = 0.6, postParSpin = 0.6, insuiteMedian = 0.5))
    // single-pass slow-bracket backstop (ADVICE r17): a badly degraded
    // box (idle spin 2.0 s) must self-report even when the in-suite
    // median sits inside the relative allowance it would otherwise raise
    assert(Bench.windowSuspectStamp(multiPass = false, twoBestAgree = true,
      calibInsuiteBest = 0.0, preSpin = 2.0, preParSpin = 2.0,
      postSpin = 2.0, postParSpin = 2.0, insuiteMedian = 2.3))
  }

  test("the sentinel set is fixed, ordered, and resolvable against the query inventory") {
    assert(Bench.SentinelQueries.size === 15)
    assert(Bench.SentinelQueries.distinct === Bench.SentinelQueries)
    val known = SparkEntry.queries.keySet
    val missing = Bench.SentinelQueries.filterNot(known)
    assert(missing.isEmpty,
      s"sentinel names must exist in SparkEntry.queries: $missing")
    // batch twins substitute only sentinel slots, and resolve too
    assert(Bench.SentinelBatchTwins.keySet.subsetOf(Bench.SentinelQueries.toSet))
    val missingTwins = Bench.SentinelBatchTwins.values.filterNot(known).toSeq
    assert(missingTwins.isEmpty,
      s"sentinel batch twins must exist in SparkEntry.queries: $missingTwins")
  }

  test("replaying BENCH_r16's literal sentinel tail stamps sentinel_suspect:true") {
    // BENCH_r16 (driver artifact, certified window_suspect:false — the
    // SUITE pass was clean): the sentinels run last, and the window
    // degraded exactly under the tail — p3 57.8 s vs its own in-suite
    // 3.525, t13 41.434 vs 1.866, m9 24.356 vs 2.797, d6 25.953 vs
    // 7.547 — with the post bracket recording the degradation
    // (post_shuffle 5.528 vs pre_shuffle 0.625). The series built for
    // round-over-round comparison shipped poisoned and unmarked.
    val sentinel = Seq(
      "q11_multi_join" -> 1.158, "q32_tpch_q1" -> 0.319,
      "d7_dedup_clusters" -> 0.091, "d14_span_dedup" -> 2.322,
      "s9_ann_ivfpq" -> 1.705, "s17_int8_persisted" -> 1.121,
      "m7_avi_decode" -> 3.037, "m12_video_neardup" -> 0.838,
      "e12_stream_trending" -> 2.303, "n9_agg_maintain" -> 3.356,
      "c8_cluster_split" -> 0.258, "p3_incremental_refresh" -> 57.8,
      "t13_perplexity" -> 41.434, "m9_audio_neardup" -> 24.356,
      "d6_embed_neardup_ann" -> 25.953)
    val insuite = Map(
      "q11_multi_join" -> 1.221, "q32_tpch_q1" -> 0.579,
      "d7_dedup_clusters" -> 0.416, "d14_span_dedup" -> 7.144,
      "s9_ann_ivfpq" -> 9.537, "s17_int8_persisted" -> 3.811,
      "m7_avi_decode" -> 4.852, "m12_video_neardup" -> 4.347,
      "e12_stream_trending" -> 7.715, "n9_agg_maintain" -> 4.605,
      "c8_cluster_split" -> 0.3, "p3_incremental_refresh" -> 3.525,
      "t13_perplexity" -> 1.866, "m9_audio_neardup" -> 2.797,
      "d6_embed_neardup_ann" -> 7.547)
    assert(Bench.sentinelSuspectStamp(sentinel, insuite,
      preShuffle = 0.625, postShuffle = 5.528, postSpin = 0.612),
      "the r16 tail must be marked: 8-18x sentinels with a hot post bracket")
  }

  test("a clean sentinel pass stays sentinel_suspect:false, and a real regression with a clean bracket is NOT laundered") {
    // clean: solo uncontended walls at or under the contended in-suite
    // walls, post bracket matching pre
    val clean = Seq("p3_incremental_refresh" -> 3.1, "t13_perplexity" -> 1.5,
      "m9_audio_neardup" -> 1.9, "d6_embed_neardup_ann" -> 2.9)
    val insuite = Map("p3_incremental_refresh" -> 3.525,
      "t13_perplexity" -> 1.866, "m9_audio_neardup" -> 2.797,
      "d6_embed_neardup_ann" -> 7.547)
    assert(!Bench.sentinelSuspectStamp(clean, insuite,
      preShuffle = 0.625, postShuffle = 0.64, postSpin = 0.61))
    // a genuine 5x regression with a CLEAN post bracket publishes
    // unmarked — the stamp flags window noise, not slow code
    val regressed = Seq("t13_perplexity" -> 9.5)
    assert(!Bench.sentinelSuspectStamp(regressed, insuite,
      preShuffle = 0.625, postShuffle = 0.64, postSpin = 0.61))
    // …and the same regression under a hot bracket IS marked (re-record)
    assert(Bench.sentinelSuspectStamp(regressed, insuite,
      preShuffle = 0.625, postShuffle = 5.5, postSpin = 0.61))
  }
}
