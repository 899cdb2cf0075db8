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
  }

  test("the sentinel set is fixed, ordered, and resolvable against the query inventory") {
    assert(Bench.SentinelQueries.size === 15)
    assert(Bench.SentinelQueries.distinct === Bench.SentinelQueries)
    val known = SparkEntry.queries.keySet
    val missing = Bench.SentinelQueries.filterNot(known)
    assert(missing.isEmpty,
      s"sentinel names must exist in SparkEntry.queries: $missing")
  }
}
