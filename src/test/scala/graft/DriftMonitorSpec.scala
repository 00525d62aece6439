package graft

import graft.pipeline.DriftMonitor
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed ppm drift arithmetic + the new/gone bucket contract;
  * the q104 oracle verifies the composition on the fixture.
  */
class DriftMonitorSpec extends AnyFunSuite with SharedSpark {

  test("hand-computed shares, summands, and status flags") {
    import spark.implicits._
    val ref = (Seq.fill(8)("a") ++ Seq.fill(2)("b")).toDF("bucket")
    val cur = (Seq.fill(5)("a") ++ Seq.fill(5)("c")).toDF("bucket")
    val out = DriftMonitor.chiSquareDrift(ref, cur, Seq("bucket"))
      .orderBy("bucket").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6)))
    assert(out.toSeq == Seq(
      // a: shares 800000 -> 500000; (3e5)^2 div 8e5 = 112500
      ("a", 8L, 5L, 800000L, 500000L, 112500L, "ok"),
      // b gone: whole reference share, (2e5)^2 div 2e5 = 200000
      ("b", 2L, 0L, 200000L, 0L, 200000L, "gone"),
      // c new: no reference share -> the max(ref_ppm, 1) floor makes
      // its summand dominate, which is the intended alarm shape
      ("c", 0L, 5L, 0L, 500000L, 250000000000L, "new")))
  }

  test("identical snapshots score zero everywhere") {
    import spark.implicits._
    val snap = (Seq.fill(7)("x") ++ Seq.fill(3)("y")).toDF("bucket")
    val out = DriftMonitor.chiSquareDrift(snap, snap, Seq("bucket"))
      .collect()
    assert(out.forall(r => r.getLong(5) == 0L && r.getString(6) == "ok"))
  }
}
