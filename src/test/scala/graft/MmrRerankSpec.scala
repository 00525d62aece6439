package graft

import graft.query.MmrRerank
import org.scalatest.funsuite.AnyFunSuite

class MmrRerankSpec extends AnyFunSuite with SharedSpark {

  private def cand(id: Long, simQ: Double, v: Float*) =
    (id, simQ, v.toArray)

  test("first pick is the plain relevance argmax, ties to lower id") {
    val cands = Seq(
      cand(5L, 0.9, 1f, 0f), cand(3L, 0.9, 1f, 0f), cand(7L, 0.5, 0f, 1f))
    val out = MmrRerank.mmrSelect(cands, 1, 0.7)
    assert(out.map(_._1) === Seq(3L))
  }

  test("an exact duplicate of a selected hit is demoted below a diverse one") {
    // a ranks first; c1/c2 are identical near-dups of a; d is less
    // relevant but diverse — at lambda=0.5 the diverse d overtakes BOTH
    // redundant candidates, and the exact duplicate c2 (redundancy 1.0
    // once c1 is selected) drops out of the top 3 entirely. Plain
    // top-3 by relevance would return (a, c1, c2).
    val a = cand(1L, 0.97, 0.9f, 0.1f)
    val c1 = cand(2L, 0.95, 0.8f, 0.2f)
    val c2 = cand(3L, 0.95, 0.8f, 0.2f)
    val d = cand(4L, 0.70, 0.5f, -0.5f)
    val out = MmrRerank.mmrSelect(Seq(a, c1, c2, d), 3, 0.5)
    assert(out.map(_._1) === Seq(1L, 4L, 2L),
      s"diversity did not reorder the redundant candidates: $out")
  }

  test("selection is exhaustive and stable when k exceeds candidates") {
    val cands = Seq(cand(1L, 0.9, 1f, 0f), cand(2L, 0.1, 0f, 1f))
    val out = MmrRerank.mmrSelect(cands, 10, 0.7)
    assert(out.map(_._1) === Seq(1L, 2L))
  }

  test("q70 emits SelectK ranks per query over the fixture batch") {
    val rows = MmrRerank.q70(spark, Sf0001).collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet === (0L until 10L).toSet)
    byQ.values.foreach { g =>
      assert(g.map(_.getAs[Long]("rank")).sorted.toSeq ===
        (1L to MmrRerank.SelectK).toSeq)
      // ranks are distinct vec_ids
      assert(g.map(_.getAs[Long]("vec_id")).distinct.length === g.length)
    }
  }
}
