package graft

import graft.query.RetrievalEval
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed fixed-point metric arithmetic — the q103 oracle
  * verifies the composition on the fixture; these pin each formula and
  * edge (no relevant hit, query absent from the relevance set, MRR
  * past the NDCG cutoff) against values computed by hand.
  */
class RetrievalEvalSpec extends AnyFunSuite with SharedSpark {

  private val d = RetrievalEval.discountNanos(2)

  test("discount table: exact floors of 1e9/log2(r+1), prefix-summed IDCG") {
    assert(d(0) == 1000000000L) // 1/log2(2) = 1
    assert(d(1) == (1e9 / (math.log(3.0) / math.log(2.0))).toLong)
    assert(RetrievalEval.idcgNanos(2) == Seq(d(0), d(0) + d(1)))
  }

  test("randomized inputs: equals an independent reference; bounds hold") {
    // One seeded randomized corpus of 150 queries through ONE Spark
    // call, checked against a from-scratch Scala re-implementation of
    // every formula, plus the fixed-point bounds (recall/mrr/ndcg
    // ≤ 1e6 — ndcg's bound holds because actual relevant ranks
    // dominate ideal ranks pointwise for distinct hit lists).
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val k = 5
    val disc = RetrievalEval.discountNanos(k)
    val idcg = RetrievalEval.idcgNanos(k)
    val hits = (1 to 150).flatMap { q =>
      val n = rnd.nextInt(13) // 0..12 hits; 0 -> query absent from output
      rnd.shuffle((0L to 30L).toVector).take(n).zipWithIndex
        .map { case (d, i) => (q.toLong, d, (i + 1).toLong) }
    }
    val rels = (1 to 140).flatMap { q => // queries 141..150 have no rels
      (0L to 30L).filter(_ => rnd.nextInt(4) == 0).map(d => (q.toLong, d))
    }
    val out = RetrievalEval.metrics(
        hits.toDF("query_id", "doc_id", "rank"),
        "query_id", "doc_id", "rank",
        rels.toDF("query_id", "doc_id"), k)
      .collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1).map(_.asInstanceOf[Long]))
      .toMap

    val relsByQ = rels.groupBy(_._1).map { case (q, s) => q -> s.map(_._2).toSet }
    val hitsByQ = hits.groupBy(_._1)
    assert(out.keySet == hitsByQ.keySet)
    hitsByQ.foreach { case (q, qh) =>
      val rel = relsByQ.getOrElse(q, Set.empty)
      val nRel = rel.size.toLong
      val relRanks = qh.filter(h => rel(h._2)).map(_._3).sorted
      val atK = relRanks.count(_ <= k).toLong
      val dcg = relRanks.filter(_ <= k).map(r => disc(r.toInt - 1)).sum
      val ideal = if (nRel > 0) idcg(math.min(nRel, k).toInt - 1) else 0L
      val expected = Seq(
        nRel,
        atK,
        atK * 1000000L / math.max(nRel, 1L),
        if (atK > 0) 1L else 0L,
        relRanks.headOption.getOrElse(0L),
        relRanks.headOption.map(1000000L / _).getOrElse(0L),
        dcg,
        ideal,
        if (ideal > 0) dcg * 1000000L / ideal else 0L)
      assert(out(q) == expected, s"query $q: ${out(q)} != $expected")
      assert(out(q)(2) <= 1000000L && out(q)(5) <= 1000000L &&
        out(q)(8) <= 1000000L, s"fixed-point bound violated for query $q")
    }
  }

  test("per-query metrics on a hand-checked toy") {
    import spark.implicits._
    val hits = Seq(
      // query 1: relevant doc 11 at rank 2 (inside k=2); doc 13
      // relevant at rank 3 — outside NDCG/recall cutoff, but NOT the
      // first relevant, so it affects nothing
      (1L, 10L, 1L), (1L, 11L, 2L), (1L, 13L, 3L),
      // query 2: only relevant hit at rank 3 — counts for MRR only
      (2L, 20L, 1L), (2L, 21L, 2L), (2L, 22L, 3L),
      // query 3: not in the relevance set at all
      (3L, 30L, 1L))
      .toDF("query_id", "doc_id", "rank")
    val rels = Seq(
      (1L, 11L), (1L, 13L), (1L, 14L),
      (2L, 22L))
      .toDF("query_id", "doc_id")
    val m = RetrievalEval.metrics(hits, "query_id", "doc_id", "rank", rels, k = 2)
      .orderBy("query_id").collect()
      .map(r => r.toSeq.map(_.asInstanceOf[Long]))

    // q1: n_rel 3, hits@2 1, recall 1e6/3, success 1, first 2,
    //     mrr 1e6/2, dcg d(1), idcg d(0)+d(1) [min(3,2)=2 slots]
    assert(m(0) == Seq(1L, 3L, 1L, 333333L, 1L, 2L, 500000L,
      d(1), d(0) + d(1), d(1) * 1000000L / (d(0) + d(1))))
    // q2: nothing in top-2 -> recall/success/dcg/ndcg 0, but the rank-3
    //     hit still yields first_rel 3 and mrr 1e6/3; idcg has 1 slot
    assert(m(1) == Seq(2L, 1L, 0L, 0L, 0L, 3L, 333333L, 0L, d(0), 0L))
    // q3: absent from the relevance set -> n_rel 0, everything 0
    assert(m(2) == Seq(3L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
  }
}
