package graft

import graft.pipeline.GraphRank
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphRankSpec extends AnyFunSuite with SharedSpark {

  /** Independent in-memory reference of the exact same integer
    * recurrence (order-independent: shares are exact Longs), including
    * the uniform dangling-mass redistribution.
    */
  private def ref(
      nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val n = nodes.size
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var r = nodes.map(_ -> GraphRank.Scale / n).toMap
    val tp = GraphRank.Scale * 15L / (100L * n)
    for (_ <- 1 to iters) {
      val recv = scala.collection.mutable.HashMap.empty[Long, Long]
      edges.foreach { case (s, d) =>
        recv.update(d, recv.getOrElse(d, 0L) + (r(s) * 85L) / (100L * deg(s)))
      }
      val dangling = nodes.filterNot(deg.contains).map(r).sum
      val dShare = dangling * 85L / (100L * n)
      r = nodes.map(v => v -> (tp + recv.getOrElse(v, 0L) + dShare)).toMap
    }
    r
  }

  private def run(
      nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    import spark.implicits._
    GraphRank.pageRank(
        nodes.toDF("id").repartition(4),
        edges.toDF("src", "dst").repartition(4), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("distributed ranks equal the in-memory reference on a random graph") {
    val rnd = new scala.util.Random(17)
    val nodes = (0L until 60L).toVector
    // 3 out-edges per node, self-loops excluded, duplicates possible in
    // draw -> distinct to keep (src,dst) a set like the k-NN graph
    val edges = nodes.flatMap(s =>
      Iterator.continually(rnd.nextInt(60).toLong)
        .filter(_ != s).take(3).map(s -> _)).distinct
    assert(run(nodes, edges, 10) == ref(nodes, edges, 10))
  }

  test("star graph: the hub out-ranks every leaf; dangling leaves handled") {
    // leaves 1..9 all point at hub 0; hub points at leaf 1 — leaves
    // 2..9 forward nothing and just hold teleport mass
    val nodes = (0L until 10L).toVector
    val edges = (1L until 10L).map(_ -> 0L) :+ (0L -> 1L)
    val got = run(nodes, edges, 10)
    assert(got == ref(nodes, edges, 10))
    // hub <-> leaf-1 mass oscillates with iteration parity (a 2-cycle
    // damping toward its fixed point), so the robust claim is that BOTH
    // ends of the cycle dominate the teleport-only leaves, which all
    // hold the identical floor mass
    assert(got(0L) > got(2L) && got(1L) > got(2L))
    assert((2L until 10L).map(got).toSet.size == 1)
  }

  test("mass stays bounded by Scale and dust loss stays small") {
    val rnd = new scala.util.Random(23)
    val nodes = (0L until 40L).toVector
    val edges = nodes.flatMap(s =>
      Iterator.continually(rnd.nextInt(40).toLong)
        .filter(_ != s).take(4).map(s -> _)).distinct
    val total = run(nodes, edges, 10).values.sum
    assert(total <= GraphRank.Scale)
    // every node emits here (no dangling), so only floor dust leaks:
    // far less than 0.1% of the mass over 10 iterations
    assert(total > GraphRank.Scale / 1000L * 999L)
  }

  test("sink graph: total mass is conserved (up to floor dust), not drained") {
    // nodes 5..9 are pure sinks — they absorb mass and emit no edges.
    // Without dangling redistribution they drain 85% of their mass per
    // iteration into nowhere; with it, total mass stays within floor
    // dust of Scale. Dust per iteration < n (teleport) + |E| (shares)
    // + n (dangling share) micro-units.
    val nodes = (0L until 10L).toVector
    val edges = (0L until 5L).map(s => s -> (s + 5L)) // 0..4 each feed a sink
    val got = run(nodes, edges, 10)
    assert(got == ref(nodes, edges, 10))
    val total = got.values.sum
    val dustBound = 10L * (10L + edges.size.toLong + 10L)
    assert(total <= GraphRank.Scale)
    assert(total >= GraphRank.Scale - dustBound,
      s"mass drained to $total — dangling redistribution not conserving")
    // and the sinks actually accumulate more than their feeders
    assert((5L until 10L).forall(s => got(s) > got(s - 5L)))
  }

  test("q88 on the sf0.001 fixture: one rank per vector, deterministic") {
    val a = Queries.all("q88_pagerank")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val e = Tables(spark, Sf0001, "embeddings")
    assert(a.size == e.count())
    assert(a.map(_._1).distinct.size == a.size)
    val b = Queries.all("q88_pagerank")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a == b)
  }
}
