package graft

import graft.pipeline.Dedup
import org.scalatest.funsuite.AnyFunSuite

class ConnectedComponentsSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.connectedComponents(pairs.toDF("d1", "d2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain of pairs collapses to one component with the min label") {
    // 5-3, 3-9, 9-7: a diameter-3 chain exercising multiple iterations
    assert(cc(Seq((5L, 3L), (3L, 9L), (9L, 7L))) ==
      Map(3L -> 3L, 5L -> 3L, 7L -> 3L, 9L -> 3L))
  }

  test("disjoint components keep separate labels") {
    assert(cc(Seq((1L, 2L), (10L, 11L), (11L, 12L))) ==
      Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("dense clique resolves in one pass") {
    val clique = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    assert(cc(clique) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("adversarial 1000-link chain converges in O(log n) rounds, exactly") {
    // the topology that made min-label propagation O(n): a single long
    // chain. Two-phase star contraction must finish in ~log2(n) + a
    // few rounds, not ~n. Links shuffled so no partition sees a run.
    val rnd = new scala.util.Random(17)
    val n = 1000L
    val chain = rnd.shuffle((0L until n).map(i => (i, i + 1)).toVector)
    val (labels, rounds) = Dedup.connectedComponentsWithRounds(
      chain.toDF("d1", "d2"))
    assert(rounds <= 15, s"chain took $rounds rounds — not O(log n) behavior")
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == n + 1)
    assert(got.values.forall(_ == 0L), "every node must label to the chain minimum")
  }

  test("mixed topology: chains + cliques + isolated pairs, labels are component minima") {
    val comp1 = (100L until 120L).map(i => (i, i + 1))          // chain 100..120
    val comp2 = for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j) // clique 1..5
    val comp3 = Seq((500L, 777L))                                // pair
    val got = cc(rndShuffle(comp1 ++ comp2 ++ comp3))
    assert((100L to 120L).forall(got(_) == 100L))
    assert((1L to 5L).forall(got(_) == 1L))
    assert(got(500L) == 500L && got(777L) == 500L)
  }

  private def rndShuffle(xs: Seq[(Long, Long)]): Seq[(Long, Long)] =
    new scala.util.Random(23).shuffle(xs.toVector)

  test("random graphs agree with a union-find reference") {
    val rnd = new scala.util.Random(31)
    (0 until 3).foreach { trial =>
      val n = 300
      val edges = (0 until 400).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter { case (a, b) => a != b }
      // plain union-find with path compression
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(v => v -> find(v.toInt).toLong).toMap
      // union-find roots are not necessarily component minima; remap
      val minOfRoot = expected.groupBy(_._2).map { case (r, m) => r -> m.keys.min }
      val want = expected.map { case (v, r) => v -> minOfRoot(r) }
      assert(cc(edges) == want, s"trial $trial")
    }
  }
}
