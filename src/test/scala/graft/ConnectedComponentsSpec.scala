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
}
