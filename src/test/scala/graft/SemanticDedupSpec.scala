package graft

import graft.pipeline.SemanticDedup
import org.scalatest.funsuite.AnyFunSuite

/** SemDeDup within-cell pruning: drop iff SOME ≺-earlier cell-mate is
  * τ-close — the published upper-triangular rule, whose subtleties
  * (chain drops, cell isolation, rank policy, fail-safe cap) the
  * fixture oracle (q102) can't isolate individually.
  */
class SemanticDedupSpec extends AnyFunSuite with SharedSpark {

  private def rot(deg: Double): Array[Float] = {
    val r = math.toRadians(deg)
    Array(math.cos(r).toFloat, math.sin(r).toFloat)
  }

  private def keptIds(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("a dropped row still drops its own later neighbors (chain rule)") {
    import spark.implicits._
    // A at 0°, B at 20°, C at 40°, τ = 0.9: cos(A,B) = cos(B,C) ≈ 0.94
    // ≥ τ but cos(A,C) ≈ 0.77 < τ. The published rule drops C because
    // B ≺ C is τ-close — even though B itself is dropped (a greedy
    // keep-only-vs-kept variant would KEEP C; that is not SemDeDup).
    val df = Seq((1L, rot(0), 0L), (2L, rot(20), 0L), (3L, rot(40), 0L))
      .toDF("id", "emb", "cell")
    assert(keptIds(SemanticDedup.dedupWithinCells(
      df, "id", "emb", "cell", tau = 0.9, rankCol = "id")) == Set(1L))
  }

  test("pairs in different cells are never compared") {
    import spark.implicits._
    val df = Seq((1L, rot(0), 0L), (2L, rot(5), 1L))
      .toDF("id", "emb", "cell")
    assert(keptIds(SemanticDedup.dedupWithinCells(
      df, "id", "emb", "cell", tau = 0.9, rankCol = "id")) == Set(1L, 2L))
  }

  test("rank column picks the survivor (keep-best-quality policy)") {
    import spark.implicits._
    // τ-close pair; quality rank 1 beats rank 5 regardless of id order
    val df = Seq((1L, rot(0), 0L, 5L), (2L, rot(5), 0L, 1L))
      .toDF("id", "emb", "cell", "quality_rank")
    assert(keptIds(SemanticDedup.dedupWithinCells(
      df, "id", "emb", "cell", tau = 0.9, rankCol = "quality_rank")) == Set(2L))
  }

  test("an over-cap cell fails safe: every member kept, other cells still dedup") {
    import spark.implicits._
    val df = Seq(
      // cell 0: three τ-close rows, over the cap of 2 -> excluded from
      // comparison, ALL kept (dedup's safe direction)
      (1L, rot(0), 0L), (2L, rot(5), 0L), (3L, rot(10), 0L),
      // cell 1: τ-close pair under the cap -> still dedups
      (4L, rot(0), 1L), (5L, rot(5), 1L))
      .toDF("id", "emb", "cell")
    assert(keptIds(SemanticDedup.dedupWithinCells(
      df, "id", "emb", "cell", tau = 0.9, rankCol = "id",
      maxCellSize = 2)) == Set(1L, 2L, 3L, 4L))
  }
}
