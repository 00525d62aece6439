package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch-based distinct counting (B-5 breadth): HLL++ has no
  * cross-engine oracle (the estimate is implementation-defined), so its
  * contract is pinned here instead — bounded relative error vs the exact
  * count on the real corpus, and determinism across partitionings (the
  * sketch merge is commutative, so a re-run or different parallelism
  * must not change the estimate).
  */
class ApproxDistinctSpec extends AnyFunSuite with SharedSpark {

  test("approx_count_distinct tracks exact distinct within rsd on documents") {
    val docs = Tables(spark, Sf001, "documents")
    val row = docs.agg(
      countDistinct(col("text")).as("exact"),
      approx_count_distinct(col("text"), rsd = 0.02).as("approx")).head
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    val relErr = math.abs(approx - exact) / exact
    assert(relErr < 0.06, s"exact=$exact approx=$approx relErr=$relErr")
  }

  test("the estimate is identical across partitionings (merge-invariant)") {
    val docs = Tables(spark, Sf001, "documents")
    val a = docs.agg(approx_count_distinct(col("text"), 0.02)).head.getLong(0)
    val b = docs.repartition(17)
      .agg(approx_count_distinct(col("text"), 0.02)).head.getLong(0)
    assert(a == b)
  }
}
