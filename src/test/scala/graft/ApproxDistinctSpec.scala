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

  /** percentile_approx (GK sketch) is the scale path next to q43's
    * exact quantiles; like HLL it has no cross-engine oracle, so its
    * contract is a rank-error bound vs the exact percentile: with
    * accuracy A, the returned value's RANK must be within n/A of the
    * target rank.
    */
  test("percentile_approx rank error stays within 1/accuracy of exact") {
    val docs = Tables(spark, Sf001, "documents").select(col("n_chars"))
    val n = docs.count().toDouble
    val accuracy = 100
    for (q <- Seq(0.25, 0.5, 0.9)) {
      val approxV = docs
        .agg(percentile_approx(col("n_chars"), lit(q), lit(accuracy)))
        .head.getLong(0)
      val rankOfApprox = docs.filter(col("n_chars") <= approxV).count().toDouble
      assert(math.abs(rankOfApprox - q * n) <= n / accuracy + 1,
        s"q=$q approx=$approxV rank=$rankOfApprox target=${q * n}")
    }
  }

  test("percentile_approx returns an actual corpus value (GK property)") {
    // unlike interpolating exact quantiles, the sketch answers with a
    // sampled element — it must be a value that exists in the column
    val docs = Tables(spark, Sf001, "documents").select(col("n_chars"))
    val v = docs.agg(percentile_approx(col("n_chars"), lit(0.5), lit(100)))
      .head.getLong(0)
    assert(docs.filter(col("n_chars") === v).count() > 0)
  }
}
