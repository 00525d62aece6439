package graft

import graft.query.SimilaritySearch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Group-capped retrieval (q110's operator): the cap-then-rank
  * contract and the answer-sized plan shape.
  */
class CappedTopKSpec extends AnyFunSuite with SharedSpark {

  private def run(
      rows: Seq[(Long, Array[Float], Int)],
      queries: Seq[(Long, Array[Float])],
      k: Int, cap: Int) = {
    import spark.implicits._
    val e = rows.toDF("vec_id", "embedding", "label")
    SimilaritySearch.cappedTopKBatch(
        e.select("vec_id", "embedding"), "embedding", "vec_id",
        e.select("vec_id", "label"), "label",
        queries.toDF("query_id", "qvec"), "query_id", "qvec",
        k = k, perGroupCap = cap, threshold = -1.0)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("rn")))
      .toSeq.sortBy(_._2)
  }

  private def vec(x: Double): Array[Float] = {
    // points on the unit circle: similarity to the x-axis query is
    // monotone in x, so ranks are readable off the construction
    val y = math.sqrt(math.max(0.0, 1.0 - x * x))
    Array(x.toFloat, y.toFloat)
  }

  test("a group's surplus hits never displace another group's best") {
    // label 0 holds the 3 MOST similar vectors; cap 2 must surface
    // label 1's best at rank 3 — rank-then-cap would return only 2
    // label-0 rows for k=3 after dropping the surplus
    val rows = Seq(
      (1L, vec(0.99), 0), (2L, vec(0.98), 0), (3L, vec(0.97), 0),
      (4L, vec(0.50), 1), (5L, vec(0.40), 1))
    val got = run(rows, Seq((100L, vec(1.0))), k = 3, cap = 2)
    assert(got == Seq((1L, 1L), (2L, 2L), (4L, 3L)))
  }

  test("cap larger than any group degenerates to the plain top-k") {
    import spark.implicits._
    val e = Tables(spark, Sf0001, "embeddings")
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val capped = SimilaritySearch.cappedTopKBatch(
      e.select("vec_id", "embedding"), "embedding", "vec_id",
      e.select("vec_id", "label"), "label",
      queries, "query_id", "qvec", k = 5, perGroupCap = 1000, threshold = 0.0)
    val plain = SimilaritySearch.topKBatch(
      e.select("vec_id", "embedding"), "embedding", "vec_id",
      queries, "query_id", "qvec", k = 5, threshold = 0.0)
    def s(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(s(capped) == s(plain))
  }

  test("both ranking stages partial-aggregate; no window in the plan") {
    val e = Tables(spark, Sf0001, "embeddings")
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val plan = SimilaritySearch.cappedTopKBatch(
        e.select("vec_id", "embedding"), "embedding", "vec_id",
        e.select("vec_id", "label"), "label",
        queries, "query_id", "qvec", k = 5, perGroupCap = 2, threshold = 0.0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_topk_by"), plan.take(2000))
    assert(!plan.contains("Window"), plan.take(2000))
  }
}
