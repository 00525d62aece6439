package graft

import graft.pipeline.Sampling
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("buckets lie in [0, 1000) and are a pure function of the key") {
    val df = (0L until 5000L).toDF("id")
    val b1 = df.select(col("id"), Sampling.keepBucket(col("id")).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(b1.values.forall(b => b >= 0 && b < 1000))
    val b2 = df.repartition(13)
      .select(col("id"), Sampling.keepBucket(col("id")).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(b1 == b2)
  }

  test("keep rate tracks the requested per-mille rate") {
    val df = (0L until 20000L).toDF("id")
    for (rate <- Seq(100L, 500L, 900L)) {
      val kept = Sampling.sampled(df, "id", lit(rate)).count()
      val expected = 20000.0 * rate / 1000.0
      assert(math.abs(kept - expected) < 0.05 * 20000,
        s"rate $rate: kept $kept of 20000, expected ≈ $expected")
    }
  }

  test("sampling is join-consistent: the same key keeps in every table") {
    val a = (0L until 2000L).toDF("id")
    val b = (1000L until 3000L).toDF("id")
    val keptA = Sampling.sampled(a, "id", lit(300L))
      .select("id").as[Long].collect().toSet
    val keptB = Sampling.sampled(b, "id", lit(300L))
      .select("id").as[Long].collect().toSet
    val shared = (1000L until 2000L).toSet
    assert((keptA & shared) == (keptB & shared))
  }
}
