package graft

import graft.pipeline.AsofJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsofJoinSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def left = Seq(
    (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L), (4L, "b", 5L))
    .toDF("lid", "k", "t")

  private def right = Seq(
    ("a", 10L, "r@10"), ("a", 25L, "r@25"), ("b", 50L, "r@50"))
    .toDF("k", "t", "v")

  test("inclusive backward join picks the latest right row at or before t") {
    val out = AsofJoin.backward(left, right, "k", "t", Seq("v"))
      .select(col("lid"), col("asof.v")).as[(Long, Option[String])]
      .collect().toMap
    assert(out(1L).contains("r@10")) // equal time visible when inclusive
    assert(out(2L).contains("r@10")) // 25 is in the future of t=20
    assert(out(3L).contains("r@25"))
    assert(out(4L).isEmpty) // only right row for b is later -> no match
  }

  test("strict backward join excludes the equal-time right row") {
    val out = AsofJoin.backward(left, right, "k", "t", Seq("v"), strict = true)
      .select(col("lid"), col("asof.v")).as[(Long, Option[String])]
      .collect().toMap
    assert(out(1L).isEmpty) // r@10 no longer visible at t=10
    assert(out(2L).contains("r@10"))
    assert(out(3L).contains("r@25"))
  }

  test("left columns and row count survive unchanged (left-outer)") {
    val out = AsofJoin.backward(left, right, "k", "t", Seq("v"))
    assert(out.count() == 4)
    assert(out.columns.toSeq == Seq("lid", "k", "t", "asof"))
  }

  test("null right times/keys match nothing; null left times match nothing") {
    val l = Seq((1L, Some("a"), Some(10L)), (2L, Some("a"), None))
      .toDF("lid", "k", "t")
    val r = Seq((Some("a"), None: Option[Long], "null-time"),
        (None: Option[String], Some(5L), "null-key"))
      .toDF("k", "t", "v")
    val out = AsofJoin.backward(l, r, "k", "t", Seq("v"))
      .select(col("lid"), col("asof.v")).as[(Long, Option[String])]
      .collect().toMap
    assert(out(1L).isEmpty, "null-time right row leaked as a match")
    assert(out(2L).isEmpty, "null-time left row matched something")
  }

  test("multi-column payload keeps field names") {
    val r2 = right.withColumn("w", col("t") * 2)
    val row = AsofJoin.backward(left, r2, "k", "t", Seq("v", "w"))
      .filter(col("lid") === 3L).select("asof.v", "asof.w").head
    assert(row.getString(0) == "r@25" && row.getLong(1) == 50L)
  }
}
