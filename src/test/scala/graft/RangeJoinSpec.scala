package graft

import graft.pipeline.RangeJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("binned join equals the naive inequality join (seeded random data)") {
    val rnd = new scala.util.Random(42)
    val points = (0 until 400)
      .map(i => (i.toLong, rnd.nextInt(40).toLong, rnd.nextLong(2000) - 1000))
      .toDF("pid", "k", "p")
    val intervals = (0 until 200).map { i =>
      val lo = rnd.nextLong(2000) - 1000
      (i.toLong, rnd.nextInt(40).toLong, lo, lo + rnd.nextLong(300))
    }.toDF("iid", "k", "lo", "hi")
    val binned = RangeJoin
      .pointInInterval(points, intervals, "p", "lo", "hi",
        binWidth = 128, keyCols = Seq("k"))
      .select(col("pid"), col("ivl_iid").as("iid"))
      .as[(Long, Long)].collect().toSet
    val naive = points.as("a")
      .join(intervals.as("b"),
        col("a.k") === col("b.k")
          && col("a.p") >= col("b.lo") && col("a.p") < col("b.hi"))
      .select(col("pid"), col("iid")).as[(Long, Long)].collect().toSet
    assert(naive.nonEmpty && binned == naive)
  }

  test("half-open boundaries: lo matches, hi does not") {
    val points = Seq((1L, 10L), (2L, 20L)).toDF("pid", "p")
    val intervals = Seq((7L, 10L, 20L)).toDF("iid", "lo", "hi")
    val hits = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", 64)
      .select("pid").as[Long].collect().toSet
    assert(hits == Set(1L))
  }

  test("negative coordinates bin correctly across the zero boundary") {
    val points = Seq((1L, -1L), (2L, 0L), (3L, -129L)).toDF("pid", "p")
    val intervals = Seq((7L, -130L, 1L)).toDF("iid", "lo", "hi")
    val hits = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", 128)
      .select("pid").as[Long].collect().toSet
    assert(hits == Set(1L, 2L, 3L))
  }

  test("empty and inverted intervals match nothing") {
    val points = Seq((1L, 5L)).toDF("pid", "p")
    val intervals = Seq((7L, 5L, 5L), (8L, 9L, 3L)).toDF("iid", "lo", "hi")
    assert(RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", 16).count() == 0)
  }
}
