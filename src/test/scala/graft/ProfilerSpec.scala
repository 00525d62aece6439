package graft

import graft.pipeline.Profiler
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ProfilerSpec extends AnyFunSuite with SharedSpark {

  test("profile computes exact per-column stats, nulls included") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("a")), (Some(2L), None),
      (None, Some("b")), (Some(2L), Some("a"))
    ).toDF("k", "s")
    val got = Profiler.profile(df, "t", Seq("k", "s"))
      .collect().map(r => (r.getString(1),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5), r.getString(6))))
      .toMap
    assert(got("k") == ((4L, 1L, 2L, "1", "2")))
    assert(got("s") == ((4L, 1L, 2L, "a", "b")))
  }

  test("min/max are native-typed before the cast (no lexicographic 10<9)") {
    import spark.implicits._
    val df = Seq(9L, 10L, 2L).toDF("v")
    val r = Profiler.profile(df, "t", Seq("v")).head
    assert(r.getString(5) == "2" && r.getString(6) == "10")
  }

  test("one scan per table: a single aggregate feeds every column row") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, s"s$i")).toDF("a", "b")
    // the per-column reshape reads the checkpointed 1-row aggregate, so
    // the plan of the final union contains no second table scan
    val out = Profiler.profile(df, "t", Seq("a", "b"))
    assert(out.count() == 2)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("LocalTableScan") || !plan.contains("HashAggregate"),
      s"reshape should read the checkpointed aggregate, not re-aggregate:\n$plan")
  }

  test("q90 on the fixture matches direct SQL spot-checks") {
    val out = Profiler.q90Profile(spark, Sf0001)
    val byKey = out.collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(4)))
      .toMap
    val docs = Tables(spark, Sf0001, "documents")
    assert(byKey(("documents", "doc_id")) ==
      ((docs.count(), docs.select("doc_id").distinct().count())))
    val langNdv = docs.select("lang").distinct().count()
    assert(byKey(("documents", "lang"))._2 == langNdv)
  }
}
