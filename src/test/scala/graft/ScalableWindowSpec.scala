package graft

import graft.pipeline.ScalableWindow
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScalableWindowSpec extends AnyFunSuite with SharedSpark {

  test("globalRunningSum equals the single-partition window on shuffled input") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val rows = rnd.shuffle((0L until 10000L).map(i => (i, rnd.nextInt(100).toLong)).toVector)
    val df = rows.toDF("k", "v").repartition(16)

    val got = ScalableWindow.globalRunningSum(df, "v", "cum", col("k").asc)
    val expect = df.withColumn("cum",
      sum(col("v")).over(Window.orderBy(col("k"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert(got.orderBy("k").collect().toSeq == expect.orderBy("k").collect().toSeq)
    // same columns, in order
    assert(got.columns.toSeq == Seq("k", "v", "cum"))
  }

  test("descending order with tiebreaker; duplicate sort values stay exact") {
    import spark.implicits._
    // many duplicate primary keys — the doc_id tiebreaker makes the
    // order total, which is the operator's stated contract
    val rows = (0L until 5000L).map(i => (i % 7, i, 1L))
    val df = rows.toDF("grp", "id", "v").repartition(8)
    val got = ScalableWindow.globalRunningSum(df, "v", "cum",
      col("grp").desc, col("id").asc)
    val expect = df.withColumn("cum",
      sum(col("v")).over(Window.orderBy(col("grp").desc, col("id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert(got.orderBy("grp", "id").collect().toSeq ==
      expect.orderBy("grp", "id").collect().toSeq)
  }

  test("negative values: partition totals are exact, not max-of-prefix") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // values swing negative so a partition's max prefix is NOT its
    // total — the regression the sum(value) totals fix guards against
    val rows = rnd.shuffle(
      (0L until 8000L).map(i => (i, rnd.nextInt(201).toLong - 100L)).toVector)
    val df = rows.toDF("k", "v").repartition(16)
    val got = ScalableWindow.globalRunningSum(df, "v", "cum", col("k").asc)
    val expect = df.withColumn("cum",
      sum(col("v")).over(Window.orderBy(col("k"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert(got.orderBy("k").collect().toSeq == expect.orderBy("k").collect().toSeq)
  }

  test("degenerate inputs: empty frame and single row") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("k", "v")
    assert(ScalableWindow.globalRunningSum(empty, "v", "cum", col("k")).isEmpty)
    val one = Seq((1L, 42L)).toDF("k", "v")
    val got = ScalableWindow.globalRunningSum(one, "v", "cum", col("k")).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 42L, 42L)))
  }

  test("no data-sized single-partition sort: the data path is range-partitioned") {
    import spark.implicits._
    val df = (0L until 1000L).map(i => (i, 1L)).toDF("k", "v").repartition(8)
    val plan = ScalableWindow.globalRunningSum(df, "v", "cum", col("k"))
      .queryExecution.executedPlan.toString
    // the shuffle that orders the DATA is a range partitioning, and the
    // only window sits above the per-partition totals aggregation
    assert(plan.contains("rangepartitioning"))
    val windowIdx = plan.indexOf("Window")
    val aggIdx = plan.indexOf("HashAggregate")
    assert(windowIdx >= 0 && aggIdx >= 0,
      s"expected a Window over the totals aggregate in:\n$plan")
  }

  test("q87 shape at sf0.001: greedy-by-density prefix within budget") {
    val out = ScalableWindow.q87BudgetSelect(spark, Sf0001).cache()
    try {
      val docs = Tables(spark, Sf0001, "documents")
        .select(size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
      val budget = docs.agg(sum("n")).head.getLong(0) / 10
      // selected mass is within budget, and nonempty
      val sel = out.agg(sum("n_tokens"), max("cum_tokens")).head
      assert(out.count() > 0)
      assert(sel.getLong(1) <= budget)
      // the selection is the PREFIX of the density ordering: every
      // selected density >= every unselected density (up to the doc_id
      // tiebreak, checked via the max cum_tokens being the boundary)
      assert(sel.getLong(0) == sel.getLong(1))
    } finally out.unpersist()
  }
}
