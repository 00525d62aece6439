package graft

import graft.pipeline.Bucketing
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located joins: the join over two tables bucketed on the
  * join key must plan WITHOUT a shuffle exchange (and match the plain
  * join's results).
  */
class BucketingSpec extends AnyFunSuite with SharedSpark {

  test("join of bucketed tables is exchange-free and correct") {
    val orders = Tables(spark, Sf0001, "orders")
    val lineitem = Tables(spark, Sf0001, "lineitem")
    Bucketing.writeBucketed(orders, "orders_b", "o_orderkey", 4)
    Bucketing.writeBucketed(lineitem, "lineitem_b", "l_orderkey", 4)

    // force a sort-merge plan so the exchange-elision is what's tested
    val broadcastThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = Bucketing.bucketedJoin(
        spark, "lineitem_b", "l_orderkey", "orders_b", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"))

      val expected = lineitem.join(orders,
        lineitem("l_orderkey") === orders("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
