package graft

import graft.pipeline.SkewJoin
import org.scalatest.funsuite.AnyFunSuite

class SkewJoinSpec extends AnyFunSuite with SharedSpark {

  test("salted equi-join equals the plain join on the fixture (sf0.001)") {
    val orders = Tables(spark, Sf0001, "orders")
    val customer = Tables(spark, Sf0001, "customer")
    val plain = orders.join(customer,
        orders("o_custkey") === customer("c_custkey"))
      .select("o_orderkey", "c_name").collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedEquiJoin(orders, customer, "o_custkey", "c_custkey")
      .select("o_orderkey", "c_name").collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("co-named join keys resolve via the side aliases") {
    import spark.implicits._
    // both sides keyed "k" — the case an unaliased === join fails with
    // an ambiguous-reference analysis error
    val big = (1 to 100).map(i => (i % 5, s"row$i")).toDF("k", "payload")
    val small = (0 until 5).map(i => (i, s"dim$i")).toDF("k", "name")
    val out = SkewJoin.saltedEquiJoin(big, small, "k", "k", saltFactor = 4)
      .select(org.apache.spark.sql.functions.col("gsj_b.k"), $"payload", $"name")
    assert(out.count() == 100)
    assert(out.filter($"name" === "dim2").count() == 20)
  }

  test("salted join is deterministic across runs") {
    val orders = Tables(spark, Sf0001, "orders")
    val customer = Tables(spark, Sf0001, "customer")
    def run() = SkewJoin.saltedEquiJoin(orders, customer, "o_custkey", "c_custkey", 4)
      .select("o_orderkey", "o_custkey").orderBy("o_orderkey").collect().toSeq
    assert(run() == run())
  }
}
