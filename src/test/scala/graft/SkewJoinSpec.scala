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

  test("salted join is deterministic across runs") {
    val orders = Tables(spark, Sf0001, "orders")
    val customer = Tables(spark, Sf0001, "customer")
    def run() = SkewJoin.saltedEquiJoin(orders, customer, "o_custkey", "c_custkey", 4)
      .select("o_orderkey", "o_custkey").orderBy("o_orderkey").collect().toSeq
    assert(run() == run())
  }
}
