package graft

import graft.pipeline.AsofJoin
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property check: the union+window as-of join equals the obvious
  * per-row specification (argmax over qualifying right rows) on random
  * data — keys and times drawn from small domains so collisions and
  * equal-time ties actually happen. Driven directly (no scalatest-plus
  * bridge in the offline dependency set).
  */
class AsofJoinPropertiesSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private val genCase = for {
    nL <- Gen.choose(1, 20)
    nR <- Gen.choose(0, 20)
    left <- Gen.listOfN(nL, Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 20L)))
    right <- Gen.listOfN(nR, Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 20L)))
    strict <- Gen.oneOf(true, false)
  } yield (
    left.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) },
    // unique (key, time) on the right — the operator's contract;
    // payload encodes identity so "which row won" is checkable
    right.distinct.map { case (k, t) => (k, t, s"p$k@$t") },
    strict)

  test("backward join equals the per-row argmax specification") {
    val prop = Prop.forAll(genCase) { in =>
      val (leftRows, rightRows, strict) = in
      val left = leftRows.toDF("lid", "k", "t")
      val right = rightRows.toDF("k", "t", "v")
      val got = AsofJoin
        .backward(left, right, "k", "t", Seq("v"), strict = strict)
        .select(col("lid"), col("asof.v"))
        .as[(Long, Option[String])].collect().toMap
      val expected = leftRows.map { case (lid, k, t) =>
        val qualifying = rightRows.filter { case (rk, rt, _) =>
          rk == k && (if (strict) rt < t else rt <= t)
        }
        lid -> (if (qualifying.isEmpty) None
                else Some(qualifying.maxBy(_._2)._3))
      }.toMap
      got == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, s"scalacheck: ${res.status}")
  }
}
