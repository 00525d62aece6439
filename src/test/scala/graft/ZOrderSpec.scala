package graft

import graft.pipeline.ZOrder
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite with SharedSpark {

  private def checkProp(p: Prop): Unit = {
    val params = SCTest.Parameters.default.withMinSuccessfulTests(100)
    val res = SCTest.check(params, p)
    assert(res.passed, s"scalacheck: ${res.status}")
  }

  /** Reference Morton interleave, plain Scala. */
  private def mortonRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map(i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum

  test("interleave matches the reference bit loop (ScalaCheck)") {
    import spark.implicits._
    val gen = Gen.listOfN(50,
      Gen.zip(Gen.chooseNum(0L, 255L), Gen.chooseNum(0L, 255L)))
    checkProp(Prop.forAll(gen) { pairs: List[(Long, Long)] =>
      val got = pairs.toDF("x", "y")
        .select(ZOrder.interleave(col("x"), col("y")).as("z"))
        .collect().map(_.getLong(0)).toList
      got == pairs.map { case (x, y) => mortonRef(x, y, ZOrder.DimBits) }
    })
  }

  test("z-order buckets bound BOTH dimension envelopes (the skipping claim)") {
    val rows = ZOrder.clustered(spark, Sf0001).collect()
    assert(rows.length > 32, "expected most of the 64 z-ranges populated")
    val (partLo, partHi, suppLo, suppHi) = (
      rows.map(_.getAs[Long]("min_part")).min,
      rows.map(_.getAs[Long]("max_part")).max,
      rows.map(_.getAs[Long]("min_supp")).min,
      rows.map(_.getAs[Long]("max_supp")).max)
    val partDomain = (partHi - partLo).max(1L)
    val suppDomain = (suppHi - suppLo).max(1L)
    // each 64th of z-space is a 32×32 block of the 256×256 tile grid:
    // both envelopes must be a small slice of the domain, not ~all of
    // it (which is what a linear sort gives the secondary dimension)
    rows.foreach { r =>
      val ps = r.getAs[Long]("max_part") - r.getAs[Long]("min_part")
      val ss = r.getAs[Long]("max_supp") - r.getAs[Long]("min_supp")
      assert(ps * 4 <= partDomain,
        s"bucket ${r.getAs[Long]("bucket")} part envelope $ps of $partDomain")
      assert(ss * 4 <= suppDomain,
        s"bucket ${r.getAs[Long]("bucket")} supp envelope $ss of $suppDomain")
    }
  }

  test("scaledClustered (production variant) bounds both envelopes with no window") {
    val df = ZOrder.scaledClustered(spark, Sf0001)
    // the whole point of q69b: NO window / global sort in the plan
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"production z-layout must not window:\n$plan")
    val rows = df.collect()
    assert(rows.length > 32, "expected most of the 64 z-ranges populated")
    val (partLo, partHi, suppLo, suppHi) = (
      rows.map(_.getAs[Long]("min_part")).min,
      rows.map(_.getAs[Long]("max_part")).max,
      rows.map(_.getAs[Long]("min_supp")).min,
      rows.map(_.getAs[Long]("max_supp")).max)
    val partDomain = (partHi - partLo).max(1L)
    val suppDomain = (suppHi - suppLo).max(1L)
    rows.foreach { r =>
      val ps = r.getAs[Long]("max_part") - r.getAs[Long]("min_part")
      val ss = r.getAs[Long]("max_supp") - r.getAs[Long]("min_supp")
      assert(ps * 4 <= partDomain,
        s"bucket ${r.getAs[Long]("bucket")} part envelope $ps of $partDomain")
      assert(ss * 4 <= suppDomain,
        s"bucket ${r.getAs[Long]("bucket")} supp envelope $ss of $suppDomain")
    }
  }

  test("repartitionByZ keeps rows and bounds per-partition envelopes") {
    import spark.implicits._
    val li = Tables(spark, Sf0001, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val n = li.count()
    val tiles = 1 << ZOrder.DimBits
    val (pmax, smax) = li.agg(max("l_partkey"), max("l_suppkey"))
      .as[(Long, Long)].first()
    // production-shaped keying: value-scaled buckets (no global sort)
    val keyed = li
      .withColumn("xb", least(lit(tiles - 1L),
        expr(s"l_partkey * $tiles div ${pmax + 1}")))
      .withColumn("yb", least(lit(tiles - 1L),
        expr(s"l_suppkey * $tiles div ${smax + 1}")))
    val z = ZOrder.interleave(col("xb").cast("long"), col("yb").cast("long"))
    val parts = ZOrder.repartitionByZ(keyed, 16, z)
    assert(parts.count() === n)
    val envelopes = parts
      .select(spark_partition_id().as("pid"), col("l_partkey"), col("l_suppkey"))
      .groupBy("pid")
      .agg((max("l_partkey") - min("l_partkey")).as("ps"),
        (max("l_suppkey") - min("l_suppkey")).as("ss"),
        count(lit(1)).as("cnt"))
      .collect()
    // with 16 z-range partitions, an average partition must not span the
    // whole domain in BOTH dimensions (linear sort fails this for the
    // secondary dim); assert on the mean to tolerate sampled boundaries
    val meanPs = envelopes.map(_.getAs[Long]("ps")).sum / envelopes.length
    val meanSs = envelopes.map(_.getAs[Long]("ss")).sum / envelopes.length
    assert(meanPs < pmax / 2, s"mean part span $meanPs of domain $pmax")
    assert(meanSs < smax / 2, s"mean supp span $meanSs of domain $smax")
  }
}
