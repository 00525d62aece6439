package graft
// (waterfill saturation tests appended at the bottom of this suite)

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

  test("waterfill: small sources saturate, allocations sum exactly to budget") {
    // skewed availabilities: total 2000, budget 1000 — the two tiny
    // sources (10, 40) saturate; the rest split 950
    val sizes = Seq(("tiny", 10L), ("small", 40L), ("mid", 450L),
      ("big", 700L), ("huge", 800L)).toDF("source", "avail")
    val got = Sampling.waterfill(sizes).collect()
      .map(r => r.getString(0) -> ((r.getBoolean(2), r.getLong(3)))).toMap
    assert(got("tiny") == ((true, 10L)) && got("small") == ((true, 40L)))
    assert(!got("mid")._1 && !got("big")._1 && !got("huge")._1)
    val unsat = Seq(got("mid")._2, got("big")._2, got("huge")._2)
    assert(unsat.sum == 950L)
    // even split 316 each, remainder 2 to the two LARGEST unsaturated
    assert(got("mid")._2 == 316L && got("big")._2 == 317L && got("huge")._2 == 317L)
    assert(got.values.map(_._2).sum == 1000L)
  }

  test("waterfill: no saturation on near-equal sources; allocation never exceeds avail") {
    val sizes = Seq(("a", 400L), ("b", 401L), ("c", 399L)).toDF("source", "avail")
    val rows = Sampling.waterfill(sizes).collect()
    assert(rows.forall(r => !r.getBoolean(2)))
    assert(rows.forall(r => r.getLong(3) <= r.getLong(1)))
    assert(rows.map(_.getLong(3)).sum == 1200L / 2)
  }

  test("waterfill invariants on random availability profiles") {
    val rnd = new scala.util.Random(11)
    (0 until 8).foreach { trial =>
      val k = 2 + rnd.nextInt(9)
      // heavy-tailed sizes so saturation actually occurs in most trials
      val sizes = (0 until k).map(i =>
        (s"src_$i", (math.pow(10, rnd.nextInt(4)) * (1 + rnd.nextInt(9))).toLong))
      val total = sizes.map(_._2).sum
      val rows = Sampling.waterfill(sizes.toDF("source", "avail")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2), r.getLong(3)))
      // feasibility: 0 <= allocated <= avail, exact budget partition
      rows.foreach { case (s, avail, _, alloc) =>
        assert(alloc >= 0L && alloc <= avail, s"trial $trial $s: $alloc vs $avail")
      }
      assert(rows.map(_._4).sum == total / 2, s"trial $trial budget")
      // saturated sources take everything; unsaturated allocations are
      // within 1 token of each other (even split + remainder spread)
      rows.filter(_._3).foreach { case (s, avail, _, alloc) =>
        assert(alloc == avail, s"trial $trial $s saturated but partial")
      }
      val unsat = rows.filterNot(_._3).map(_._4)
      if (unsat.nonEmpty)
        assert(unsat.max - unsat.min <= 1L, s"trial $trial uneven split $unsat")
      // water level: every saturated avail <= every unsaturated allocation
      val satAvail = rows.filter(_._3).map(_._2)
      if (satAvail.nonEmpty && unsat.nonEmpty)
        assert(satAvail.max <= unsat.min, s"trial $trial level violated")
    }
  }
}
