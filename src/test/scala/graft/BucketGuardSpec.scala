package graft

import graft.pipeline.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BucketGuardSpec extends AnyFunSuite with SharedSpark {

  test("boilerplate cluster: over-cap buckets excluded, candidate volume bounded") {
    import spark.implicits._
    // adversarial corpus: one 2000-doc cluster of identical boilerplate
    // (usually collapsed by exact dedup upstream — this spec models the
    // pipeline misuse the cap guards against) plus one genuine near-dup
    // pair that must survive the cap
    val boiler = (0L until 2000L).map(i =>
      (i, "standard legal disclaimer header repeated across the whole corpus verbatim"))
    val pair = Seq(
      (9000L, "a genuinely distinctive document about rivers, turtles and map folding"),
      (9001L, "a genuinely distinctive document about rivers, turtles and maps folding"))
    val docs = (boiler ++ pair).toDF("doc_id", "text")
    val sigs = docs.select(col("doc_id"),
      graft.functions.minhash_text(col("text"), lit(Dedup.GramLen), lit(Dedup.NumHashes))
        .as("sig"))
    val bands = Dedup.minhashBands(sigs)

    val capped = Dedup.minhashCollisions(bands, maxOccupancy = 100)
    val n = capped.count()
    // identical docs collide in all 64 bands: uncapped would be
    // 64 * 2000*1999/2 ≈ 1.3e8 collision rows; with the cap only the
    // small pair's band collisions remain (<= one per band)
    assert(n <= 64, s"candidate volume not bounded: $n rows")
    assert(capped.filter(col("d1") === 9000L && col("d2") === 9001L).count() >= 1,
      "the genuine near-dup pair must survive the occupancy cap")
    assert(capped.filter(col("d1") < 2000L && col("d2") < 2000L).isEmpty,
      "boilerplate-cluster pairs must be excluded, not partially emitted")
  }

  test("cap is a no-op plan-wise when no bucket exceeds it") {
    import spark.implicits._
    val docs = (0L until 50L).map(i => (i, s"unique document number $i with its own words"))
      .toDF("doc_id", "text")
    val sigs = docs.select(col("doc_id"),
      graft.functions.minhash_text(col("text"), lit(Dedup.GramLen), lit(Dedup.NumHashes))
        .as("sig"))
    val bands = Dedup.minhashBands(sigs)
    val kept = graft.util.BucketGuard.capOccupancy(
      bands, Seq("band", "bucket"), cap = 10000, what = "spec")
    // untouched frame: the guard returns the input reference itself
    assert(kept eq bands)
  }
}
