package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Null-intolerant expressions must yield null (not crash) on null
  * input, in both interpreted and codegen paths.
  */
class NullSafetySpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("every native expression is null-safe") {
    val df = Seq((1L, Option.empty[String], Option.empty[Seq[Float]]))
      .toDF("id", "s", "v")
    val out = df.select(
      graft.functions.cosine_sim(col("v"), col("v")).as("cs"),
      graft.functions.l2_norm(col("v")).as("nrm"),
      graft.functions.hash_embed(col("s"), lit(8)).as("he"),
      graft.functions.simhash64(col("s")).as("sh"),
      graft.functions.rolling_hash(col("s")).as("rh"),
      graft.functions.minhash_text(col("s"), lit(6), lit(16)).as("mt"),
      graft.functions.chunk_text(col("s"), lit(10), lit(2)).as("ct"),
      graft.functions.byte_histogram(col("s").cast("binary"), lit(8)).as("bh"))
      .collect()(0)
    (0 until out.length).foreach(i => assert(out.isNullAt(i), s"field $i not null"))
  }

  test("null rows flow through pipeline operators without failing") {
    val docs = Seq((0L, "the quick brown fox"), (1L, null))
      .toDF("doc_id", "text")
    // charGrams guards null/short text into an EMPTY array (the
    // when/otherwise branch), which downstream size(...)>0 filters drop
    val grams = docs.select(graft.pipeline.Dedup.charGramsOf(col("text")).as("g"))
      .collect()
    assert(grams(0).getSeq[String](0).nonEmpty)
    assert(grams(1).getSeq[String](0).isEmpty)
  }
}
