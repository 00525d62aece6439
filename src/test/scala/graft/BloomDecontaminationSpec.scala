package graft

import graft.functions.bloom_might_contain
import graft.pipeline.Decontamination
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter
import org.scalatest.funsuite.AnyFunSuite

class BloomDecontaminationSpec extends AnyFunSuite with SharedSpark {

  private def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  test("bloom_might_contain: no false negatives, few false positives") {
    import spark.implicits._
    val inserted = (0 until 2000).map(i => s"gram_$i")
    val bf = inserted.toDF("g").stat.bloomFilter("g", 2000, 0.01)
    val bits = serialize(bf)

    val hits = inserted.toDF("g")
      .filter(bloom_might_contain(lit(bits), col("g"))).count()
    assert(hits == 2000, "a Bloom filter can never miss an inserted item")

    val foreign = (0 until 10000).map(i => s"other_$i")
    val fp = foreign.toDF("g")
      .filter(bloom_might_contain(lit(bits), col("g"))).count()
    // fpp 0.01 with 5x slack — statistical, but deterministic here
    // (fixed hash seeds in the sketch, fixed inputs)
    assert(fp <= 500, s"false-positive count $fp far above the 1% target")
  }

  test("expression works from SQL text and interpreted eval agrees with codegen") {
    import spark.implicits._
    graft.functions.registerAll(spark)
    val bf = Seq("alpha", "beta").toDF("g").stat.bloomFilter("g", 100, 0.01)
    val bits = serialize(bf)
    spark.createDataset(Seq(bits)).toDF("bits").createOrReplaceTempView("bf_bits")
    val sql = spark.sql(
      "SELECT bloom_might_contain(bits, 'alpha') AS a, " +
        "bloom_might_contain(bits, 'beta') AS b FROM bf_bits").collect()(0)
    assert(sql.getBoolean(0) && sql.getBoolean(1))
  }

  test("q95 equals q63 exactly: the Bloom pre-filter is result-invisible") {
    val dir = "/root/testdata/sf0.001"
    val exact = Decontamination.contaminated(spark, dir).collect().toSeq
    val bloom = Decontamination.contaminatedBloom(spark, dir).collect().toSeq
    assert(bloom == exact)
    // also under a deliberately undersized filter (high fpp): more
    // candidates survive the pre-filter, the exact join still kills them
    val sloppy =
      Decontamination.contaminatedBloom(spark, dir, fpp = 0.5).collect().toSeq
    assert(sloppy == exact)
  }
}
