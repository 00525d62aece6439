package graft

import graft.pipeline.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** The approximate paths must reproduce their exact baselines on the
  * fixtures: MinHash-LSH (q15) vs all-pairs n-gram Jaccard (q14), and the
  * ANN join (q25) vs all-pairs cosine (q20).
  */
class DedupEquivalenceSpec extends AnyFunSuite with SharedSpark {

  test("minhash LSH join equals the exact n-gram Jaccard join (sf0.001)") {
    val exact = Dedup.ngramJaccard(spark, Sf0001).collect().toSeq
    val lsh = Dedup.minhashNearDup(spark, Sf0001).collect().toSeq
    assert(lsh == exact)
  }

  test("ANN cosine join equals the exact all-pairs join (sf0.001)") {
    val exact = Dedup.cosineNearDup(spark, Sf0001).collect().toSeq
    val ann = Dedup.annCosineNearDup(spark, Sf0001).collect().toSeq
    assert(ann == exact)
  }

  test("exact dedup groups identical texts (sf0.001)") {
    val df = Dedup.exact(spark, Sf0001)
    val docs = Tables(spark, Sf0001, "documents")
    assert(df.count() <= docs.count())
    // n_copies sums back to the corpus size
    val total = df.agg(org.apache.spark.sql.functions.sum("n_copies"))
      .collect()(0).getLong(0)
    assert(total == docs.count())
  }
}
