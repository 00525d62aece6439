package graft

import org.scalatest.funsuite.AnyFunSuite

/** The t2 hash-match contract requires results independent of physical
  * partition layout. Re-run representative queries under a tiny
  * maxPartitionBytes (many input splits) and compare row-for-row.
  */
class DeterminismSpec extends AnyFunSuite with SharedSpark {

  private val probeQueries = Seq(
    "q9_cosine_topk", "q15_minhash_neardup", "q23_context_merge", "q5_window_topn")

  test("query results are invariant under input split size") {
    val key = "spark.sql.files.maxPartitionBytes"
    val original = spark.conf.get(key)
    try {
      val baseline = probeQueries.map { q =>
        q -> Queries.all(q)(spark, Sf0001).collect().map(_.toString).toSeq
      }.toMap
      spark.conf.set(key, (64 * 1024).toString) // 64 KiB splits
      probeQueries.foreach { q =>
        val shredded = Queries.all(q)(spark, Sf0001).collect().map(_.toString).toSeq
        assert(shredded == baseline(q), s"$q diverged under different partitioning")
      }
    } finally spark.conf.set(key, original)
  }

  test("fixture documents cannot spoof ATX headings in the synthetic MDX") {
    // ADVICE r1: a line-leading '#'-run word in a rendered segment would
    // create a 5th section and shift chunk ids vs the arithmetic oracle.
    // The q12 construction puts each segment on one line, so only words
    // of the form '#'{1,6} followed by a space could spoof; assert the
    // corpus has none and every doc yields exactly 4 sections.
    val secCounts = graft.ingest.IngestJob.sections(spark, Sf001)
      .groupBy("doc_id").count().filter(org.apache.spark.sql.functions.col("count") =!= 4)
    assert(secCounts.count() == 0, "a document split into != 4 sections")
  }
}
