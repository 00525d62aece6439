package graft

import graft.pipeline.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RepeatedPassagesSpec extends AnyFunSuite with SharedSpark {

  /** In-memory reference: exact k-token window matches across doc
    * pairs, counted per occurrence pair and per distinct window.
    */
  private def ref(docs: Seq[(Long, String)], k: Int): Map[(Long, Long), (Long, Long)] = {
    val wins = docs.map { case (id, t) =>
      id -> t.trim.split("\\s+").toSeq.sliding(k).filter(_.size == k)
        .map(_.mkString(" ")).toSeq
    }
    val out = scala.collection.mutable.Map.empty[(Long, Long), (Long, Set[String])]
    for ((d1, w1) <- wins; (d2, w2) <- wins if d1 < d2) {
      var matches = 0L
      val shared = scala.collection.mutable.Set.empty[String]
      for (a <- w1; b <- w2 if a == b) { matches += 1; shared += a }
      if (matches > 0) out((d1, d2)) = (matches, shared.toSet)
    }
    out.map { case (p, (m, s)) => p -> (m, s.size.toLong) }.toMap
  }

  private def run(docs: Seq[(Long, String)], k: Int): Map[(Long, Long), (Long, Long)] = {
    import spark.implicits._
    val df = docs.toDF("doc_id", "text")
    // same pipeline as q92 but over an arbitrary frame: route through a
    // temp parquet dir so Tables() reads it like the fixture
    val dir = java.nio.file.Files.createTempDirectory("graft-rps").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Dedup.q92RepeatedPassages(spark, dir, k)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
  }

  test("handcrafted corpus: shared spans found, counts exact, short docs ignored") {
    val passage = "the quick brown fox jumps over the lazy dog"
    val docs = Seq(
      1L -> s"alpha beta $passage gamma",
      2L -> s"$passage delta epsilon zeta",
      3L -> "totally unrelated words with no shared span at all here",
      4L -> s"one two $passage three $passage", // repeats the passage twice
      5L -> "too short")
    val got = run(docs, k = 4)
    assert(got == ref(docs, 4))
    // the passage-sharing pairs all surface; the unrelated doc never does
    assert(got.keySet.forall { case (a, b) => Set(1L, 2L, 4L)(a) && Set(1L, 2L, 4L)(b) })
    assert(got.contains((1L, 2L)) && got.contains((1L, 4L)) && got.contains((2L, 4L)))
    // doc 4 holds the passage twice -> occurrence pairs exceed distinct
    val (m14, w14) = got((1L, 4L))
    assert(m14 > w14)
  }

  test("fixture (sf0.001): equals the brute-force window join") {
    val docs = Tables(spark, Sf0001, "documents")
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val got = run(docs, k = 8)
    assert(got == ref(docs, 8))
  }

  test("adversarial boilerplate: occupancy cap bounds the pair blow-up") {
    import spark.implicits._
    // one boilerplate k-window stamped on 500 docs would emit
    // 500*499/2 ≈ 125k pairs; with the cap it must emit none of them,
    // while a genuine 2-doc shared passage in the same corpus survives
    val boiler = "this site is licensed under the creative commons license"
    val real = "a genuinely shared passage between exactly two documents"
    val docs =
      (1L to 500L).map(i => i -> s"doc $i says $boiler and unique w$i") ++
        Seq(1001L -> s"first copy of $real here", 1002L -> s"second copy of $real too")
    val dir = java.nio.file.Files.createTempDirectory("graft-rps-cap").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = Dedup.q92RepeatedPassages(spark, dir, k = 4, maxDocsPerWindow = 50)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // boilerplate pairs excluded (bounded output), real pair retained
    assert(got.keySet == Set((1001L, 1002L)))
    // and without the cap the blow-up is real: the uncapped run emits
    // the full quadratic pair set the guard exists to prevent
    val uncapped = Dedup.q92RepeatedPassages(spark, dir, k = 4,
      maxDocsPerWindow = 1000).count()
    assert(uncapped == 500L * 499L / 2 + 1)
  }

  test("pre-filter is result-invisible: single-doc windows never pair") {
    // every window unique to its doc -> empty result, no exception
    val docs = (1L to 6L).map(i =>
      i -> (1 to 12).map(j => s"w${i}_$j").mkString(" "))
    assert(run(docs, k = 8).isEmpty)
  }
}
