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

  /** In-memory merged-span reference: diagonal runs over exact window
    * matches, per (d1 < d2): (n_spans, max_span_tokens, total_span_tokens).
    */
  private def refSpans(
      docs: Seq[(Long, String)], k: Int): Map[(Long, Long), (Long, Long, Long)] = {
    val wins = docs.map { case (id, t) =>
      id -> t.trim.split("\\s+").toSeq.sliding(k).filter(_.size == k)
        .map(_.mkString(" ")).toVector
    }
    val out = scala.collection.mutable.Map.empty[(Long, Long), (Long, Long, Long)]
    for ((d1, w1) <- wins; (d2, w2) <- wins if d1 < d2) {
      val matches = for {
        (a, i) <- w1.zipWithIndex; (b, j) <- w2.zipWithIndex if a == b
      } yield (i, j)
      if (matches.nonEmpty) {
        val runs = matches.groupBy { case (i, j) => i - j }.toSeq.flatMap {
          case (_, ps) =>
            val sorted = ps.map(_._1).sorted
            // split consecutive-i runs within the diagonal
            sorted.foldLeft(List.empty[List[Int]]) {
              case (acc @ (h :: rest), i) if h.head == i - 1 => (i :: h) :: rest
              case (acc, i) => List(i) :: acc
            }.map(_.size)
        }
        out((d1, d2)) = (
          runs.size.toLong,
          runs.map(_ + k - 1).max.toLong,
          runs.map(_ + k - 1).sum.toLong)
      }
    }
    out.toMap
  }

  test("q101 merges adjacent windows into maximal spans") {
    import spark.implicits._
    val passage = (1 to 20).map(i => s"p$i").mkString(" ") // 20 shared tokens
    val docs = Seq(
      1L -> s"alpha beta $passage gamma delta",
      2L -> s"$passage one two three four five",
      // doc 3 shares two DISJOINT 10-token halves of the passage with 1/2
      3L -> ((1 to 10).map(i => s"p$i").mkString(" ") + " zzz " +
        (11 to 20).map(i => s"p$i").mkString(" ")),
      4L -> "nothing shared with anyone here at all in this text")
    val dir = java.nio.file.Files.createTempDirectory("graft-spans").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = Dedup.q101RepeatedSpans(spark, dir, k = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got == refSpans(docs, 4))
    // the 20-token passage shared by 1 and 2 is ONE maximal span of 20
    assert(got((1L, 2L)) == ((1L, 20L, 20L)))
    // docs 1/3 share two disjoint 10-token runs -> two spans of 10
    assert(got((1L, 3L)) == ((2L, 10L, 20L)))
    assert(!got.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("q101 equals the reference on the fixture (sf0.001)") {
    val docs = Tables(spark, Sf0001, "documents")
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft-spans-fx").toString
    import spark.implicits._
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = Dedup.q101RepeatedSpans(spark, dir, k = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got == refSpans(docs, 8))
  }
}
