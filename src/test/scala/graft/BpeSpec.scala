package graft

import graft.functions.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite with SharedSpark {

  test("merges table loads from the classpath with line-number ranks") {
    assert(!Bpe.ranks.isEmpty)
    // the fixture's first merge is rank 0
    val first = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/graft/bpe_merges.txt"), "UTF-8")
      .getLines().next().trim
    assert(Bpe.ranks.get(first) == 0)
  }

  test("greedy application: lowest rank first, all occurrences, left-to-right") {
    // fixture ranks: "e r"=0, "i n"=1 — 'erer' merges BOTH er pairs in
    // one pass; 'iner' applies rank 0 before rank 1 is even relevant
    assert(Bpe.ranks.get("e r") == 0)
    assert(Bpe.tokensOf("erer") == Seq("er", "er"))
    // overlapping occurrences resolve left-to-right: 'rer' -> r + er?
    // no — pair (e,r): positions 1-2 only (0-1 is (r,e)) -> r, er
    assert(Bpe.tokensOf("rer") == Seq("r", "er"))
    // a word with no mergeable pair stays fully split
    assert(Bpe.tokensOf("zqz") == Seq("z", "q", "z"))
    assert(Bpe.tokensOf("") == Seq.empty)
  }

  test("chained merges reach the trained vocabulary") {
    // from the committed table: h+ash via (a s)(as h)(h ash);
    // counts must equal the independent Python applier's (sanity
    // values computed at fixture-training time)
    assert(Bpe.tokensOf("hash") == Seq("hash"))
    assert(Bpe.tokensOf("fast") == Seq("f", "a", "st"))
    assert(Bpe.tokensOf("value") == Seq("v", "a", "lu", "e"))
  }

  test("tokenCount sums words across arbitrary whitespace") {
    assert(Bpe.tokenCount("hash hash") == 2L)
    assert(Bpe.tokenCount("  hash\n\tfast  ") == 1L + 3L)
    assert(Bpe.tokenCount("") == 0L)
    assert(Bpe.tokenCount("   \n ") == 0L)
  }

  test("column function evaluates in-plan (codegen) and matches the kernel") {
    import spark.implicits._
    val df = Seq("hash join", "zqz", "").toDF("t")
    val got = df.select(graft.functions.bpe_token_count(col("t")).as("n"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(
      Bpe.tokenCount("hash join"), Bpe.tokenCount("zqz"), 0L))
  }

  test("q91 ws_tokens of empty/whitespace-only text is 0 (Python split parity)") {
    import spark.implicits._
    // Spark's split("", "\\s+") yields [""] (size 1); the golden
    // generator's str.split() yields []. The guard must make them agree.
    val dir = java.nio.file.Files.createTempDirectory("graft-q91-empty").toString
    Seq((1L, ""), (2L, "   \n\t "), (3L, "one two"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.pipeline.TextAnalysis.q91BpeMergeTokens(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 2L))
  }

  test("q91 equals the committed golden oracle row-for-row (sf0.01)") {
    val got = Queries.all("q91_bpe_merge_tokens")(spark, Sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val golden = spark.read
      .parquet("/root/repo/golden/q91_bpe_merge_tokens.parquet")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.sameElements(golden))
    // and BPE genuinely splits: more BPE tokens than words overall
    assert(got.map(_._3).sum > got.map(_._2).sum)
  }
}
