package graft

import graft.query.LexicalSearch
import graft.streaming.IndexMaintenance
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LexicalSearchSpec extends AnyFunSuite with SharedSpark {

  private def docsDf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def queryDf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("query_id", "term")
  }

  /** The module's integer arithmetic, re-derived here independently so
    * a kernel edit that shifts a quantization boundary fails the spec.
    */
  private def idfMicro(n: Long, df: Long): Long =
    ((BigInt(2) * n - 2 * df + 1) * 1000000 / (2 * df + 1)).toLong
  private def satMicro(tf: Long, total: Long, len: Long, n: Long): Long =
    (BigInt(44) * tf * total * 1000000 /
      (BigInt(20) * tf * total + BigInt(6) * total + BigInt(18) * len * n)).toLong
  // a term's contribution in micro units: the wide product floors back
  // down by 10^6, mirroring the engine's DECIMAL(38,0) intermediate
  private def termMicro(idf: Long, sat: Long): Long =
    (BigInt(idf) * sat / 1000000).toLong

  test("bm25TopK matches a hand-computed score on a 3-doc corpus") {
    // corpus: N=3, lens = 4,3,2, total = 9
    val docs = docsDf(
      (1L, "apple banana apple cherry"),
      (2L, "banana cherry durian"),
      (3L, "apple apple"))
    val out = LexicalSearch.bm25TopK(docs, "doc_id", "text",
        queryDf((0L, "apple"), (0L, "durian")), "query_id", "term", k = 3)
      .orderBy("rank")
      .collect()
    // df(apple)=2 over docs {1,3}; df(durian)=1 over {2}
    val s1 = termMicro(idfMicro(3, 2), satMicro(2, 9, 4, 3)) // doc1: tf(apple)=2
    val s2 = termMicro(idfMicro(3, 1), satMicro(1, 9, 3, 3)) // doc2: tf(durian)=1
    val s3 = termMicro(idfMicro(3, 2), satMicro(2, 9, 2, 3)) // doc3: tf(apple)=2
    val expected = Seq((3L, s3), (2L, s2), (1L, s1)).sortBy(-_._2)
    assert(out.map(r => (r.getLong(2), r.getLong(3))).toSeq === expected)
    assert(out.map(_.getLong(1)).toSeq === Seq(1L, 2L, 3L))
  }

  test("docs sharing no query term are absent; ties break by ascending id") {
    val docs = docsDf(
      (1L, "x y"), (2L, "x y"), (3L, "z z"))
    val out = LexicalSearch.bm25TopK(docs, "doc_id", "text",
        queryDf((0L, "x")), "query_id", "term", k = 10)
      .collect()
    // docs 1 and 2 are identical w.r.t. the query: same tf, len => tie,
    // ranked by id; doc 3 has no posting and must not appear
    assert(out.map(r => (r.getLong(1), r.getLong(2))).sorted.toSeq ===
      Seq((1L, 1L), (2L, 2L)))
  }

  test("duplicate query terms are not double-counted (distinct contract)") {
    val docs = docsDf((1L, "a b"), (2L, "a a"))
    val once = LexicalSearch.bm25TopK(docs, "doc_id", "text",
      queryDf((0L, "a")), "query_id", "term", k = 10)
    val dup = LexicalSearch.bm25TopK(docs, "doc_id", "text",
      queryDf((0L, "a"), (0L, "a")), "query_id", "term", k = 10)
    assert(once.collect().toSeq === dup.collect().toSeq)
  }

  test("rrfFuse: both-channel doc beats single-channel; micro arithmetic exact") {
    import spark.implicits._
    // query 0: doc 1 is rank 1 in A only, doc 2 is rank 2 in both,
    // doc 3 is rank 1 in B only
    val a = Seq((0L, 1L, 1L), (0L, 2L, 2L)).toDF("query_id", "doc_id", "rank")
    val b = Seq((0L, 3L, 1L), (0L, 2L, 2L)).toDF("query_id", "doc_id", "rank")
    val out = LexicalSearch.rrfFuse(a, b, "query_id", "doc_id", "rank", k = 10)
      .orderBy("rank").collect()
    val one = 1000000000000L / 61 // rank 1
    val two = 1000000000000L / 62 // rank 2
    // doc 2: two channels at rank 2 = 2*two > one channel at rank 1
    assert(out.map(r => (r.getLong(2), r.getLong(3))).toSeq ===
      Seq((2L, 2 * two), (1L, one), (3L, one)))
    // doc 1 vs doc 3 tie on score -> ascending doc_id
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSeq ===
      Seq((1L, 2L), (2L, 1L), (3L, 3L)))
    // missing channel ranks surface as nulls, present ones verbatim
    val d1 = out.find(_.getLong(2) == 1L).get
    assert(d1.getLong(4) == 1L && d1.isNullAt(5))
  }

  test("q71/q72 shapes on the sf0.001 fixtures: self-retrieval and fusion") {
    val q71 = Queries.q71Bm25TopK(spark, Sf0001).collect()
    assert(q71.nonEmpty)
    // every query's ranked list is 1..n with strictly ordered
    // (score desc, doc_id asc)
    q71.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq === (1L to sorted.length))
      val keys = sorted.map(r => (-r.getLong(3), r.getLong(2))).toSeq
      assert(keys === keys.sorted)
      // NOT asserted: the query doc at rank 1. BM25's tf saturation +
      // rational idf legitimately rank a short doc holding one very
      // rare query term above the (long) query doc itself on this
      // word-salad fixture — self-retrieval is a property of real
      // prose, not of the scorer.
    }
    val q72 = Queries.q72HybridRrf(spark, Sf0001).collect()
    assert(q72.groupBy(_.getLong(0)).keySet === (0L to 9L).toSet)
    // What rrfFuse actually guarantees (a both-channels rank-1 claim is
    // a FIXTURE property, false on this word-salad corpus — query 2's
    // vector winner is absent from its BM25 top-20):
    q72.foreach { r =>
      // every fused row came from at least one channel …
      assert(!r.isNullAt(4) || !r.isNullAt(5), s"row with no channel: $r")
      // … and its micro-unit score IS the reciprocal-rank sum, exactly
      val expected =
        (if (r.isNullAt(4)) 0L else 1000000000000L / (60 + r.getLong(4))) +
          (if (r.isNullAt(5)) 0L else 1000000000000L / (60 + r.getLong(5)))
      assert(r.getLong(3) === expected, s"rrf_micro mismatch: $r")
    }
    // per query: ranks are 1..n ordered by (rrf_micro desc, doc_id asc),
    // and any (query, doc) fused from BOTH channels outranks the same
    // single-channel score it would get from its better channel alone
    q72.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq === (1L to sorted.length))
      val keys = sorted.map(r => (-r.getLong(3), r.getLong(2))).toSeq
      assert(keys === keys.sorted)
    }
    // both-channel rows exist somewhere in the fixture (the channels DO
    // overlap), and each carries both ranks verbatim > 0
    val both = q72.filter(r => !r.isNullAt(4) && !r.isNullAt(5))
    assert(both.nonEmpty, "expected some (query, doc) present in both top-20s")
    both.foreach(r => assert(r.getLong(4) > 0 && r.getLong(5) > 0))
  }

  test("queryIndex is bit-identical to bm25TopK and prunes posting partitions") {
    val docs = Tables(spark, Sf0001, "documents")
    val batch = docs.filter(col("doc_id") < 10)
      .select(col("doc_id").as("query_id"),
        explode(slice(LexicalSearch.tokens(col("text")), 1, 8)).as("term"))
      .distinct()
    val work = java.nio.file.Files
      .createTempDirectory("graft_lex_spec").toString
    try {
      LexicalSearch.buildIndex(docs, "doc_id", "text", work)
      val direct = LexicalSearch.bm25TopK(docs, "doc_id", "text",
        batch, "query_id", "term", k = 10)
      val indexed = LexicalSearch.queryIndex(spark, work, "doc_id",
        batch, "query_id", "term", k = 10)
      assert(indexed.orderBy("query_id", "rank").collect().toSeq ===
        direct.orderBy("query_id", "rank").collect().toSeq)
      // the probe must reach the source as a partition-directory filter
      val plan = indexed.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("__bucket"),
        s"expected term-hash partition pruning in the scan:\n$plan")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(work))
    }
  }

  test("upsert-maintained index scores bit-identically to a full rebuild") {
    val docs = Tables(spark, Sf0001, "documents")
    val batch = docs.filter(col("doc_id") < 10)
      .select(col("doc_id").as("query_id"),
        explode(slice(LexicalSearch.tokens(col("text")), 1, 8)).as("term"))
      .distinct()
    val work = java.nio.file.Files
      .createTempDirectory("graft_lex_upsert_spec").toString
    try {
      LexicalSearch.buildIndex(
        docs.filter(pmod(col("doc_id"), lit(10)) =!= 0), "doc_id", "text", work)
      LexicalSearch.upsertIndex(spark, work, "doc_id", "text",
        docs.filter(pmod(col("doc_id"), lit(10)) === 0))
      // stats merged exactly: N and total token length cover the union
      val stats = spark.read.parquet(s"$work/stats").head
      assert(stats.getLong(0) == docs.count())
      val totalLen = docs
        .agg(sum(size(LexicalSearch.tokens(col("text"))).cast("long")))
        .head.getLong(0)
      assert(stats.getLong(1) == totalLen)
      // BM25 depends on global (N, total_len, df) — equality with the
      // from-scratch path proves the append was score-invisible
      val direct = LexicalSearch.bm25TopK(docs, "doc_id", "text",
        batch, "query_id", "term", k = 10)
      val upserted = LexicalSearch.queryIndex(spark, work, "doc_id",
        batch, "query_id", "term", k = 10)
      assert(upserted.orderBy("query_id", "rank").collect().toSeq ===
        direct.orderBy("query_id", "rank").collect().toSeq)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(work))
    }
  }

  test("stats reports postings/terms/files through the maintenance cycle") {
    val docs = Tables(spark, Sf0001, "documents")
    val work = java.nio.file.Files
      .createTempDirectory("graft_lex_stats_spec").toString
    try {
      LexicalSearch.buildIndex(
        docs.filter(pmod(col("doc_id"), lit(10)) =!= 0), "doc_id", "text", work)
      def snap() = LexicalSearch.stats(spark, work).collect()
        .map(r => (r.getAs[Long]("postings"), r.getAs[Long]("terms"),
          r.getAs[Long]("n_files")))
      val s0 = snap()
      assert(s0.map(_._1).sum ==
        spark.read.parquet(s"$work/postings").count(),
        "per-bucket postings must total the table")
      assert(s0.forall { case (p, t, f) => t <= p && f >= 1L })

      IndexMaintenance.applyLexicalBatch(work, "doc_id", "text",
        docs.filter(pmod(col("doc_id"), lit(10)) === 0), batchId = 0L)
      val s1 = snap()
      assert(s1.map(_._1).sum > s0.map(_._1).sum)
      // appends fragment: file counts grew somewhere
      assert(s1.map(_._3).sum > s0.map(_._3).sum)

      LexicalSearch.compactIndex(spark, work)
      val s2 = snap()
      assert(s2.map(_._1).sum == s1.map(_._1).sum,
        "compaction must not change postings")
      assert(s2.map(_._3).sum < s1.map(_._3).sum,
        "compaction did not shrink per-bucket file counts")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(work))
    }
  }

  test("the posting-list probe broadcasts the query side (plan shape)") {
    val docs = Tables(spark, Sf0001, "documents")
    val batch = docs.filter(col("doc_id") < 10)
      .select(col("doc_id").as("query_id"),
        explode(slice(LexicalSearch.tokens(col("text")), 1, 8)).as("term"))
      .distinct()
    val plan = LexicalSearch.bm25TopK(docs, "doc_id", "text",
        batch, "query_id", "term", k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"query-term probe should be a broadcast join:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      "corpus must never cross-join anything but the 1-row stats frame")
  }
}
