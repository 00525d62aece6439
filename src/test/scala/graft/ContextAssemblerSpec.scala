package graft

import graft.query.ContextAssembler
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A-15/A-16: order-preserving grouped merge + prompt assembly, including
  * the duplicate-context interleave case (reference vector-client.ts
  * :436-444 relies on JS Map insertion order; here first_seen makes that
  * order explicit).
  */
class ContextAssemblerSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private val retrieved = Seq(
    // (query, rank, context, content) — context "docA" appears at ranks 1
    // and 3 (interleaved with docB), so merged groups must keep
    // first-appearance order docA, docB and in-group rank order.
    (1L, 1L, "docA", "first hit"),
    (1L, 2L, "docB", "second hit"),
    (1L, 3L, "docA", "third hit"),
    (2L, 1L, "docC", "only hit")).toDF("qid", "rank", "context", "content")

  test("mergeByContext preserves first-appearance and in-group order") {
    val rows = ContextAssembler
      .mergeByContext(retrieved, "qid", "rank", "context", "content")
      .orderBy("qid", "first_seen")
      .select("qid", "context", "first_seen", "n_chunks", "merged")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toSeq
    assert(rows == Seq(
      (1L, "docA", 1L, 2L, "first hit\nthird hit"),
      (1L, "docB", 2L, 1L, "second hit"),
      (2L, "docC", 1L, 1L, "only hit")))
  }

  test("assemblePrompt renders chunks in first-seen order with the template") {
    val merged = ContextAssembler.mergeByContext(retrieved, "qid", "rank", "context", "content")
    val prompts = ContextAssembler
      .assemblePrompt(merged, "qid", "context", concat(lit("Q"), col("qid")))
      .orderBy("qid").select("qid", "prompt").collect()
    val p1 = prompts(0).getString(1)
    assert(p1.startsWith("# Question\nQ1\n\n# Context\n"))
    val iA = p1.indexOf("## Chunk 1\n\n### Context\ndocA")
    val iB = p1.indexOf("## Chunk 2\n\n### Context\ndocB")
    assert(iA >= 0 && iB > iA)
    assert(p1.contains("### Content\nfirst hit\nthird hit"))
    assert(prompts(1).getString(1).contains("## Chunk 1\n\n### Context\ndocC"))
  }
}
