package graft

import graft.ingest.IngestJob
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end ingest pipeline invariants on the sf0.001 fixture
  * (A-7..A-13): piece budgets, per-doc chunk accounting, embedding norm,
  * embed-input projection.
  */
class IngestSpec extends AnyFunSuite with SharedSpark {

  private lazy val cfg = IngestJob.Config()
  private lazy val chunks = IngestJob.chunks(spark, Sf0001, cfg).cache()

  test("sub-chunked pieces respect the chunk budget") {
    // only multi-piece sections went through the splitter; single-piece
    // sections pass through whatever their length (reference :248)
    val oversized = chunks.filter(col("n_pieces") > 1)
      .filter(length(col("content")) > cfg.chunkSize)
    assert(oversized.count() == 0)
  }

  test("total_chunks equals the number of emitted pieces per document") {
    val bad = chunks.groupBy("doc_id", "total_chunks")
      .agg(count(lit(1)).cast("int").as("n"))
      .filter(col("n") =!= col("total_chunks"))
    assert(bad.count() == 0)
  }

  test("piece ids are dense and 1-based within a section") {
    val bad = chunks.groupBy("doc_id", "chunk_id")
      .agg(min("piece_id").as("lo"), max("piece_id").as("hi"),
        count(lit(1)).as("n"))
      .filter(col("lo") =!= 1 || col("hi") =!= col("n"))
    assert(bad.count() == 0)
  }

  test("multi-piece content has newlines normalized; single-piece keeps them") {
    assert(chunks.filter(col("n_pieces") > 1 && col("content").contains("\n"))
      .count() == 0)
  }

  test("embeddings are unit-norm with the configured dimension") {
    val norms = IngestJob.index(spark, Sf0001, cfg)
      .select(size(col("embedding")).as("dim"),
        graft.functions.l2_norm(col("embedding")).as("nrm"))
      .filter(col("dim") =!= cfg.embedDim || abs(col("nrm") - 1.0) > 1e-4)
    assert(norms.count() == 0)
  }

  test("embed_input carries the HEADER | CONTENT projection") {
    val bad = chunks.filter(!col("embed_input").startsWith("HEADER: ") ||
      !col("embed_input").contains(" | CONTENT: "))
    assert(bad.count() == 0)
  }

  test("A-6 validation passes on the synthetic corpus (first chunk ## Context)") {
    val bad = graft.ingest.MdxSplitter.invalidDocs(
      IngestJob.sections(spark, Sf0001), "doc_id")
    assert(bad.count() == 0)
  }
}
