package graft.ingest

import graft.Tables
import graft.functions.chunk_text
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end ingest pipeline (reference `ingestData`,
  * src/clients/vector-client.ts:141-152): MDX split -> validate ->
  * sub-chunk oversized sections -> embed -> index table.
  *
  * The reference awaits one embedding call + one INSERT per chunk in a
  * sequential driver loop (vector-client.ts:149-151, 243-248). Here the
  * whole document corpus is ONE lazy DataFrame plan: the only wide
  * exchanges are the per-doc window (keyed by doc_id) and the final write
  * — at 100 TB that is two shuffle-free narrow stages around one keyed
  * shuffle, with embedding computed inside whole-stage codegen.
  */
object IngestJob {

  /** Defaults sized to the fixtures: document quarters run ~40-150 chars,
    * so chunkSize=80 exercises the oversized-section branch (A-9) on real
    * data. (The reference's production defaults are 1000/200,
    * vector-client.ts:72-73 — configurable here.)
    */
  case class Config(
      chunkSize: Int = 80,
      chunkOverlap: Int = 16,
      embedDim: Int = 64)

  /** JS `String.replace(target, "")` — first occurrence only (reference
    * strips the '## ' heading marker this way, vector-client.ts:299).
    */
  private def replaceFirst(c: Column, target: String): Column = {
    val pos = locate(target, c)
    when(pos > 0,
      concat(c.substr(lit(1), pos - 1), c.substr(pos + target.length, length(c))))
      .otherwise(c)
  }

  /** The documents fixture is headerless prose; real MDX corpora carry
    * headings. Deterministically renders each doc as a 4-section MDX file
    * (first section `## Context`, per A-6) by splitting its words into
    * quarters — same construction the DuckDB oracle re-derives.
    */
  def syntheticMdx(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val words = split(col(textCol), " ")
    // Spark `/` on ints yields DOUBLE — force integer division
    val q = ((size(words) + 3) / lit(4)).cast("int")
    // i is a plan-construction-time constant: branch in Scala (a
    // `when(lit(i) === 3, ...)` builds a literal==literal predicate —
    // the "trivially true equals" WARN — for the last segment)
    def seg(i: Int): Column =
      array_join(slice(words, q * i + 1, if (i == 3) size(words) else q), " ")
    docs.withColumn("mdx",
      concat(
        lit("## Context\n"), seg(0),
        lit("\n## Overview\n"), seg(1),
        lit("\n### Details\n"), seg(2),
        lit("\n## Summary\n"), seg(3)))
  }

  /** A-2..A-7: sections with neighbors, ids, and validation. */
  def sections(spark: SparkSession, dir: String): DataFrame = {
    val docs = syntheticMdx(Tables.parallelize(Tables(spark, dir, "documents")))
    MdxSplitter.split(docs, "doc_id", "mdx")
  }

  /** A-8..A-12: sub-chunk oversized sections, normalize, embed.
    *
    * Output: doc_id, chunk_id, piece_id (1-based within section), content
    * (post-normalization), section_content (pre-sub-split, = metadata
    * context), header/prev_header/next_header, total_chunks, embed_input,
    * embedding.
    */
  def chunks(spark: SparkSession, dir: String, cfg: Config = Config()): DataFrame =
    chunksWith(spark, dir, cfg, new graft.embed.HashingEmbedder(cfg.embedDim))

  /** [[chunks]] with a caller-supplied [[graft.embed.Embedder]] — the
    * A-12 seam: swap the deterministic hashing default for a batched
    * external-service embedder without touching the pipeline.
    */
  def chunksWith(
      spark: SparkSession,
      dir: String,
      cfg: Config,
      embedder: graft.embed.Embedder): DataFrame =
    chunkSections(sections(spark, dir), cfg, embedder)

  /** The pipeline core over ANY sections frame (columns doc_id, chunk_id,
    * header, prev_header, next_header, content) — used by the fixture
    * queries above and by [[graft.GraftClient]] on caller documents.
    */
  def chunkSections(
      secs: DataFrame,
      cfg: Config,
      embedder: graft.embed.Embedder): DataFrame = {
    val wDoc = Window.partitionBy(col("doc_id"))

    val projected = secs
      // A-9: oversized sections split (LangChain semantics); small ones
      // pass through as a single piece (reference vector-client.ts:236-248)
      .withColumn("pieces",
        when(length(col("content")) > cfg.chunkSize,
          chunk_text(col("content"), lit(cfg.chunkSize), lit(cfg.chunkOverlap)))
          .otherwise(array(col("content"))))
      .withColumn("n_pieces", size(col("pieces")))
      // A-7: totalChunks counts final pieces per document — computed once
      // on the real split output (the reference re-runs the splitter just
      // to pre-count, vector-client.ts:179-195)
      .withColumn("total_chunks", sum(col("n_pieces")).over(wDoc).cast("int"))
      .select(
        col("doc_id"), col("chunk_id"), col("header"),
        col("prev_header"), col("next_header"), col("total_chunks"),
        col("content").as("section_content"), col("n_pieces"),
        posexplode(col("pieces")).as(Seq("piece_pos", "piece")))
      .withColumn("piece_id", col("piece_pos") + 1)
      // A-10: newline normalization on sub-chunks only (the single-piece
      // branch preserves newlines — reference :244 vs :248)
      .withColumn("content",
        when(col("n_pieces") > 1, regexp_replace(col("piece"), "\n", " "))
          .otherwise(col("piece")))
      // A-11: embedding-input projection (vector-client.ts:298-301)
      .withColumn("embed_input",
        concat(lit("HEADER: "), replaceFirst(col("header"), "## "),
          lit(" | CONTENT: "), col("content")))
      .drop("piece", "piece_pos")
    // A-12: embedding via the pluggable seam (default: deterministic
    // hashing embedder standing in for the reference's ada-002 call)
    embedder.embed(projected, "embed_input", "embedding")
  }

  /** A-13: the index table (content, embedding, typed metadata struct) —
    * written as parquet, one distributed write instead of the reference's
    * row-at-a-time INSERTs.
    */
  def index(spark: SparkSession, dir: String, cfg: Config = Config()): DataFrame =
    indexFrom(chunks(spark, dir, cfg))

  /** A-13 projection over any [[chunkSections]] output. */
  def indexFrom(chunked: DataFrame): DataFrame =
    chunked.select(
      col("doc_id"), col("chunk_id"), col("piece_id"),
      col("content"), col("embedding"),
      struct(
        col("header"), col("prev_header"), col("next_header"),
        col("chunk_id"), col("total_chunks"),
        col("section_content").as("context")).as("metadata"))

  /** Run ingest and persist the index. Fails the job if any document's
    * first section is not `## Context` (A-6, vector-client.ts:161-170).
    */
  def run(spark: SparkSession, dir: String, outPath: String, cfg: Config = Config()): Unit =
    run(spark, dir, ParquetSink(outPath), cfg)

  /** [[run]] against any [[IndexSink]] — parquet system of record by
    * default, JDBC serving table for reference migrations (A-13).
    */
  def run(spark: SparkSession, dir: String, sink: IndexSink, cfg: Config): Unit = {
    val bad = MdxSplitter.invalidDocs(sections(spark, dir), "doc_id").limit(1).count()
    require(bad == 0, "validateContext: first chunk must start with '## Context'")
    sink.write(index(spark, dir, cfg))
  }
}
