package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MDX header-splitting pipeline (reference `preprocessMDX`,
  * src/clients/vector-client.ts:259-279): split on ATX headings
  * `#{1,6} ` kept as section delimiters, trim header/content, attach
  * neighbor headers and a 1-based per-document chunk id.
  *
  * Spark-first shape: one `split` + `posexplode` per document plus a
  * single per-doc window for lag/lead/row_number — at scale this is one
  * shuffle keyed by doc_id, no driver loops.
  *
  * Neighbor semantics: the reference's observed behavior at
  * vector-client.ts:270 assigns the *previous section's content* to
  * `prevHeader` (an index bug); per SURVEY §2 A-4 we implement the
  * evident intent — lag/lead of the header — and document the divergence.
  */
object MdxSplitter {

  /** Header-line regex: ATX heading at line start ("# " .. "###### "). */
  private val SectionLookahead = "(?m)(?=^#{1,6} .+$)"

  /** JS-`String.trim()` semantics: strip ALL leading/trailing whitespace.
    * (Spark's `trim` strips only the space character.)
    */
  private def trimWs(c: Column): Column = regexp_replace(c, "^\\s+|\\s+$", "")

  /** Split `mdxCol` into per-section rows.
    *
    * Output columns: docIdCol, `chunk_id` (1-based, document order),
    * `header` (trimmed heading line), `content` (trimmed section body),
    * `prev_header`, `next_header` ('' at the edges — reference
    * vector-client.ts:270-271 defaults).
    */
  def split(docs: DataFrame, docIdCol: String, mdxCol: String): DataFrame = {
    val sections = docs
      .select(
        col(docIdCol),
        posexplode(
          filter(
            org.apache.spark.sql.functions.split(col(mdxCol), SectionLookahead),
            s => length(trimWs(s)) > 0)).as(Seq("pos", "section")))

    val headerLine = regexp_extract(col("section"), "(?m)^(#{1,6} .+)$", 1)
    val w = Window.partitionBy(col(docIdCol)).orderBy(col("pos"))

    sections
      // A-3: pair (header, content), trim both; sections that precede the
      // first heading (no header line) keep header = ''
      .withColumn("header", trimWs(headerLine))
      .withColumn(
        "content",
        trimWs(
          when(length(col("header")) > 0,
            // drop the first line (the heading) from the section
            expr("substring(section, instr(section, '\n') + 1)"))
            .otherwise(col("section"))))
      // A-4 neighbor context + A-5 sequence id: one window, three functions
      .withColumn("prev_header", lag(col("header"), 1, "").over(w))
      .withColumn("next_header", lead(col("header"), 1, "").over(w))
      .withColumn("chunk_id", row_number().over(w))
      .select(col(docIdCol), col("chunk_id"), col("header"), col("content"),
        col("prev_header"), col("next_header"))
  }

  /** A-6 validation (reference `validateContext`,
    * vector-client.ts:161-170): every document's first chunk must be the
    * `## Context` section. Returns the invalid doc count column plan;
    * [[IngestJob]] asserts it is 0.
    */
  def invalidDocs(chunks: DataFrame, docIdCol: String): DataFrame =
    chunks
      .filter(col("chunk_id") === 1 && !col("header").startsWith("## Context"))
      .select(col(docIdCol))
}
