package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Order-preserving grouped context merge + prompt assembly (reference
  * `getAnswer`, src/clients/vector-client.ts:436-475).
  *
  * The reference groups retrieved rows by `metadata.context` relying on
  * JS `Map` insertion order (:436-444), then concatenates each group's
  * contents with `\n` (:449-451) and renders `## Chunk n` blocks. Spark
  * has no insertion order, so first-appearance order is made explicit:
  * `first_seen = min(rank)` orders groups, and each group's contents are
  * sorted by rank before joining (`collect_list` alone is
  * order-nondeterministic under parallel merge).
  */
object ContextAssembler {

  /** A-15: group retrieved rows by context, preserving first-appearance
    * order and in-group retrieval order.
    *
    * Input columns: queryId, rank (retrieval order, dense from 1),
    * context, content. Output: queryId, context, first_seen, n_chunks,
    * merged (contents joined with `\n` in rank order).
    */
  def mergeByContext(
      retrieved: DataFrame,
      queryId: String,
      rank: String,
      context: String,
      content: String): DataFrame =
    retrieved
      .groupBy(col(queryId), col(context))
      .agg(
        min(col(rank)).as("first_seen"),
        count(lit(1)).as("n_chunks"),
        array_join(
          transform(
            array_sort(collect_list(struct(col(rank).as("r"), col(content).as("c")))),
            x => x.getField("c")),
          "\n").as("merged"))

  /** A-16 first half: render each context group as a `## Chunk n` block
    * (n = 1-based first-appearance order) and fold the blocks into one
    * `chunks` string per query (vector-client.ts:446-463). Exposed so
    * callers with their own prompt template ([[graft.GraftClient]]) can
    * fill it without re-parsing a rendered frame.
    */
  def assembleBlocks(
      merged: DataFrame,
      queryId: String,
      contextCol: String): DataFrame = {
    val w = Window.partitionBy(col(queryId)).orderBy(col("first_seen"))
    merged
      .withColumn("chunk_n", row_number().over(w))
      .withColumn("block",
        concat(
          lit("## Chunk "), col("chunk_n"),
          lit("\n\n### Context\n"), col(contextCol),
          lit("\n\n### Content\n"), col("merged"),
          lit("\n\n---\n\n")))
      .groupBy(col(queryId))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("chunk_n").as("n"), col("block").as("b")))),
            x => x.getField("b")),
          "").as("chunks"))
  }

  /** A-16: chunk blocks + the default `# Question / # Context` template
    * fill (vector-client.ts:465-475).
    */
  def assemblePrompt(
      merged: DataFrame,
      queryId: String,
      contextCol: String,
      question: org.apache.spark.sql.Column): DataFrame =
    assembleBlocks(merged, queryId, contextCol)
      .withColumn("prompt",
        concat(lit("# Question\n"), question, lit("\n\n# Context\n"), col("chunks")))
      .drop("chunks")
}
