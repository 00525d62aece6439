package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-scale document source (A-1): a directory tree of MDX files
  * read as one DataFrame — `doc_id` (file name stem) + `mdx` (whole
  * file). The reference ingests ONE caller-supplied MDX string per
  * `ingestData` call (reference src/clients/vector-client.ts:141-152);
  * the corpus-scale equivalent input is a directory of .mdx files,
  * which Spark's text source shards BY FILE across executors
  * (`wholetext` -> one row per file, no driver-side reads, no file
  * listing bottleneck beyond the driver's initial split enumeration).
  */
object MdxDirectorySource {

  /** One row per matching file. `pattern` is a glob relative to `dir`
    * (default every .mdx in the directory; use e.g. `**` + Spark's
    * recursiveFileLookup option via `extraOptions` for trees).
    */
  def read(
      spark: SparkSession,
      dir: String,
      pattern: String = "*.mdx",
      extraOptions: Map[String, String] = Map.empty): DataFrame =
    projectDocs(
      spark.read
        .option("wholetext", "true")
        .options(extraOptions)
        .text(s"$dir/$pattern"))

  /** (value, input_file_name) -> (doc_id, mdx). Shared by the batch
    * reader and [[graft.streaming.IngestStream]] so the two paths
    * cannot derive different doc ids for the same file. `doc_id` is the
    * PERCENT-DECODED file name stem (`input_file_name` returns a
    * URI-encoded path, so "release notes.mdx" must not become
    * "release%20notes"). Caveat: the stem alone — two same-named files
    * in different subdirectories of a recursive listing collapse into
    * one doc_id; disambiguate such trees before ingest.
    */
  private[graft] def projectDocs(raw: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    raw.select(
      // PERCENT-only decoding: url_decode is form-urlencoded and would
      // turn a literal '+' (legal in URI paths, left as-is by
      // input_file_name) into a space — protect it first
      call_function("url_decode",
        regexp_replace(
          regexp_extract(input_file_name(), "([^/]+?)(?:\\.[^./]+)?$", 1),
          "\\+", "%2B")).as("doc_id"),
      col("value").as("mdx"))
}
