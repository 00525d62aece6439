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
    spark.read
      .option("wholetext", "true")
      .options(extraOptions)
      .text(s"$dir/$pattern")
      .select(
        // file name stem: last path segment, extension stripped
        regexp_extract(input_file_name(), "([^/]+?)(?:\\.[^./]+)?$", 1).as("doc_id"),
        col("value").as("mdx"))
}
