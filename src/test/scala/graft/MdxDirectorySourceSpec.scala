package graft

import graft.sources.MdxDirectorySource
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MdxDirectorySourceSpec extends AnyFunSuite with SharedSpark {

  private def writeMdx(dir: java.nio.file.Path, name: String, body: String): Unit =
    java.nio.file.Files.writeString(dir.resolve(name), body)

  private def corpus(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-mdx")
    writeMdx(dir, "doc-a.mdx",
      "## Context\nAlpha context words here.\n## Overview\nAlpha overview body.")
    writeMdx(dir, "doc-b.mdx",
      "## Context\nBeta context words.\n### Details\nBeta details body text.")
    writeMdx(dir, "notes.txt", "not an mdx file, must be ignored")
    dir.toString
  }

  test("reads one row per .mdx file with the stem as doc_id") {
    val df = MdxDirectorySource.read(spark, corpus())
    val rows = df.orderBy("doc_id").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("doc-a", "doc-b"))
    assert(rows.forall(_.getString(1).startsWith("## Context")))
  }

  test("file names with URI-reserved characters keep their real stem") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mdx-enc")
    writeMdx(dir, "release notes 1%.mdx", "## Context\nSpaced name body.")
    val rows = MdxDirectorySource.read(spark, dir.toString).collect()
    // input_file_name() is URI-encoded ("release%20notes%201%25");
    // doc_id must be the decoded stem
    assert(rows.map(_.getString(0)).toSeq == Seq("release notes 1%"))
  }

  test("directory ingest builds a queryable index end-to-end") {
    val out = java.nio.file.Files.createTempDirectory("graft-mdx-idx").toString + "/idx"
    val client = new GraftClient(spark,
      GraftClient.Config(chunkSize = 40, chunkOverlap = 8))
    client.ingestDirectory(corpus(), out)
    val idx = spark.read.parquet(out)
    assert(idx.select("doc_id").distinct().count() == 2)
    assert(idx.columns.toSet ==
      Set("doc_id", "chunk_id", "piece_id", "content", "embedding", "metadata"))
    // every document's first section passed ## Context validation and the
    // chunk ids are 1-based per document
    assert(idx.groupBy("doc_id").agg(min("chunk_id").as("m"))
      .filter(col("m") =!= 1).isEmpty)
    // retrieval over the directory-built index works
    val hit = client.query(out, client.embedText("Alpha overview body."), 0.0, 3)
    assert(hit.count() > 0)
  }

  test("validation rejects a corpus whose document lacks the Context heading") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mdx-bad")
    writeMdx(dir, "bad.mdx", "## Intro\nNo context heading first.")
    val client = new GraftClient(spark)
    val out = java.nio.file.Files.createTempDirectory("graft-mdx-bad-idx").toString + "/idx"
    val e = intercept[IllegalArgumentException](
      client.ingestDirectory(dir.toString, out))
    assert(e.getMessage.contains("validateContext"))
  }
}
