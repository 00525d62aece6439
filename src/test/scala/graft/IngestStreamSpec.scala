package graft

import graft.streaming.IngestStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IngestStreamSpec extends AnyFunSuite with SharedSpark {

  private def writeMdx(dir: String, name: String, body: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Path.of(dir, name), body)

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.select(col("doc_id"), col("chunk_id"), col("piece_id"), col("content"))
      .collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  test("streaming ingest equals batch ingest and only processes new files on restart") {
    val root = java.nio.file.Files.createTempDirectory("graft-ingest-stream").toString
    val mdxDir = s"$root/mdx"; val idx = s"$root/idx"; val ckpt = s"$root/ckpt"
    java.nio.file.Files.createDirectory(java.nio.file.Path.of(mdxDir))
    writeMdx(mdxDir, "doc-a.mdx",
      "## Context\nAlpha context words for the first document here.\n## Overview\nAlpha overview body text.")
    writeMdx(mdxDir, "doc-b.mdx",
      "## Context\nBeta context words.\n### Details\nBeta details body text material.")

    IngestStream.start(spark, mdxDir, idx, ckpt,
      graft.ingest.IngestJob.Config(chunkSize = 40, chunkOverlap = 8))
      .awaitTermination()
    val afterFirst = IngestStream.readIndex(spark, idx)
    assert(afterFirst.select("doc_id").distinct().count() == 2)

    // batch/stream fidelity: the streaming-built index equals a batch
    // ingest of the same corpus
    val batchIdx = s"$root/batch_idx"
    new GraftClient(spark, GraftClient.Config(chunkSize = 40, chunkOverlap = 8))
      .ingest(graft.sources.MdxDirectorySource.read(spark, mdxDir), "doc_id", "mdx", batchIdx)
    assert(canon(afterFirst) == canon(spark.read.parquet(batchIdx)))

    // restart with a new file: the checkpoint skips committed files, the
    // new batch lands in its own partition, nothing duplicates
    writeMdx(mdxDir, "doc-c.mdx",
      "## Context\nGamma context words arrive later.\n## Summary\nGamma summary body.")
    IngestStream.start(spark, mdxDir, idx, ckpt,
      graft.ingest.IngestJob.Config(chunkSize = 40, chunkOverlap = 8))
      .awaitTermination()
    val afterSecond = IngestStream.readIndex(spark, idx)
    assert(afterSecond.select("doc_id").distinct().count() == 3)
    assert(afterSecond.filter(col("doc_id") === "doc-a").count() ==
      afterFirst.filter(col("doc_id") === "doc-a").count())
  }
}
