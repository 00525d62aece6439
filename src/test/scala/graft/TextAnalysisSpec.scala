package graft

import graft.pipeline.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("langId labels a marker-free document 'und' (ADVICE r1)") {
    // route through the same scoring path as Queries.q17 by building a
    // one-row documents-shaped frame and invoking the internal scorer via
    // a temp view over the real pipeline: simplest is direct reuse of the
    // marker logic on crafted rows written to a temp parquet dir.
    val dir = java.nio.file.Files.createTempDirectory("graft-langid").toString
    Seq(
      (0L, "xyzzy plugh qwerty", "xx", "t", 18L),
      (1L, "the cat and the dog is in the house with everyone", "en", "t", 49L),
      (2L, "el que la de los las por siempre", "es", "t", 32L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.langId(spark, dir)
      .orderBy("doc_id").select("pred_lang").as[String].collect().toSeq
    assert(out == Seq("und", "en", "es"))
  }

  test("quality metrics on a crafted document") {
    val dir = java.nio.file.Files.createTempDirectory("graft-quality").toString
    Seq((0L, "aa bb aa cc", "en", "t", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextAnalysis.qualityPerDoc(spark, dir).collect()(0)
    assert(r.getLong(1) == 4L) // n_tokens
    assert(r.getLong(2) == 3L) // n_distinct
    assert(math.abs(r.getDouble(3) - 0.75) < 1e-9) // ttr
    // avg token length: (11 - 4 + 1) / 4 = 2.0
    assert(math.abs(r.getDouble(4) - 2.0) < 1e-9)
  }
}
