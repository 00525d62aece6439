package graft

import graft.pipeline.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SharedSpark {

  test("mapPartitions codec decode matches the column-level stub decode") {
    val viaColumns = Multimodal.decodeMeta(spark, Sf0001)
      .select("doc_id", "width", "height")
      .collect().map(_.toSeq).toSet
    val viaPartitions = Multimodal.decodeWith(
        Multimodal.mediaTable(spark, Sf0001), "media", Multimodal.FakeCodec.decodeBytes)
      .select("doc_id", "width", "height")
      .collect().map(_.toSeq).toSet
    assert(viaPartitions == viaColumns)
  }

  test("RealCodec seam is explicitly unimplemented") {
    intercept[NotImplementedError] {
      Multimodal.RealCodec.decode(Array[Byte](1, 2, 3))
    }
  }

  test("frame sampling covers the payload head and respects stride") {
    val frames = Multimodal.frameSample(spark, Sf0001)
    // frame 0 exists for every non-empty doc, block indices step by 4
    val docs = Tables(spark, Sf0001, "documents").count()
    assert(frames.filter(col("frame_id") === 0).count() == docs)
    val badStride = frames.filter(col("block_idx") % 4 =!= 0)
    assert(badStride.count() == 0)
    // every frame has 1..16 bytes
    assert(frames.filter(col("frame_bytes") < 1 || col("frame_bytes") > 16).count() == 0)
  }

  test("byte histogram bins sum to the payload size") {
    val bad = Multimodal.byteHistogram(spark, Sf0001)
      .groupBy("doc_id")
      .agg(sum("n_in_bin").as("total"))
      .join(Multimodal.mediaTable(spark, Sf0001).select("doc_id", "n_bytes"), "doc_id")
      .filter(col("total") =!= col("n_bytes"))
    assert(bad.count() == 0)
  }
}
