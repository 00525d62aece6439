package graft

import graft.answer.{EchoAnswerModel, RetryingAnswerModel}
import graft.embed.{BatchedEmbedder, HashingEmbedder}
import graft.functions.VectorOps
import graft.util.Retry
import org.scalatest.funsuite.AnyFunSuite

/** A-12/A-17/A-18 connector seam: hashing default, batched transport
  * embedder, retry policy, answer model.
  */
class EmbedderSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private val texts = Seq((1L, "alpha bravo"), (2L, "charlie delta"),
    (3L, "echo foxtrot"), (4L, "golf hotel"), (5L, "india juliett"))

  test("BatchedEmbedder with a hashing transport matches HashingEmbedder") {
    val df = texts.toDF("id", "text")
    val native = new HashingEmbedder(32).embed(df, "text", "emb")
      .orderBy("id").select("emb").as[Seq[Float]].collect().toSeq
    val batched = new BatchedEmbedder(
      32, batchSize = 2, transport = ts => ts.map(VectorOps.hashEmbed(_, 32)))
      .embed(df, "text", "emb")
      .orderBy("id").select("emb").as[Seq[Float]].collect().toSeq
    assert(batched == native)
  }

  test("BatchedEmbedder retries transient transport failures with backoff") {
    // fail the first 2 calls overall; transport state must live on the
    // executor, so run single-partition with a driver-local counter via
    // a static holder
    EmbedderSpec.failures.set(2)
    val df = texts.toDF("id", "text").repartition(1)
    val out = new BatchedEmbedder(
      16, batchSize = 10,
      transport = ts => {
        if (EmbedderSpec.failures.getAndDecrement() > 0)
          throw new RuntimeException("transient")
        ts.map(VectorOps.hashEmbed(_, 16))
      },
      maxRetries = 5, initialDelayMs = 1)
      .embed(df, "text", "emb")
    assert(out.count() == 5)
  }

  test("Retry.withBackoff doubles the delay and rethrows after maxRetries") {
    val delays = scala.collection.mutable.ArrayBuffer[Long]()
    var calls = 0
    intercept[RuntimeException] {
      Retry.withBackoff(maxRetries = 4, initialDelayMs = 500, sleep = delays += _) {
        calls += 1
        throw new RuntimeException("always")
      }
    }
    assert(calls == 4)
    assert(delays.toSeq == Seq(500L, 1000L, 2000L))
  }

  test("AnswerModel: echo is deterministic; retrying model yields None on failure") {
    val echo = new EchoAnswerModel
    assert(echo.answer("# Question\nQ1\nmore") == echo.answer("# Question\nQ1\nmore"))
    val failing = new RetryingAnswerModel(_ => throw new RuntimeException("down"),
      maxRetries = 2, delayMs = 1)
    assert(failing.answer("prompt").isEmpty)
    var n = 0
    val flaky = new RetryingAnswerModel(
      p => { n += 1; if (n < 2) throw new RuntimeException("flaky") else s"ok:$p" },
      maxRetries = 3, delayMs = 1)
    assert(flaky.answer("x").contains("ok:x"))
  }

  test("IngestJob.chunksWith produces identical output for equivalent embedders") {
    val cfg = graft.ingest.IngestJob.Config()
    val a = graft.ingest.IngestJob.chunks(spark, Sf0001, cfg)
      .select("doc_id", "chunk_id", "piece_id", "embedding")
      .orderBy("doc_id", "chunk_id", "piece_id").collect().toSeq
    val b = graft.ingest.IngestJob.chunksWith(spark, Sf0001, cfg,
      new BatchedEmbedder(cfg.embedDim, 64,
        ts => ts.map(VectorOps.hashEmbed(_, cfg.embedDim))))
      .select("doc_id", "chunk_id", "piece_id", "embedding")
      .orderBy("doc_id", "chunk_id", "piece_id").collect().toSeq
    assert(a.map(_.toSeq.map {
      case s: scala.collection.Seq[_] => s.toSeq
      case x => x
    }) == b.map(_.toSeq.map {
      case s: scala.collection.Seq[_] => s.toSeq
      case x => x
    }))
  }
}

object EmbedderSpec {
  val failures = new java.util.concurrent.atomic.AtomicInteger(0)
}
