package graft

import graft.pipeline.Sampling
import graft.streaming.StreamingQuota
import graft.streaming.StreamingQuota.DocTokens
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

class StreamingQuotaSpec extends AnyFunSuite with SharedSpark {

  private lazy val feed: Seq[DocTokens] = Tables(spark, Sf0001, "documents")
    .select(col("doc_id"), col("source"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
    .orderBy("doc_id").collect()
    .map(r => DocTokens(r.getLong(0), r.getString(1), r.getLong(2))).toSeq

  private lazy val quotas: Map[String, Long] =
    Sampling.q98BudgetWaterfill(spark, Sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap

  private lazy val batchGate: Map[Long, (Long, Boolean)] =
    Sampling.q99QuotaGate(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(4)))).toMap

  test("batch face of the streaming fold equals the batch window gate") {
    import spark.implicits._
    val got = StreamingQuota.gate(feed.toDS(), quotas).collect()
      .map(g => g.doc_id -> ((g.cum_tokens, g.admitted))).toMap
    assert(got == batchGate)
    // the gate actually bites at fixture scale: both outcomes present
    assert(got.values.exists(_._2) && got.values.exists(!_._2))
  }

  test("micro-batch splits of the feed reproduce the batch gate") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[DocTokens]
    val q = StreamingQuota.gate(input.toDS(), quotas)
      .writeStream.format("memory").queryName("quota_out")
      .outputMode(OutputMode.Append()).start()
    try {
      Seq(feed.take(123), feed.slice(123, 301), feed.drop(301))
        .foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val got = spark.table("quota_out").collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(4)))).toMap
    assert(got == batchGate)
  }
}
