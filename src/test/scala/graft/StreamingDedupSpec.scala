package graft

import graft.streaming.StreamingDedup
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

class StreamingDedupSpec extends AnyFunSuite with SharedSpark {

  test("admitted rows across micro-batches equal the batch first-occurrence answer") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // payloads repeat within AND across batches; ids are arrival order
    val texts = Vector("aa", "bb", "aa", "cc", "bb", "dd", "aa", "ee", "cc", "ff")
    val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val batches = rows.grouped(4).toSeq // 4 + 4 + 2

    val input = MemoryStream[(Long, String)]
    val q = StreamingDedup.admitFirst(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text")
      .writeStream.format("memory").queryName("admitted")
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()

    val got = spark.table("admitted")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // batch face: lowest doc_id per payload (arrival order == id order)
    val expect = rows.groupBy(_._2)
      .map { case (t, rs) =>
        val sha = java.security.MessageDigest.getInstance("SHA-256")
          .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
        sha -> rs.map(_._1).min
      }
    assert(got == expect)
    // exactly one admission per distinct payload, duplicates emitted nothing
    assert(got.size == texts.distinct.size)
  }

  test("late duplicate of an old payload is dropped, a genuinely new one admitted") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[(Long, String)]
    val q = StreamingDedup.admitFirst(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text")
      .writeStream.format("memory").queryName("admitted2")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Seq((1L, "old"))); q.processAllAvailable()
      // many batches later the same payload reappears
      input.addData(Seq((100L, "mid"))); q.processAllAvailable()
      input.addData(Seq((200L, "old"), (201L, "new"))); q.processAllAvailable()
    } finally q.stop()

    val ids = spark.table("admitted2").collect().map(_.getLong(1)).toSet
    assert(ids == Set(1L, 100L, 201L))
  }
}
