package graft

import graft.pipeline.Events
import graft.streaming.EventStream
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** B-7 stream/batch equivalence (SURVEY §5.2 item 5): replaying the
  * events fixture through the file-source stream and the shared
  * aggregation transforms must produce exactly the batch results.
  */
class EventStreamSpec extends AnyFunSuite with SharedSpark {

  private def sortedRows(rows: Array[Row]): Seq[Seq[Any]] =
    rows.map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  test("streaming hourly counts equal the batch aggregation (sf0.001)") {
    val stream = EventStream.hourlyByType(EventStream.readEvents(spark, Sf0001))
    EventStream.runToMemory(stream, "stream_hourly")
    val streamed = sortedRows(spark.table("stream_hourly").collect())
    val batch = sortedRows(Events.hourlyByType(spark, Sf0001).collect())
    assert(streamed == batch)
  }

  test("streaming session_window equals the batch session_window (sf0.001)") {
    val stream = EventStream.sessionize(EventStream.readEvents(spark, Sf0001))
    EventStream.runToMemory(stream, "stream_sessions")
    val streamed = sortedRows(spark.table("stream_sessions").collect())
    val batch = sortedRows(Events.sessionWindow(spark, Sf0001).collect())
    assert(streamed == batch)
  }

  test("batch session_window equals the gaps-and-islands sessionization") {
    val a = Events.sessionWindow(spark, Sf0001).collect().toSeq
    val b = Events.sessionize(spark, Sf0001).collect().toSeq
    assert(a == b)
  }

  test("checkpointed parquet refresh equals batch and survives restart") {
    val base = java.nio.file.Files.createTempDirectory("graft-stream-sink").toString
    val agg = EventStream.hourlyByType(EventStream.readEvents(spark, Sf0001))
    EventStream.refreshToParquet(agg, s"$base/out", s"$base/ckpt")
    val batch = sortedRows(Events.hourlyByType(spark, Sf0001).collect())
    assert(sortedRows(spark.read.parquet(s"$base/out").collect()) == batch)
    // restart with the same checkpoint: committed files are not replayed
    // and the serving table still matches
    EventStream.refreshToParquet(agg, s"$base/out", s"$base/ckpt")
    assert(sortedRows(spark.read.parquet(s"$base/out").collect()) == batch)
  }

  test("streaming sliding-window counts equal the batch aggregation (sf0.001)") {
    val stream = EventStream.slidingCounts(EventStream.readEvents(spark, Sf0001))
    EventStream.runToMemory(stream, "stream_sliding")
    val streamed = sortedRows(spark.table("stream_sliding").collect())
    val batch = sortedRows(Events.slidingCounts(spark, Sf0001).collect())
    assert(streamed == batch)
  }
}
