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

  test("no fixture has an exactly-30-minute gap (the q8c/q8b boundary)") {
    // session_window uses half-open [ts, ts+gap) windows (an exact-gap
    // event starts a NEW session) while the gaps-and-islands query and
    // its oracle use strict '>' (same session). Their shared oracle is
    // only sound while no consecutive per-user gap is exactly the gap.
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    for (sf <- Seq(Sf0001, Sf001)) {
      val w = Window.partitionBy("user_id").orderBy("ts")
      val exact = Tables(spark, sf, "events")
        .withColumn("gap_us",
          unix_micros(col("ts")) - unix_micros(lag("ts", 1).over(w)))
        .filter(col("gap_us") === 30L * 60 * 1000000)
      assert(exact.count() == 0, s"exact 30-min gap present in $sf")
    }
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
