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

  test("watermark drops a late row older than the watermark (update mode)") {
    // The one B-7 behavior AvailableNow+complete never exercises: state
    // eviction + late-row drop. Two micro-batches through a memory
    // source; the second carries a row whose 1-hour window closed before
    // the watermark (max_ts - 10 min) advanced past it.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    def ts(s: String) = new java.sql.Timestamp(java.time.Instant.parse(s).toEpochMilli)

    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val agg = EventStream.hourlyByType(
      input.toDF().toDF("ts", "event_type", "value"), watermark = "10 minutes")
    val q = agg.writeStream
      .format("memory").queryName("late_drop").outputMode("update").start()
    try {
      // batch 1: advances the watermark to 11:00 - 10 min = 10:50
      input.addData(
        (ts("2024-01-01T10:15:00Z"), "click", 1.0),
        (ts("2024-01-01T11:00:00Z"), "click", 1.0))
      q.processAllAvailable()
      // batch 2: 09:30 is late (its [09:00,10:00) window closed before
      // the 10:50 watermark) and must be DROPPED; 11:30 is on time
      input.addData(
        (ts("2024-01-01T09:30:00Z"), "click", 5.0),
        (ts("2024-01-01T11:30:00Z"), "click", 1.0))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.table("late_drop").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3)))
    assert(!out.exists(_._1 == "2024-01-01 09:00:00"),
      s"late row leaked into a closed window: ${out.mkString(", ")}")
    // the on-time 11:30 row did update its window in the same batch the
    // late row was dropped from
    assert(out.contains(("2024-01-01 11:00:00", 2L, 2.0)),
      s"on-time row missing from update output: ${out.mkString(", ")}")
  }

  test("stream-stream interval join equals the binned batch range join (sf0.001)") {
    val errors = EventStream.readEvents(spark, Sf0001)
      .filter(org.apache.spark.sql.functions.col("event_type") === "error")
      .withWatermark("ts", "10 minutes")
    val purchases = EventStream.readEvents(spark, Sf0001)
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .withWatermark("ts", "10 minutes")
    val joined = EventStream.errorPurchaseJoinDf(errors, purchases)
    EventStream.runToMemory(joined, "stream_rangejoin", outputMode = "append")
    val streamed = sortedRows(spark.table("stream_rangejoin").collect())
    val batch = sortedRows(
      graft.pipeline.RangeJoin.errorPurchaseCorrelation(spark, Sf0001).collect())
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("left-outer stream-stream join emits null-matched rows after the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    def ts(s: String) = new java.sql.Timestamp(java.time.Instant.parse(s).toEpochMilli)

    val errs = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val purs = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val joined = EventStream.errorPurchaseJoinDf(
      errs.toDF().toDF("event_id", "ts", "user_id").withWatermark("ts", "1 minute"),
      purs.toDF().toDF("event_id", "ts", "user_id").withWatermark("ts", "1 minute"),
      joinType = "left_outer")
    val q = joined.writeStream
      .format("memory").queryName("stream_outer_join").outputMode("append").start()
    try {
      // user 3 matches inside the window; user 1's error never will
      errs.addData((100L, ts("2024-01-01T10:00:00Z"), 1L),
        (101L, ts("2024-01-01T10:05:00Z"), 3L))
      purs.addData((200L, ts("2024-01-01T10:10:00Z"), 3L))
      q.processAllAvailable()
      // advance BOTH watermarks far past 10:00 + 2h + 1s so the state
      // manager can prove user 1's error is unmatchable and emit it
      errs.addData((102L, ts("2024-01-01T20:00:00Z"), 9L))
      purs.addData((201L, ts("2024-01-01T20:00:00Z"), 8L))
      q.processAllAvailable()
      errs.addData((103L, ts("2024-01-02T10:00:00Z"), 9L))
      purs.addData((202L, ts("2024-01-02T10:00:00Z"), 8L))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("stream_outer_join").collect()
      .map(r => (r.getLong(0), Option(r.get(2)).map(_.toString)))
      .toSet
    assert(rows.contains((101L, Some("200"))),
      s"matched pair missing: $rows")
    assert(rows.contains((100L, None)),
      s"unmatched error not emitted with nulls after watermark: $rows")
  }

  test("dropDuplicatesWithinWatermark dedups across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    def ts(s: String) = new java.sql.Timestamp(java.time.Instant.parse(s).toEpochMilli)

    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val deduped = EventStream.dedupWithinWatermark(
      input.toDF().toDF("event_id", "ts", "payload"), Seq("event_id"))
    val q = deduped.writeStream
      .format("memory").queryName("stream_dedup").outputMode("append").start()
    try {
      // batch 1: id 1 twice in one batch, id 2 once
      input.addData(
        (1L, ts("2024-01-01T10:00:00Z"), "a"),
        (1L, ts("2024-01-01T10:00:30Z"), "a-dup-same-batch"),
        (2L, ts("2024-01-01T10:01:00Z"), "b"))
      q.processAllAvailable()
      // batch 2: id 1 again within the watermark horizon -> dropped;
      // id 3 is new
      input.addData(
        (1L, ts("2024-01-01T10:02:00Z"), "a-dup-next-batch"),
        (3L, ts("2024-01-01T10:03:00Z"), "c"))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("stream_dedup").collect().map(_.getLong(0)).toSeq.sorted
    assert(ids == Seq(1L, 2L, 3L), s"expected one row per id, got $ids")
  }

  test("NTZ-annotated events stream through the watermark path end-to-end") {
    // The second fixture shape that has actually shipped: TIMESTAMP
    // (MICROS, isAdjustedToUTC=false). The session pins
    // inferTimestampNTZ=false, so the batch/stream NTZ cast arms never
    // fire under normal test runs — this case writes a genuinely
    // NTZ-annotated copy of the fixture and replays it under Spark's
    // DEFAULT inference (NTZ), driving readEvents' TimestampNTZType arm
    // through withWatermark + window aggregation to the same rows the
    // batch path produces.
    import org.apache.spark.sql.functions.col
    import org.apache.parquet.schema.LogicalTypeAnnotation.{TimeUnit, TimestampLogicalTypeAnnotation}
    val base = java.nio.file.Files.createTempDirectory("graft-ntz-events").toString
    Tables(spark, Sf0001, "events")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"$base/events.parquet")
    val (phys, ann) = graft.util.ParquetFooter
      .columnType(spark, s"$base/events.parquet", "ts")
    assert(ann.exists {
      case t: TimestampLogicalTypeAnnotation =>
        !t.isAdjustedToUTC && t.getUnit == TimeUnit.MICROS
      case _ => false
    }, s"staged fixture is not NTZ-annotated: " +
      graft.util.ParquetFooter.describe(phys, ann))
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ", "true")
    try {
      val events = EventStream.readEvents(spark, base)
      assert(events.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampType,
        s"NTZ arm did not normalize: ${events.schema("ts").dataType}")
      EventStream.runToMemory(
        EventStream.hourlyByType(events), "stream_hourly_ntz")
      val streamed = sortedRows(spark.table("stream_hourly_ntz").collect())
      val batch = sortedRows(Events.hourlyByType(spark, Sf0001).collect())
      assert(streamed == batch)
    } finally spark.conf.set("spark.sql.parquet.inferTimestampNTZ", "false")
  }

  test("streaming sliding-window counts equal the batch aggregation (sf0.001)") {
    val stream = EventStream.slidingCounts(EventStream.readEvents(spark, Sf0001))
    EventStream.runToMemory(stream, "stream_sliding")
    val streamed = sortedRows(spark.table("stream_sliding").collect())
    val batch = sortedRows(Events.slidingCounts(spark, Sf0001).collect())
    assert(streamed == batch)
  }
}
