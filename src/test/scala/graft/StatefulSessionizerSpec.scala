package graft

import graft.pipeline.Events
import graft.streaming.StatefulSessionizer
import graft.streaming.StatefulSessionizer.{Ev, Open}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

class StatefulSessionizerSpec extends AnyFunSuite with SharedSpark {

  test("property: session merge is invariant to event order and batch split") {
    // the invariant the streaming path depends on: folding events in ANY
    // arrival order, split across ANY micro-batch boundaries, yields the
    // sessions of one complete sorted pass. Boundaries and counts must
    // be identical; the value SUM is only associative up to fp rounding
    // (different grouping -> ULP differences), so it gets a tolerance —
    // the same acceptance the double-sum aggregations make.
    val gapUs = 10L * 1000000L
    val evGen = Gen.listOfN(14,
      Gen.zip(Gen.chooseNum(0L, 200L), Gen.chooseNum(1, 99999)).map { case (s, v) =>
        Ev(1L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(s)), v / 100.0)
      })
    val prop = Prop.forAll(evGen, Gen.chooseNum(1, 4), Gen.long) {
      (events, nBatches, seed) =>
        val rnd = new scala.util.Random(seed)
        val shuffled = rnd.shuffle(events)
        val batches = (0 until nBatches)
          .map(i => shuffled.zipWithIndex.collect {
            case (e, j) if j % nBatches == i => e
          })
        val incremental = batches.foldLeft(List.empty[Open]) { (state, batch) =>
          StatefulSessionizer.merged(state, batch.iterator, gapUs)
        }
        val oneShot = StatefulSessionizer.merged(Nil, events.iterator, gapUs)
        incremental.map(s => (s.startUs, s.lastUs, s.n)) ==
          oneShot.map(s => (s.startUs, s.lastUs, s.n)) &&
          incremental.zip(oneShot).forall { case (a, b) =>
            math.abs(a.sum - b.sum) < 1e-9
          }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, s"scalacheck: ${res.status}")
  }

  test("batch stateful sessionization equals the gaps-and-islands query (sf0.001)") {
    val stateful = StatefulSessionizer.q40(spark, Sf0001)
      .collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
    val windowed = Events.sessionize(spark, Sf0001)
      .collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
    assert(stateful == windowed)
  }

  test("streaming state carries sessions across micro-batches and flushes on timeout") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    def ts(s: String) = new java.sql.Timestamp(java.time.Instant.parse(s).toEpochMilli)

    val input = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val sessions = StatefulSessionizer.sessionizeStream(
      input.toDF().toDF("user_id", "ts", "value").withWatermark("ts", "10 minutes"))
    val q = sessions.writeStream
      .format("memory").queryName("stateful_sessions").outputMode("append").start()
    try {
      // batch 1: user 1 starts a session (2 events, 10 min apart)
      input.addData((1L, ts("2024-01-01T10:00:00Z"), 1.0),
        (1L, ts("2024-01-01T10:10:00Z"), 2.0))
      q.processAllAvailable()
      // batch 2: user 1 continues the SAME session (20 min gap — under
      // the 30 min rule, even across the micro-batch boundary), then a
      // 40-min gap starts a second session -> the first must emit
      input.addData((1L, ts("2024-01-01T10:30:00Z"), 4.0),
        (1L, ts("2024-01-01T11:10:00Z"), 8.0))
      q.processAllAvailable()
      // two watermark-advancing batches: the first moves the watermark
      // past 11:10 + 30 min, the second gives the engine a trigger in
      // which the now-expired timeout fires and flushes user 1's open
      // session
      input.addData((99L, ts("2024-01-01T12:30:00Z"), 0.0))
      q.processAllAvailable()
      input.addData((99L, ts("2024-01-01T13:30:00Z"), 0.0))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.table("stateful_sessions")
      .filter($"user_id" === 1L)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(out == Set(
      // batch-1 events + batch-2 continuation merged into ONE session
      ("2024-01-01 10:00:00", 3L, 7.0),
      // the 11:10 event opened a new session, closed by the timeout
      ("2024-01-01 11:10:00", 1L, 8.0)))
  }

  test("late events that precede or bridge carried sessions merge correctly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    def ts(s: String) = new java.sql.Timestamp(java.time.Instant.parse(s).toEpochMilli)

    val input = MemoryStream[(Long, java.sql.Timestamp, Double)]
    // 2-hour watermark: the late arrivals below stay admissible, so the
    // operator (not the watermark filter) must place them
    val sessions = StatefulSessionizer.sessionizeStream(
      input.toDF().toDF("user_id", "ts", "value").withWatermark("ts", "2 hours"))
    val q = sessions.writeStream
      .format("memory").queryName("late_sessions").outputMode("append").start()
    try {
      input.addData((2L, ts("2024-01-01T10:00:00Z"), 1.0),
        (2L, ts("2024-01-01T10:10:00Z"), 1.0))
      q.processAllAvailable()
      // 09:00 precedes the carried session beyond the gap (own session);
      // 10:05 lands inside its span (merges)
      input.addData((2L, ts("2024-01-01T09:00:00Z"), 1.0),
        (2L, ts("2024-01-01T10:05:00Z"), 1.0))
      q.processAllAvailable()
      // 09:30 bridges the 09:00 session and the 10:00 session (30 min
      // to each side, and an exact-gap distance stays one session)
      input.addData((2L, ts("2024-01-01T09:30:00Z"), 1.0))
      q.processAllAvailable()
      // watermark-advancing sentinels to flush
      input.addData((99L, ts("2024-01-01T13:00:00Z"), 0.0))
      q.processAllAvailable()
      input.addData((99L, ts("2024-01-01T15:30:00Z"), 0.0))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.table("late_sessions")
      .filter($"user_id" === 2L)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(out == Set(("2024-01-01 09:00:00", 5L, 5.0)))
  }
}
