package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful sessionization (B-7) via the typed
  * `KeyValueGroupedDataset` operators — the escape hatch for session
  * semantics the built-in `session_window` cannot express (per-key
  * custom state, value-dependent gaps, mid-session emission, …). The
  * gap rule here is the same strict `gap > 30 min` as
  * [[graft.pipeline.Events.sessionize]] so the output is verified
  * against the same DuckDB oracle (q40 vs q8b's oracle).
  *
  * Two entry points over one shared fold:
  *  - [[sessionizeBatch]]: `flatMapGroups` — each group is complete, so
  *    every session (including the last open one) is emitted.
  *  - [[sessionizeStream]]: `flatMapGroupsWithState` with event-time
  *    timeout — closed sessions are emitted as they close; the open
  *    session per user is carried as state and flushed when the
  *    watermark passes its last event + gap. State is bounded: one
  *    [[Open]] record per active user.
  *
  * Scale notes: typed operators run outside whole-stage codegen (one
  * ser/deser per row), so the NATIVE `session_window` path (q8c) is the
  * default; this operator exists for the semantics that path cannot
  * host. The per-group sort is bounded by one user's events per
  * micro-batch (streaming) or per corpus (batch) — the same bound any
  * per-user sessionizer carries.
  */
object StatefulSessionizer {

  case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class Open(startUs: Long, lastUs: Long, n: Long, sum: Double)
  case class Session(user_id: Long, session_start: String, n_events: Long, sum_value: Double)

  val DefaultGapMinutes = 30L

  private def us(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L

  private val Fmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss")
    .withZone(java.time.ZoneOffset.UTC)

  private def toSession(userId: Long, s: Open): Session =
    Session(
      userId,
      Fmt.format(java.time.Instant.ofEpochSecond(s.startUs / 1000000L)),
      s.n,
      // same half-up decimal rounding Spark's round(col, 4) applies, so
      // q40 matches the q8b oracle bit-for-bit
      BigDecimal(s.sum).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)

  /** Fold a user's NEW events (any order) into the open session carried
    * in, emitting every session that closes. Shared by both modes —
    * batch and streaming sessionization cannot drift.
    */
  private def fold(
      events: Iterator[Ev],
      open0: Option[Open],
      gapUs: Long): (Seq[Open], Option[Open]) = {
    val sorted = events.toArray.sortBy(e => us(e.ts))
    val closed = Seq.newBuilder[Open]
    var open = open0
    for (e <- sorted) {
      val t = us(e.ts)
      open = open match {
        case Some(s) if t - s.lastUs > gapUs =>
          closed += s
          Some(Open(t, t, 1, e.value))
        case Some(s) =>
          Some(Open(s.startUs, math.max(s.lastUs, t), s.n + 1, s.sum + e.value))
        case None =>
          Some(Open(t, t, 1, e.value))
      }
    }
    (closed.result(), open)
  }

  private def typedEvents(events: DataFrame): Dataset[Ev] = {
    import events.sparkSession.implicits._
    events.select(col("user_id").cast("long").as("user_id"), col("ts"), col("value"))
      .as[Ev]
  }

  /** Batch mode: groups are complete, emit everything. */
  def sessionizeBatch(
      events: DataFrame,
      gapMinutes: Long = DefaultGapMinutes): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    typedEvents(events)
      .groupByKey(_.user_id)
      .flatMapGroups { (userId: Long, events: Iterator[Ev]) =>
        val (closed, open) = fold(events, None, gapUs)
        (closed ++ open).map(toSession(userId, _)).iterator
      }
  }

  /** Streaming mode: requires a watermark on `ts`; emits sessions as
    * they close (append semantics), flushes idle open sessions via
    * event-time timeout once the watermark passes last event + gap.
    */
  def sessionizeStream(
      events: DataFrame,
      gapMinutes: Long = DefaultGapMinutes): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    typedEvents(events)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Open, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, events: Iterator[Ev], state: GroupState[Open]) =>
          if (state.hasTimedOut) {
            // watermark passed lastUs + gap with no new events: the open
            // session can never be extended — close it
            val done = state.get
            state.remove()
            Iterator(toSession(userId, done))
          } else {
            val (closed, open) = fold(events, state.getOption, gapUs)
            open match {
              case Some(s) =>
                state.update(s)
                // timeout once the watermark passes the gap horizon; the
                // horizon may already be older than the watermark when
                // this key's last event lags the stream (a just-late
                // session) — clamp forward so the timeout fires on the
                // next trigger instead of throwing
                state.setTimeoutTimestamp(
                  math.max(s.lastUs / 1000L + gapMinutes * 60L * 1000L,
                    state.getCurrentWatermarkMs() + 1))
              case None => state.remove()
            }
            closed.map(toSession(userId, _)).iterator
          }
      }
  }

  /** Q40: batch stateful sessionization over the events fixture — same
    * output contract and oracle as q8b.
    */
  def q40(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    sessionizeBatch(graft.Tables(spark, dir, "events"))
      .toDF()
      .orderBy("user_id", "session_start")
}
