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
  * Core model: a session is an interval [startUs, lastUs] with counts;
  * events (and carried state) are merged with gap-tolerant INTERVAL
  * MERGING, so out-of-order arrivals — including a late event that
  * precedes every session seen so far, or one that bridges two
  * previously-separate sessions — land correctly regardless of arrival
  * order. Streaming emits a session only once the watermark has passed
  * `last + gap` (no event still admitted by the watermark can extend
  * it), carrying every younger session as state; batch groups are
  * complete, so everything merges then emits. Both modes share one
  * merge function: session boundaries and counts are identical by
  * construction; value sums agree up to fp associativity (different
  * arrival grouping reorders double additions — ULP-level, absorbed by
  * the 4-decimal emission rounding except exactly on a rounding
  * boundary, the acceptance every double-sum aggregate here makes).
  *
  * Scale notes: typed operators run outside whole-stage codegen (one
  * ser/deser per row), so the NATIVE `session_window` path (q8c) is the
  * default; this operator exists for the semantics that path cannot
  * host. State is bounded: the open sessions of one user inside the
  * watermark horizon.
  */
object StatefulSessionizer {

  case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class Open(startUs: Long, lastUs: Long, n: Long, sum: Double)
  case class OpenList(sessions: List[Open])
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

  /** Gap-tolerant interval merge of existing sessions + new events, in
    * start order. Order-insensitive by construction — the one merge
    * rule both batch and streaming sessionization run (pinned by the
    * batching-invariance property in `StatefulSessionizerSpec`).
    */
  private[graft] def merged(existing: List[Open], events: Iterator[Ev], gapUs: Long): List[Open] = {
    val all = (existing ++ events.map(e => Open(us(e.ts), us(e.ts), 1L, e.value)))
      .sortBy(_.startUs)
    val out = scala.collection.mutable.ListBuffer.empty[Open]
    for (s <- all) {
      out.lastOption match {
        case Some(prev) if s.startUs - prev.lastUs <= gapUs =>
          out.update(out.length - 1,
            Open(prev.startUs, math.max(prev.lastUs, s.lastUs),
              prev.n + s.n, prev.sum + s.sum))
        case _ => out += s
      }
    }
    out.toList
  }

  private def typedEvents(events: DataFrame): Dataset[Ev] = {
    import events.sparkSession.implicits._
    events.select(col("user_id").cast("long").as("user_id"), col("ts"), col("value"))
      .as[Ev]
  }

  /** Batch mode: groups are complete, merge then emit everything. */
  def sessionizeBatch(
      events: DataFrame,
      gapMinutes: Long = DefaultGapMinutes): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    typedEvents(events)
      .groupByKey(_.user_id)
      .flatMapGroups { (userId: Long, events: Iterator[Ev]) =>
        merged(Nil, events, gapUs).map(toSession(userId, _)).iterator
      }
  }

  /** Streaming mode: requires a watermark on `ts`. A session is emitted
    * exactly when `last + gap < watermark` — the first moment no
    * admissible event can extend or bridge it; younger sessions ride in
    * state. Event-time timeout re-invokes idle keys so their sessions
    * flush as the watermark advances.
    */
  def sessionizeStream(
      events: DataFrame,
      gapMinutes: Long = DefaultGapMinutes): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    typedEvents(events)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenList, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, events: Iterator[Ev], state: GroupState[OpenList]) =>
          val sessions = merged(
            state.getOption.map(_.sessions).getOrElse(Nil), events, gapUs)
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (done, open) = sessions.partition(s => s.lastUs + gapUs < wmUs)
          if (open.isEmpty) state.remove()
          else {
            state.update(OpenList(open))
            // wake this key when the oldest open session's horizon
            // passes the watermark; clamp forward so a lagging key's
            // already-expired horizon fires next trigger instead of
            // throwing
            state.setTimeoutTimestamp(
              math.max(open.map(_.lastUs).min / 1000L + gapMinutes * 60L * 1000L,
                state.getCurrentWatermarkMs() + 1))
          }
          done.map(toSession(userId, _)).iterator
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
