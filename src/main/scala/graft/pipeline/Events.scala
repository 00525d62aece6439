package graft.pipeline

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch event analytics over `events` (SURVEY §2 B-7 batch side; the
  * streaming versions with watermarks live in graft.streaming and are
  * equivalence-tested against these).
  *
  * Timestamps never appear raw in outputs: the fixture is TIMESTAMP(NANOS)
  * parquet while Spark works at microseconds, so outputs carry
  * second-resolution formatted strings that both engines agree on.
  */
object Events {

  /** Q8: tumbling 1-hour window counts per event type. */
  def hourlyByType(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .orderBy("hour", "event_type")

  /** Q8b: sessionization — 30-minute inactivity gap per user, batch
    * (gaps-and-islands with a window; identical semantics to the
    * `session_window` streaming version for non-boundary gaps).
    */
  def sessionize(spark: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    val gapSec = gapMinutes * 60L
    Tables(spark, dir, "events")
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("brk",
        when(col("prev_ts").isNull, 0)
          .when(unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapSec * 1000000L, 1)
          .otherwise(0))
      .withColumn("sess", sum("brk").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sess")
      .agg(
        date_format(min("ts"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        count(lit(1)).as("n_events"),
        round(sum("value"), 4).as("sum_value"))
      .select("user_id", "session_start", "n_events", "sum_value")
      .orderBy("user_id", "session_start")
  }

  /** Sliding-window (1h window, 15m slide) event counts — returned with
    * formatted window bounds; used by the streaming equivalence test.
    */
  def slidingCounts(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
        col("event_type"), col("n"))
      .orderBy("w_start", "event_type")
}
