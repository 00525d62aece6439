package graft.pipeline

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch event analytics over `events` (SURVEY §2 B-7 batch side; the
  * streaming versions with watermarks live in [[graft.streaming.EventStream]]
  * and are equivalence-tested against these — the aggregation logic is
  * shared via the `*Df` transforms so batch and stream cannot drift).
  *
  * Timestamps never appear raw in outputs: the fixture is TIMESTAMP(NANOS)
  * parquet while Spark works at microseconds, so outputs carry
  * second-resolution formatted strings that both engines agree on.
  */
object Events {

  /** Shared transform: tumbling 1-hour counts per event type. Groups on
    * a real event-time `window` (not a formatted string of ts): the
    * output is identical in batch, and in streaming it is what lets the
    * watermark actually evict window state and drop late rows — a
    * string-keyed group would aggregate forever.
    */
  def hourlyByTypeDf(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("sum_value"))

  /** Q8: tumbling 1-hour window counts per event type. */
  def hourlyByType(spark: SparkSession, dir: String): DataFrame =
    hourlyByTypeDf(Tables(spark, dir, "events")).orderBy("hour", "event_type")

  /** Q8b: sessionization — 30-minute inactivity gap per user, batch
    * (gaps-and-islands with a window; identical semantics to the
    * `session_window` version for non-boundary gaps).
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

  /** Shared transform: native `session_window` aggregation (gap-based;
    * works in batch AND streaming — this is the 100 TB path: one shuffle
    * keyed by user, no per-user ordered window pass).
    */
  def sessionWindowDf(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(
        date_format(min("ts"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        count(lit(1)).as("n_events"),
        round(sum("value"), 4).as("sum_value"))
      .select("user_id", "session_start", "n_events", "sum_value")

  /** Q8c: sessionization via the native `session_window` operator — same
    * output contract (and DuckDB oracle) as the gaps-and-islands Q8b.
    */
  def sessionWindow(spark: SparkSession, dir: String): DataFrame =
    sessionWindowDf(Tables(spark, dir, "events"))
      .orderBy("user_id", "session_start")

  /** Shared transform: sliding-window (1h window, 15m slide) counts. */
  def slidingCountsDf(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
        col("event_type"), col("n"))

  /** Sliding-window event counts — used by the streaming equivalence test. */
  def slidingCounts(spark: SparkSession, dir: String): DataFrame =
    slidingCountsDf(Tables(spark, dir, "events")).orderBy("w_start", "event_type")

  /** Q54: signup→purchase funnel — per user: first signup, first
    * purchase strictly after it, conversion gap. The sequential-pattern
    * staple (activation analysis). Two hash aggregations and one join on
    * user_id — no per-user sort beyond the aggregates' own shuffles;
    * at scale both aggregates partial-combine map-side. Non-converted
    * users surface with null purchase/gap (left join), so the funnel
    * denominator is part of the output.
    */
  def signupFunnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
      .withColumn("sec", expr("unix_micros(ts) div 1000000"))
    val signups = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("sec").as("signup_sec"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("sec"))
    signups
      .join(purchases,
        col("user_id") === col("p_user") && col("sec") > col("signup_sec"),
        "left")
      .groupBy("user_id", "signup_sec")
      .agg(min("sec").as("purchase_sec"))
      .select(
        col("user_id"),
        col("signup_sec"),
        col("purchase_sec"),
        (col("purchase_sec") - col("signup_sec")).as("gap_s"),
        col("purchase_sec").isNotNull.as("converted"))
      .orderBy("user_id")
  }

  /** Q55: trailing-24h activity per event via a RANGE window frame
    * (`rangeBetween` on epoch seconds) — the time-based moving
    * aggregate `ROWS` frames cannot express (peers at equal timestamps
    * and irregular spacing are handled by value, not by row count).
    * The frame sum is exact integer cents, so in-frame accumulation
    * order cannot flip a bit.
    */
  def trailingActivity(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("sec")
      .rangeBetween(-86400L, 0L)
    Tables(spark, dir, "events")
      .withColumn("sec", expr("unix_micros(ts) div 1000000"))
      .withColumn("value_cents", round(col("value") * 100, 0).cast("long"))
      .select(
        col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("event_ts"),
        count(lit(1)).over(w).as("n_24h"),
        (sum("value_cents").over(w).cast("double") / 100.0).as("value_24h"))
      .orderBy("event_id")
  }

  /** Q59: semi-structured column handling — the `props` JSON payload
    * parsed and aggregated per event type. JSON-path extraction
    * (`get_json_object`) keeps the plan codegen'd; all stats are exact
    * integers plus one final IEEE division. At 100 TB the parse cost is
    * the story: extraction happens once in the scan projection, not per
    * aggregate, and a production schema would promote hot keys to
    * typed columns at ingest (`from_json` with an explicit schema).
    */
  def jsonPropsStats(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        count("k").as("n_with_k"),
        min("k").as("min_k"),
        max("k").as("max_k"),
        sum("k").as("sum_k"),
        (sum("k").cast("double") / count("k").cast("double")).as("avg_k"))
      .orderBy("event_type")

  /** Q45: last-touch purchase attribution via [[AsofJoin.backward]] —
    * each purchase joined to the same user's most recent strictly-earlier
    * click/view. Strict (`<`) so a touch at the exact purchase instant
    * doesn't attribute to itself-in-time; left-outer, so first-session
    * purchases surface with null attribution instead of vanishing.
    *
    * The right side is deduped to one row per (user, ts) with `max_by`
    * on event_id BEFORE the join — [[AsofJoin.backward]]'s uniqueness
    * contract, and the same dedup the DuckDB `ASOF JOIN` oracle applies
    * (`arg_max`), so tie-breaks can never diverge between engines.
    *
    * The gap is computed in whole epoch seconds with integral division
    * on both sides: the fixture is ns-resolution, Spark works at µs, and
    * floor-to-seconds is the resolution both engines agree on exactly.
    */
  def purchaseAttribution(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    val touches = e.filter(col("event_type").isin("click", "view"))
      .groupBy("user_id", "ts")
      .agg(
        max("event_id").as("attr_event_id"),
        max_by(col("event_type"), col("event_id")).as("attr_type"))
    AsofJoin
      .backward(purchases, touches, "user_id", "ts",
        Seq("attr_event_id", "attr_type", "ts"), strict = true)
      .select(
        col("purchase_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
        col("asof.attr_event_id").as("attr_event_id"),
        col("asof.attr_type").as("attr_type"),
        date_format(col("asof.ts"), "yyyy-MM-dd HH:mm:ss").as("attr_ts"),
        (expr("unix_micros(ts) div 1000000")
          - expr("unix_micros(asof.ts) div 1000000")).cast("long").as("gap_s"))
      .orderBy("purchase_id")
  }

  /** Q81: slowly-changing-dimension TYPE-2 history build — the
    * warehouse-core change-tracking pattern: each user's event `value`
    * is treated as an observed attribute; consecutive repeats collapse
    * into one version, each version carries `[valid_from, valid_to)`
    * with an open (null) end and `is_current` on the latest. Shape at
    * scale: exactly one shuffle (the per-user window); versions derive
    * from `lag`, validity ends from `lead` AFTER the collapse filter —
    * both over the same (ts, event_id)-ordered key, so equal timestamps
    * cannot flip versions between runs.
    */
  def q81Scd2(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val versions = Tables(spark, dir, "events")
      .select("user_id", "ts", "event_id", "value")
      .withColumn("__prev", lag("value", 1).over(w))
      .filter(col("__prev").isNull || col("value") =!= col("__prev"))
    versions
      .withColumn("__until", lead("ts", 1).over(w))
      .select(
        col("user_id"), col("value"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
        date_format(col("__until"), "yyyy-MM-dd HH:mm:ss").as("valid_to"),
        col("__until").isNull.as("is_current"))
      .orderBy("user_id", "valid_from", "value")
  }

  /** Q84: time-series RESAMPLE + forward-fill — each user's sparse
    * event stream regularized onto a dense hourly grid (`sequence` +
    * `explode` scaffold from the user's own [min, max] hour, so no
    * global calendar frame), hourly sums in exact centi-units, gaps
    * carrying the last observed hour forward via `last(_, ignoreNulls)`
    * over a running frame. The standard prep for ML feature windows
    * over irregular telemetry. Scale shape: one aggregation shuffle +
    * one per-user window; the scaffold explode is row-local.
    */
  def q84GapFill(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables(spark, dir, "events")
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hr"))
      .agg(
        sum(round(col("value") * 100, 0).cast("long")).as("hv_centi"),
        count(lit(1)).as("n_events"))
    val scaffold = hourly
      .groupBy("user_id")
      .agg(min("hr").as("__lo"), max("hr").as("__hi"))
      .select(col("user_id"),
        explode(sequence(col("__lo"), col("__hi"),
          expr("INTERVAL 1 HOUR"))).as("hr"))
    val w = Window.partitionBy("user_id").orderBy("hr")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scaffold
      .join(hourly, Seq("user_id", "hr"), "left")
      .select(
        col("user_id"),
        date_format(col("hr"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        last(col("hv_centi"), ignoreNulls = true).over(w).as("filled_centi"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("hv_centi").isNull.as("is_gap"))
      .orderBy("user_id", "hour")
  }

  /** Q93: the streaming as-of operator's batch face, oracled against
    * DuckDB's native ASOF JOIN. Purchases are attributed to the latest
    * click/view at-or-before their timestamp (INCLUSIVE — the streaming
    * state contract, vs q45's strict batch variant) by folding one
    * tagged union through [[graft.streaming.StreamingAsof.attach]] —
    * the exact code path micro-batches execute, so a green oracle here
    * pins the streaming semantics, not a batch re-derivation. Equal-ts
    * reference ties resolve last-write-wins by event id inside the fold;
    * the oracle states the same rule as arg_max over a (user, ts) group.
    * Scale shape: one shuffle on the key into the fold (the state-store
    * partitioning in the streaming run), no window, no join.
    */
  def q93StreamingAsofParity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.streaming.StreamingAsof
    val e = Tables(spark, dir, "events")
      .select(col("user_id"), expr("unix_micros(ts)").as("tsu"),
        col("event_id"), col("event_type"))
    val refs = e.filter(col("event_type").isin("click", "view"))
      .select(col("user_id").as("key"), col("tsu").as("ts"),
        lit(0).as("tag"), col("event_id").as("id"),
        col("event_type").as("payload"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("key"), col("tsu").as("ts"),
        lit(1).as("tag"), col("event_id").as("id"), lit("").as("payload"))
    StreamingAsof.attach(refs.unionByName(purchases).as[StreamingAsof.Tagged])
      .toDF()
      .select(
        col("id").as("purchase_id"),
        col("key").as("user_id"),
        date_format(timestamp_micros(col("ts")), "yyyy-MM-dd HH:mm:ss")
          .as("purchase_ts"),
        col("asof_payload").as("ref_type"),
        date_format(timestamp_micros(col("asof_ts")), "yyyy-MM-dd HH:mm:ss")
          .as("ref_ts"))
      .orderBy("purchase_id")
  }
}
