package graft.pipeline

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join — the second temporal-alignment
  * primitive Spark lacks as a built-in (with [[AsofJoin]]). A naive
  * formulation (`a.join(b, keyEq && lo <= p && p < hi)`) planner-degrades
  * to a broadcast-nested-loop or a sort-merge over the key alone with a
  * post-filter — O(per-key n·m) comparisons, the classic 100 TB
  * range-join killer when keys are hot or absent.
  *
  * The scalable shape: discretize. Explode each interval to the
  * fixed-width bins it overlaps, compute each point's single bin, and
  * equi-join on (keys..., bin) — Catalyst plans a plain shuffled hash /
  * sort-merge join on a compound key — then post-filter exact
  * containment. Each matching pair surfaces exactly once (a point lives
  * in exactly one bin), so no dedup pass is needed. Interval blowup is
  * `len/binWidth + 1` rows; pick binWidth ≈ the typical interval length
  * so the factor stays ≤ 2 while bins stay selective.
  *
  * Binning uses floor semantics (correct for negative coordinates,
  * where `div`'s truncation toward zero mis-bins); coordinates must stay
  * within ±2^53 — epoch seconds/µs and cents all do; pre-divide raw ns
  * epochs (as [[graft.Tables.events]] already does).
  */
object RangeJoin {

  /** Floor division on long columns. `x - pmod(x, w)` is computed in
    * exact long arithmetic and is an exact multiple of `w`; the one
    * double division is then exact for |x| < 2^53 (the documented
    * domain — Spark's Column `/` has no integral variant).
    */
  private def floorDiv(x: Column, w: Long): Column =
    ((x - pmod(x, lit(w))) / lit(w)).cast("long")

  /** Join each point row to every interval row with equal `keyCols` and
    * `lo <= point < hi` (half-open). Interval columns arrive prefixed
    * `ivl_` to keep the two sides' names collision-free.
    *
    * @param binWidth bin width in the shared coordinate's units; both
    *                 sides must already express point/lo/hi as LONGs in
    *                 that coordinate (epoch seconds, cents, ...)
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      binWidth: Long,
      keyCols: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val ivl = intervals.columns.foldLeft(intervals) { (df, c) =>
      df.withColumnRenamed(c, s"ivl_$c")
    }
    val iLo = col(s"ivl_$loCol")
    val iHi = col(s"ivl_$hiCol")
    val binned = ivl
      .filter(iHi > iLo) // empty intervals match nothing
      .withColumn(
        "__bin",
        explode(sequence(floorDiv(iLo, binWidth), floorDiv(iHi - 1, binWidth))))
    val p = points.withColumn("__bin", floorDiv(col(pointCol), binWidth))
    val joinCond = (keyCols.map(k => p(k) === binned(s"ivl_$k"))
      :+ (p("__bin") === binned("__bin"))
      :+ (p(pointCol) >= iLo) :+ (p(pointCol) < iHi))
      .reduce(_ && _)
    p.join(binned, joinCond).drop("__bin")
  }

  /** Q46: error-burst correlation — every `error` event paired with each
    * purchase by the same user within ±2 h (half-open on the right edge).
    * The incident-analysis staple: "which purchases were near an error?".
    * Coordinates are whole epoch seconds via integral division (the
    * ns/µs-exact resolution both engines share); binWidth = the interval
    * length, so each interval explodes to at most 2 bins.
    */
  def errorPurchaseCorrelation(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
      .withColumn("sec", expr("unix_micros(ts) div 1000000"))
    val errors = e.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"),
        col("ts").as("error_ts"), col("sec"))
    val halfW = 7200L
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"),
        (col("sec") - halfW).as("lo"), (col("sec") + halfW).as("hi"))
    pointInInterval(errors, purchases, "sec", "lo", "hi",
        binWidth = 2 * halfW, keyCols = Seq("user_id"))
      .select(
        col("error_id"), col("user_id"), col("ivl_purchase_id").as("purchase_id"),
        date_format(col("error_ts"), "yyyy-MM-dd HH:mm:ss").as("error_ts"),
        date_format(col("ivl_purchase_ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
        (col("sec") - (col("ivl_lo") + halfW)).cast("long").as("delta_s"))
      .orderBy("error_id", "purchase_id")
  }
}
