package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between two corpus snapshots — the
  * per-batch data-quality gate of a continuously-ingesting training
  * pipeline: has the (source, lang, …) mix of what arrived today
  * shifted against the reference snapshot the filters were tuned on?
  *
  * The statistic is the χ²-style divergence on FREQUENCY SHARES,
  * ppm-quantized (the q47/q52/q94 cross-engine determinism
  * discipline): each snapshot's bucket counts reduce to exact
  * `⌊n·10⁶ / total⌋` shares, and a bucket's drift contribution is
  * `(cur_ppm − ref_ppm)² div max(ref_ppm, 1)` — Pearson's χ²
  * summand on shares (the classical count-based χ² is this times the
  * current total, with ppm floors as the documented quantization).
  * Working on quantized shares rather than raw counts keeps every
  * intermediate comfortably in BIGINT — shares ≤ 10⁶, squared diffs
  * ≤ 10¹² — at ANY corpus size, where the count-based formula's
  * `(c·R − r·C)²` needs 128-bit width by ~10⁸ rows per snapshot.
  *
  * Buckets present in only one snapshot are flagged (`new` / `gone`)
  * instead of silently folded: a `new` bucket has no reference share
  * to divide by (its contribution uses the max(ref_ppm, 1) floor and
  * is typically the largest in the report), and a `gone` bucket's
  * contribution is its whole reference share. Downstream alerting
  * keys off status, not just magnitude.
  *
  * Scale shape (100 TB): one map-side-combined count aggregation per
  * snapshot (shuffles #buckets rows, not corpora), a full-outer join
  * on the bucket key, and two broadcast one-row totals. Nothing in
  * the plan is proportional to snapshot size except the two scans.
  */
object DriftMonitor {

  /** Per-bucket drift report between `ref` and `cur` over `bucketCols`.
    * Output: bucketCols ++ (ref_n, cur_n, ref_ppm, cur_ppm, chi2_ppm,
    * status) — counts/shares/statistic all BIGINT, status in
    * {ok, new, gone}. chi2_ppm sums across buckets to the corpus
    * drift score.
    */
  def chiSquareDrift(
      ref: DataFrame,
      cur: DataFrame,
      bucketCols: Seq[String]): DataFrame =
    chiSquareDriftFromCounts(
      bucketCounts(ref, bucketCols, "ref_n"),
      bucketCounts(cur, bucketCols, "cur_n"),
      bucketCols)

  /** One map-side-combined count per bucket — the reduced form both
    * the batch entry above and the streaming face maintain/compare.
    */
  def bucketCounts(
      df: DataFrame, bucketCols: Seq[String], alias: String): DataFrame =
    df.groupBy(bucketCols.map(col): _*).agg(count(lit(1)).as(alias))

  /** The drift report from already-reduced per-bucket counts (columns
    * bucketCols + ref_n / cur_n) — shared by the batch path and
    * [[graft.streaming.StreamingDrift]], so the stream/batch statistic
    * is one implementation. Robust to an empty side (shares floor to
    * a zero total's greatest(·,1) guard).
    */
  def chiSquareDriftFromCounts(
      refCounts: DataFrame,
      curCounts: DataFrame,
      bucketCols: Seq[String]): DataFrame = {
    require(bucketCols.nonEmpty, "at least one bucket column")
    val keys = bucketCols.map(col)
    val totals = refCounts.agg(coalesce(sum(col("ref_n")), lit(0L)).as("__R"))
      .crossJoin(curCounts.agg(coalesce(sum(col("cur_n")), lit(0L)).as("__C")))
    refCounts.join(curCounts, bucketCols, "full_outer")
      .na.fill(0L, Seq("ref_n", "cur_n"))
      .crossJoin(broadcast(totals))
      .withColumn("ref_ppm", expr("ref_n * 1000000 div greatest(__R, 1)"))
      .withColumn("cur_ppm", expr("cur_n * 1000000 div greatest(__C, 1)"))
      .withColumn("chi2_ppm", expr(
        """(cur_ppm - ref_ppm) * (cur_ppm - ref_ppm)
          | div greatest(ref_ppm, 1)""".stripMargin))
      .withColumn("status",
        when(col("ref_n") === 0, "new")
          .when(col("cur_n") === 0, "gone")
          .otherwise("ok"))
      .select(keys ++ Seq(col("ref_n"), col("cur_n"), col("ref_ppm"),
        col("cur_ppm"), col("chi2_ppm"), col("status")): _*)
  }
}
