package graft.pipeline

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. `df.sample()` is
  * the wrong tool at 100 TB: it draws from `rand()`, so a retried task,
  * a re-run job, or an AQE re-plan yields a DIFFERENT sample — silent
  * non-reproducibility in the exact place (corpus downsampling) where
  * lineage audits demand "same inputs → same corpus". Hash-based
  * sampling keys the keep decision on the ROW (id), not on execution:
  * retry-safe, re-run-stable, and join-consistent (the same id samples
  * identically in every table that shares it).
  *
  * The hash is Knuth's multiplicative scheme on the key — one 64-bit
  * multiply + mod, exact in any engine's integer arithmetic (deliberately
  * NOT Spark's `hash()`/`xxhash64`, which no other engine reproduces) —
  * uniform enough for rate control, and documented as not
  * cryptographically hiding the key.
  */
object Sampling {

  /** Per-mille keep bucket in [0, 1000) for a long key column. Exact for
    * non-negative keys below ~3.5e9 (the 64-bit product must not
    * overflow: Spark would wrap silently where other engines raise) —
    * pre-fold wider key spaces with a mod before calling.
    */
  def keepBucket(key: Column): Column =
    pmod((key * lit(2654435761L)) % lit(4294967296L), lit(1000L))

  /** Keep rows whose bucket falls under `ratePerMille` (a Column, so
    * rates can vary per stratum).
    */
  def sampled(df: DataFrame, key: String, ratePerMille: Column): DataFrame =
    df.withColumn("bucket", keepBucket(col(key)))
      .filter(col("bucket") < ratePerMille)

  /** Q53: stratified corpus downsampling — per-source rates (docs keep
    * 100‰/300‰/500‰ by source index mod 3), the exact shape of a
    * source-rebalancing pass before training. Row-level output so the
    * gate verifies every keep decision, not just the counts.
    */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val rate = (lit(100L)
      + (regexp_extract(col("source"), "([0-9]+)$", 1).cast("long") % 3L)
      * lit(200L))
    sampled(docs, "doc_id", rate)
      .select(col("doc_id"), col("source"), col("bucket"),
        rate.cast("long").as("rate_mille"))
      .orderBy("doc_id")
  }

  /** Per-million keep bucket — same Knuth hash as [[keepBucket]], finer
    * granularity for per-source mixing rates.
    */
  def keepBucketPpm(key: Column): Column =
    pmod((key * lit(2654435761L)) % lit(4294967296L), lit(1000000L))

  /** Q65: temperature-weighted corpus mixing (α = 0.5) — the standard
    * source-rebalancing pass before training (multilingual/multi-source
    * sampling à la GPT-3 §2.2 / XLM-R): each source's share of the
    * output is proportional to `N_s^α`, flattening the head sources and
    * boosting the tail, at an overall target of half the corpus.
    *
    * Determinism discipline: the per-source rate is computed ENTIRELY
    * in exact integer arithmetic — `w_s = floor(sqrt(N_s)·1000)` (sqrt
    * is IEEE-correctly-rounded in both engines; floor to integer
    * milli-units BEFORE any sum, the q44 lesson), then
    * `rate_ppm = (w_s·T·10⁶) div (Σw·N_s)` as one BIGINT expression,
    * and the keep decision is the Knuth-hash ppm bucket against that
    * rate. No float survives into the decision, so a retried task, a
    * re-run, or a different partitioning yields the identical corpus.
    *
    * Scale shape: one count-by-source aggregation (tiny result), the
    * per-source rate frame broadcast back onto the doc scan — the
    * corpus itself is touched in exactly one narrow filter pass.
    */
  def temperatureMix(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents").select("doc_id", "source")
    // totals via an unpartitioned window over the per-source frame (a
    // handful of rows) rather than a separate aggregate: a second
    // consumer of `counts` would re-run the corpus scan — Spark has no
    // cross-subtree CSE (the q41 lesson, pinned by PlanShapeSpec)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy()
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val counts = docs.groupBy("source")
      .agg(count(lit(1)).as("n_src"))
      .withColumn("w_milli",
        floor(sqrt(col("n_src").cast("double")) * lit(1000.0)).cast("long"))
    val rates = counts
      .withColumn("n_total", sum(col("n_src")).over(w))
      .withColumn("w_total", sum(col("w_milli")).over(w))
      .withColumn("target_total", expr("n_total div 2"))
      .withColumn("rate_ppm",
        least(lit(1000000L),
          expr("(w_milli * target_total * 1000000) div (w_total * n_src)")))
      .select("source", "n_src", "rate_ppm")
    docs.join(broadcast(rates), "source")
      .withColumn("bucket", keepBucketPpm(col("doc_id")))
      .filter(col("bucket") < col("rate_ppm"))
      .select(col("doc_id"), col("source"), col("n_src"), col("rate_ppm"),
        col("bucket"))
      .orderBy("doc_id")
  }

  /** Q98: water-filling token-budget allocation across sources — the
    * budget-capped counterpart of [[temperatureMix]]'s rate-based
    * mixing: given a global token budget B (here total div 2), each
    * source receives min(its availability, λ) with the water level λ
    * set so allocations sum exactly to B. Small sources saturate (take
    * everything they have); the survivors split the remainder evenly,
    * with the integer remainder going to the LARGEST unsaturated
    * sources (ties to source name order) so the answer is exact and
    * deterministic — every arithmetic step is BIGINT, both engines
    * floor-divide identically.
    *
    * The classic ascending scan decides saturation: with sources
    * sorted by availability, source j saturates iff
    * `avail_j · slots_j ≤ B − prefix_j` (everything smaller already
    * taken in full; slots = sources from j on). Scale shape: one
    * per-source aggregation (k rows); the windows run over that k-row
    * frame — query-compilation-sized, the [[temperatureMix]] /
    * prefix-sum-offsets class, never over the corpus.
    */
  def q98BudgetWaterfill(spark: SparkSession, dir: String): DataFrame = {
    val sizes = Tables(spark, dir, "documents")
      .groupBy("source")
      .agg(sum(size(split(trim(col("text")), "\\s+")).cast("long")).as("avail"))
    waterfill(sizes)
  }

  /** The allocation core over any (source, avail) frame; budget =
    * total div 2. Exposed for the saturation-path spec (the fixture's
    * near-equal sources never saturate).
    */
  private[graft] def waterfill(sizes: DataFrame): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val wAll = W.partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    val wAsc = W.orderBy(col("avail").asc, col("source").asc)
    val scanned = sizes
      .withColumn("__total", sum(col("avail")).over(wAll))
      .withColumn("__budget", expr("__total div 2"))
      .withColumn("__rn", row_number().over(wAsc).cast("long"))
      .withColumn("__k", count(lit(1)).over(wAll))
      .withColumn("__prefix",
        coalesce(sum(col("avail")).over(
          wAsc.rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
      .withColumn("saturated",
        col("avail") * (col("__k") - col("__rn") + 1L)
          <= col("__budget") - col("__prefix"))
    val wDesc = W.orderBy(col("avail").desc, col("source").asc)
    scanned
      .withColumn("__sat_sum",
        coalesce(sum(when(col("saturated"), col("avail"))).over(wAll), lit(0L)))
      .withColumn("__u",
        sum(when(!col("saturated"), 1L).otherwise(0L)).over(wAll))
      .withColumn("__rem", col("__budget") - col("__sat_sum"))
      .withColumn("__unsat_rank",
        sum(when(!col("saturated"), 1L).otherwise(0L)).over(
          wDesc.rowsBetween(W.unboundedPreceding, 0)))
      .withColumn("allocated",
        when(col("saturated"), col("avail")).otherwise(
          expr("__rem div __u")
            + when(col("__unsat_rank") <= expr("__rem % __u"), 1L).otherwise(0L)))
      .select(col("source"), col("avail"), col("saturated"), col("allocated"))
      .orderBy("source")
  }

  /** Q99: [[q98BudgetWaterfill]]'s allocations enforced as a per-source
    * admission gate — docs admit in id order while their source's
    * running token total fits its allocation. The row-level output a
    * feed materializes (admitted flag, not just counts), and the batch
    * face of [[graft.streaming.StreamingQuota]]. Scale shape: one
    * per-source window over the corpus (partitioned — never global)
    * plus the broadcast k-row allocation frame.
    */
  def q99QuotaGate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
    val alloc = q98BudgetWaterfill(spark, dir).select("source", "allocated")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(Long.MinValue, 0)
    docs
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .join(broadcast(alloc), "source")
      .select(col("doc_id"), col("source"), col("n_tokens"), col("cum_tokens"),
        (col("cum_tokens") <= col("allocated")).as("admitted"))
      .orderBy("doc_id")
  }
}
