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
}
