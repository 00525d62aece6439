package graft.pipeline

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Z-order (Morton) data-layout clustering — the multi-dimensional file
  * clustering op behind Delta/Iceberg `OPTIMIZE ZORDER BY`: interleave
  * the bits of per-dimension range-bucket indexes so that sorting by
  * the interleaved key co-locates rows that are close in EITHER
  * dimension, which turns parquet min/max footer stats into effective
  * data skipping for predicates on any z-ordered column. A linear sort
  * by (a, b) only ever skips on `a`; z-order bounds both.
  *
  * Two paths, same key function:
  *   - [[clustered]] / q69: per-dimension buckets from exact `ntile`
  *     over a total order — deterministic, so the DuckDB oracle can
  *     verify every bucket's min/max envelope bit-for-bit. The global
  *     ntile window is a single-partition sort, acceptable for an
  *     oracle-gated verifier, NOT the 100 TB path.
  *   - [[repartitionByZ]]: the production path — `repartitionByRange`
  *     on the z-key (sample-based range bounds, fully distributed, no
  *     global sort). Its bounds are sampled, hence not byte-stable
  *     across runs; ZOrderSpec asserts its clustering QUALITY (every
  *     partition's per-dimension envelope is a small fraction of the
  *     domain) instead of exact assignment.
  */
object ZOrder {

  /** Bits per dimension in the interleaved key (256 range tiles). */
  val DimBits = 8

  /** Fixed z-range width that folds the 2·[[DimBits]]-bit z-space into
    * 64 output buckets ("files").
    */
  val BucketShift = 2 * DimBits - 6

  /** Interleave two bucket-index columns (values in [0, 2^bits)) into
    * the Morton key: bit i of x lands at 2i, bit i of y at 2i+1.
    */
  def interleave(x: Column, y: Column, bits: Int = DimBits): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** Per-row z-keys for lineitem's (partkey, suppkey), with the
    * deterministic ntile dimension buckets. Total order inside each
    * ntile via the unique (orderkey, linenumber) tiebreak.
    */
  private def zKeyed(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val tiles = 1 << DimBits
    val wx = Window.orderBy("l_partkey", "l_orderkey", "l_linenumber")
    val wy = Window.orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    li
      .withColumn("xb", (ntile(tiles).over(wx) - 1).cast("long"))
      .withColumn("yb", (ntile(tiles).over(wy) - 1).cast("long"))
      .withColumn("z", interleave(col("xb"), col("yb")))
  }

  /** Q69: the clustering-quality report of a z-order layout — 64 fixed
    * z-ranges ("files") with each one's row count and per-dimension
    * min/max envelope. These envelopes ARE the parquet footer stats a
    * scan would prune on; the oracle verifies them exactly.
    */
  def clustered(spark: SparkSession, dir: String): DataFrame =
    zKeyed(spark, dir)
      .withColumn("bucket", shiftright(col("z"), BucketShift))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_rows"),
        min("l_partkey").as("min_part"), max("l_partkey").as("max_part"),
        min("l_suppkey").as("min_supp"), max("l_suppkey").as("max_supp"))
      .orderBy("bucket")

  /** Q69b — the PRODUCTION z-layout pass, and the variant the benchmark
    * grades: per-dimension buckets come from VALUE-scaled ranges
    * (`(x − min)·tiles div (max − min + 1)`), so the key computation is
    * row-local once a one-row min/max bounds frame broadcasts — no
    * window, no total order, no single-partition sort anywhere in the
    * plan. Cost at any scale: one partial-aggregated bounds pass + one
    * embarrassingly-parallel key projection + one 64-group aggregation.
    * Deterministic (unlike sampled `repartitionByRange` bounds), so the
    * DuckDB oracle verifies every envelope bit-for-bit; [[clustered]]'s
    * ntile variant remains the equi-POPULATED verifier, headline-excluded
    * the way the q14/q20 exact verifiers are. Value scaling trades the
    * ntile guarantee (equal rows per tile) for distribution: skewed
    * dimensions give uneven bucket sizes but identical envelope bounds,
    * which is what footer-stat skipping actually prunes on.
    */
  def scaledClustered(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .select("l_partkey", "l_suppkey")
    val tiles = 1L << DimBits
    val bounds = li.agg(
      min("l_partkey").as("__pmin"), max("l_partkey").as("__pmax"),
      min("l_suppkey").as("__smin"), max("l_suppkey").as("__smax"))
    li.crossJoin(broadcast(bounds))
      .withColumn("xb", least(lit(tiles - 1),
        expr(s"(l_partkey - __pmin) * $tiles div (__pmax - __pmin + 1)")))
      .withColumn("yb", least(lit(tiles - 1),
        expr(s"(l_suppkey - __smin) * $tiles div (__smax - __smin + 1)")))
      .withColumn("z", interleave(col("xb"), col("yb")))
      .withColumn("bucket", shiftright(col("z"), BucketShift))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_rows"),
        min("l_partkey").as("min_part"), max("l_partkey").as("max_part"),
        min("l_suppkey").as("min_supp"), max("l_suppkey").as("max_supp"))
      .orderBy("bucket")
  }

  /** Production layout pass: distribute by sampled z ranges, sort
    * within partitions, ready for a partition-per-file write. No global
    * sort; the z computation itself is embarrassingly parallel once the
    * per-dimension bounds come from a sample (or [[scaledClustered]]'s
    * exact value-scaled buckets when the dimensions are numeric).
    */
  def repartitionByZ(df: DataFrame, numPartitions: Int, z: Column): DataFrame =
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
}
