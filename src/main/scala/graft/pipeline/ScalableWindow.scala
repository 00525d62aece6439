package graft.pipeline

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Distributed GLOBAL running aggregation — the production replacement
  * for `Window.orderBy(...)` with no partition clause, which Spark
  * executes as a single-partition sort (the q69-class scale killer this
  * module exists to retire).
  *
  * The classic three-step prefix-sum shape:
  *
  *  1. range-repartition by the sort key and sort within partitions
  *     (one shuffle — the same price any global sort pays);
  *  2. one narrow per-partition fold computes in-partition prefix sums
  *     (a sequential recurrence, so a typed `mapPartitions` — the
  *     SURVEY §2(d) case, same precedent as
  *     [[SequencePacker]]'s fold);
  *  3. per-partition totals (ONE row per partition) get prefix-summed
  *     into start offsets and broadcast-joined back.
  *
  * The only unpartitioned window in the plan runs over the step-3
  * totals frame, whose row count is the shuffle-partition count — it is
  * bounded by CLUSTER layout, never by data volume, which is exactly
  * the boundedness argument that makes driver-side convergence counts
  * acceptable in [[Dedup]]. Everything data-sized stays distributed.
  */
object ScalableWindow {

  /** Global running sum of `valueCol` (must be LongType — exact integer
    * arithmetic only, the house discipline) in the total order given by
    * `order`. The order MUST be total (include a unique tiebreaker):
    * with duplicate sort keys the split of equal rows across partition
    * boundaries would make prefix values order-dependent.
    *
    * Output: the input columns plus `outCol` = inclusive running sum
    * (ROWS UNBOUNDED PRECEDING semantics).
    */
  def globalRunningSum(
      df: DataFrame,
      valueCol: String,
      outCol: String,
      order: Column*): DataFrame = {
    val spark = df.sparkSession
    require(df.schema(valueCol).dataType == LongType,
      s"$valueCol must be LongType (exact integer running sums only)")
    val parts = spark.sessionState.conf.numShufflePartitions.max(1)
    val ranged = df
      .repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
    val vIdx = ranged.schema.fieldIndex(valueCol)
    val outSchema = ranged.schema
      .add(outCol, LongType, nullable = false)
      .add("__pid", IntegerType, nullable = false)
    val withCum = ranged.mapPartitions { rows =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var acc = 0L
      rows.map { r =>
        acc += r.getLong(vIdx)
        Row.fromSeq(r.toSeq :+ acc :+ pid)
      }
    }(Encoders.row(outSchema))

    // one row per non-empty partition; the exclusive prefix of the
    // totals is each partition's start offset. Bounded by `parts`.
    // The partition total is sum(value), NOT max(prefix) — max equals
    // the final prefix only when every value is non-negative, and the
    // operator accepts any LongType column.
    val offsets = withCum
      .groupBy(col("__pid")).agg(sum(col(valueCol)).as("__total"))
      .withColumn("__off",
        coalesce(
          sum(col("__total")).over(
            Window.orderBy(col("__pid"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__pid"), col("__off"))

    withCum
      .join(broadcast(offsets), "__pid")
      .withColumn(outCol, col(outCol) + col("__off"))
      .select(df.columns.map(col) :+ col(outCol): _*)
  }

  /** Q87: token-budget corpus selection — the "best data under a token
    * budget" pass of training-set assembly (select greedily by value
    * density until the budget is spent). Value density here is the
    * exact-integer lexical-diversity rate `n_distinct·10⁶ div
    * n_tokens`; the budget is a tenth of the corpus's total tokens.
    * The running token total over the (density desc, doc_id) total
    * order comes from [[globalRunningSum]] — no single-partition sort
    * anywhere in the plan.
    */
  def q87BudgetSelect(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.parallelize(Tables(spark, dir, "documents"))
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("__toks"))
      .select(
        col("doc_id"),
        size(col("__toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("__toks"))).cast("long").as("n_distinct"))
      .select(col("doc_id"), col("n_tokens"),
        expr("n_distinct * 1000000L div n_tokens").as("ratio_micro"))
    val cum = globalRunningSum(d, "n_tokens", "cum_tokens",
      col("ratio_micro").desc, col("doc_id").asc)
    val budget = d.agg(expr("sum(n_tokens) div 10L").as("__budget"))
    cum
      .crossJoin(broadcast(budget))
      .filter(col("cum_tokens") <= col("__budget"))
      .select("doc_id", "n_tokens", "ratio_micro", "cum_tokens")
      .orderBy("doc_id")
  }

  /** Q96: training-shard manifest — the export step that turns a
    * cleaned corpus into fixed-token-budget shards for the trainer
    * (each shard ≈ total/20 tokens; a document lands wholly in the
    * shard its running offset starts in, the standard greedy cut).
    * Shards are contiguous in the doc_id export order BY CONSTRUCTION —
    * `shard_id = floor(exclusive_running_tokens / budget)` is monotone
    * in the order — so a writer can stream each shard sequentially.
    * The running offset comes from [[globalRunningSum]]: no
    * single-partition window anywhere; the per-shard manifest rows are
    * one agg shuffle over shard_id.
    */
  def q96ShardManifest(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.parallelize(Tables(spark, dir, "documents"))
      .select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
    val cum = globalRunningSum(d, "n_tokens", "__cum", col("doc_id").asc)
      .withColumn("__cum_excl", col("__cum") - col("n_tokens"))
    val budget = d.agg(expr("sum(n_tokens) div 20L + 1L").as("__budget"))
    cum
      .crossJoin(broadcast(budget))
      .withColumn("shard_id", expr("__cum_excl div __budget"))
      .groupBy("shard_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").cast("long").as("shard_tokens"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))
      .orderBy("shard_id")
  }
}
