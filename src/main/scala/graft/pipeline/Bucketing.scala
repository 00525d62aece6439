package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed-table co-location (100 TB toolkit): persisting both sides of
  * a recurring equi-join bucketed AND sorted by the join key makes every
  * subsequent join exchange-free — the shuffle is paid once at write
  * time instead of on every query. This is the storage-layout lever for
  * the star-schema joins (lineitem⋈orders on orderkey) that otherwise
  * shuffle the fact table per run.
  */
object Bucketing {

  /** Persist `df` as a bucketed, per-bucket-sorted table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two tables bucketed on their join keys (same bucket count):
    * plans as a sort-merge join with NO exchange and NO per-query sort.
    */
  def bucketedJoin(
      spark: SparkSession,
      tableA: String,
      keyA: String,
      tableB: String,
      keyB: String): DataFrame =
    // aliased so same-named bucket keys (the natural co-bucketed case)
    // resolve unambiguously
    spark.table(tableA).as("a")
      .join(spark.table(tableB).as("b"), col(s"a.$keyA") === col(s"b.$keyB"))
}
