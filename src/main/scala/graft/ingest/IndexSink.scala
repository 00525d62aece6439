package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Index persistence seam (A-13). The reference inserts index rows
  * one-at-a-time into a Postgres/pgvector table (reference
  * src/clients/vector-client.ts:293-313); here the system of record is a
  * distributed parquet write, and a JDBC sink exists for users keeping
  * their serving database — one `df.write` job instead of a sequential
  * per-row INSERT loop.
  */
trait IndexSink {
  /** The mode a full ingest run uses when none is given — OVERWRITE for
    * the parquet system of record (rebuilds are the contract), APPEND
    * for JDBC: Spark's JDBC overwrite DROPs and recreates the target
    * with inferred column types, which on a user's live serving table
    * would destroy the vector column type, indexes and grants. Callers
    * who really want a destructive JDBC rebuild must say so.
    */
  def defaultMode: SaveMode
  def write(index: DataFrame, mode: SaveMode): Unit
  final def write(index: DataFrame): Unit = write(index, defaultMode)
}

/** Default sink: the parquet index table (system of record). */
final case class ParquetSink(path: String) extends IndexSink {
  override def defaultMode: SaveMode = SaveMode.Overwrite
  override def write(index: DataFrame, mode: SaveMode): Unit =
    index.write.mode(mode).parquet(path)
}

/** JDBC serving-table sink. The embedding array and metadata struct are
  * serialized to the reference's wire shapes (comma-joined vector
  * literal, vector-client.ts:303; JSON metadata, :305) since plain JDBC
  * has no portable array/struct binding; everything else writes as-is.
  *
  * `table` is interpolated into SQL by the JDBC writer, so it is
  * validated as a (optionally schema-qualified) bare identifier — a
  * quoted or punctuated name would be an injection vector, not a table.
  */
final case class JdbcSink(
    url: String,
    table: String,
    options: Map[String, String] = Map.empty) extends IndexSink {
  require(url.startsWith("jdbc:"), s"not a JDBC url: $url")
  require(JdbcSink.isValidTableName(table),
    s"invalid table identifier '$table': expected [schema.]name of " +
      "letters/digits/underscores starting with a letter or underscore")

  override def defaultMode: SaveMode = SaveMode.Append

  override def write(index: DataFrame, mode: SaveMode): Unit =
    JdbcSink.serialized(index).write
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .options(options)
      .mode(mode)
      .save()
}

object JdbcSink {
  private val Ident = "[A-Za-z_][A-Za-z0-9_]*"
  private val TableName = s"^$Ident(\\.$Ident)?$$".r

  def isValidTableName(table: String): Boolean =
    TableName.matches(table)

  /** JDBC-safe projection: array<float> embedding -> comma-joined text
    * (the reference's vector literal body), metadata struct -> JSON.
    * Idempotent on frames without those columns.
    */
  private[graft] def serialized(index: DataFrame): DataFrame = {
    val withVec =
      if (index.columns.contains("embedding"))
        index.withColumn("embedding", array_join(col("embedding").cast("array<string>"), ","))
      else index
    if (withVec.columns.contains("metadata"))
      withVec.withColumn("metadata", to_json(col("metadata")))
    else withVec
  }
}
