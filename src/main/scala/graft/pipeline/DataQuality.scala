package graft.pipeline

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the validation pass a pipeline runs
  * before training on a snapshot (and the gate a 100 TB ingest needs
  * BEFORE the bad rows are baked into shards). Each check is a predicate
  * counted in ONE shared scan per table: `sum(when(violated, 1))` columns
  * all fold into a single aggregation, so adding a check adds zero
  * passes over the data. Cross-table referential checks are left
  * anti-join counts — the orphan side only shuffles its key column.
  */
object DataQuality {

  /** One named row-level check: `violated` flags BAD rows. */
  final case class Check(name: String, violated: Column)

  /** All checks over one table in a single scan+aggregate; output one
    * row per check.
    */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "at least one check")
    val aggs = checks.map(c =>
      sum(when(c.violated, 1L).otherwise(0L)).as(c.name))
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    // unpivot the single wide row to (check, n_violations, n_rows)
    val stacked = checks.map(c =>
      struct(lit(c.name).as("check_name"), col(c.name).as("n_violations")))
    wide.select(col("__n"), explode(array(stacked: _*)).as("s"))
      .select(
        col("s.check_name").as("check_name"),
        col("s.n_violations").as("n_violations"),
        col("__n").as("n_rows"),
        (col("s.n_violations") === 0L).as("pass"))
  }

  /** Orphan count for a foreign-key relationship (left anti join). */
  def fkOrphans(
      fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String, name: String): DataFrame = {
    val n = fact.count()
    fact.select(col(factKey))
      .join(dim.select(col(dimKey)), col(factKey) === col(dimKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(
        lit(name).as("check_name"),
        col("n_violations"),
        lit(n).as("n_rows"),
        (col("n_violations") === 0L).as("pass"))
  }

  /** Q56: the corpus + star-schema quality report — row-level checks on
    * `documents` (declared length vs actual, empty text, unknown lang,
    * id uniqueness via count-distinct delta) and FK orphan checks across
    * the join graph the relational queries depend on.
    */
  def q56Report(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val docChecks = report(docs, Seq(
      Check("doc_text_empty", length(trim(col("text"))) === 0),
      Check("doc_nchars_wrong", col("n_chars") =!= length(col("text"))),
      Check("doc_lang_unknown",
        !col("lang").isin("en", "es", "de", "fr", "zh")),
      Check("doc_null_field",
        col("doc_id").isNull || col("text").isNull
          || col("lang").isNull || col("source").isNull)))
    // uniqueness as an aggregate delta (one extra aggregate, no window)
    val docDup = docs.agg(
        (count(lit(1)) - countDistinct(col("doc_id"))).as("n_violations"),
        count(lit(1)).as("n_rows"))
      .select(lit("doc_id_duplicates").as("check_name"),
        col("n_violations"), col("n_rows"),
        (col("n_violations") === 0L).as("pass"))
    val li = Tables(spark, dir, "lineitem")
    val orders = Tables(spark, dir, "orders")
    val fks = Seq(
      fkOrphans(li, "l_orderkey", orders, "o_orderkey", "fk_lineitem_orders"),
      fkOrphans(orders, "o_custkey",
        Tables(spark, dir, "customer"), "c_custkey", "fk_orders_customer"),
      fkOrphans(Tables(spark, dir, "embeddings"), "vec_id",
        docs, "doc_id", "fk_embeddings_documents"))
    (docChecks +: docDup +: fks)
      .reduce(_ unionByName _)
      .orderBy("check_name")
  }
}
