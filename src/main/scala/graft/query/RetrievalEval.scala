package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graded retrieval-quality metrics — the evaluation layer every
  * production deployment of the reference's query path bolts on
  * (the reference itself ships none: its quality story ends at the
  * similarity threshold, reference src/clients/vector-client.ts:
  * 396-415). Given a ranked hit list and a relevance set, emits the
  * standard per-query metrics — hits@k, recall@k, success@k, MRR,
  * DCG/NDCG@k — in EXACT integer arithmetic (micro/nano fixed-point),
  * so the numbers are bit-identical across engines and partial
  * aggregation order.
  *
  * The one genuinely irrational ingredient, the NDCG discount
  * 1/log2(r+1), is computed ONCE on the driver in Scala
  * ([[discountNanos]]) and embedded as a literal lookup in both the
  * Spark plan and the DuckDB oracle (the oracle SQL interpolates the
  * same array), so no libm call ever runs inside either engine — the
  * q47/q52/q94 cross-engine determinism discipline.
  *
  * Scale shape (100 TB): both inputs are answer-sized by nature (hits
  * = queries × maxRank rows, relevance = the labeled eval set), never
  * corpus-sized; the pass is one left join on (query, doc) plus two
  * per-query aggregations. The expensive part of evaluation — the
  * retrieval that PRODUCES the hit list — stays in the retrieval
  * kernels with their own scale shapes.
  */
object RetrievalEval {

  /** 1e9-scaled DCG discounts `⌊1e9 / log2(r+1)⌋`, r = 1..k. */
  def discountNanos(k: Int): Seq[Long] =
    (1 to k).map(r => (1e9 / (math.log(r + 1.0) / math.log(2.0))).toLong)

  /** Ideal DCG prefix sums: `idcgNanos(k)(m-1)` is the DCG of m
    * relevant results at ranks 1..m — the normalizer for a query with
    * m = min(n_rel, k) attainable relevant slots.
    */
  def idcgNanos(k: Int): Seq[Long] = discountNanos(k).scanLeft(0L)(_ + _).tail

  /** Per-query metrics over a ranked hit list.
    *
    * @param hits  (queryIdCol, docIdCol, rankCol) — rankCol 1-based,
    *              deterministic ties already broken by the retrieval
    *              kernel; ranks past k still count for MRR
    * @param rels  DISTINCT relevant (queryIdCol, docIdCol) pairs; a
    *              query absent here gets n_rel = 0 and zero metrics
    * @param k     cutoff for hits/recall/success/NDCG
    * @return one row per query:
    *         (queryIdCol, n_rel, hits_at_k, recall_micro,
    *          success_at_k, first_rel_rank [0 = none], mrr_micro,
    *          dcg_nanos, idcg_nanos, ndcg_micro) — all BIGINT
    */
  def metrics(
      hits: DataFrame,
      queryIdCol: String,
      docIdCol: String,
      rankCol: String,
      rels: DataFrame,
      k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val disc = discountNanos(k)
    val idcg = idcgNanos(k)
    val relCounts = rels
      .groupBy(col(queryIdCol))
      .agg(count(lit(1)).cast("long").as("n_rel"))
    val flagged = hits
      .join(rels.withColumn("__rel", lit(1L)), Seq(queryIdCol, docIdCol), "left")
    val rank = col(rankCol).cast("long")
    val perQuery = flagged.groupBy(col(queryIdCol)).agg(
      sum(when(col("__rel").isNotNull && rank <= k, 1L).otherwise(0L))
        .cast("long").as("hits_at_k"),
      min(when(col("__rel").isNotNull, rank)).as("__first_rel"),
      // element_at is 1-based like the rank; the when-guard keeps the
      // index in bounds
      sum(when(col("__rel").isNotNull && rank <= k,
          element_at(typedLit(disc), col(rankCol).cast("int")))
        .otherwise(0L)).cast("long").as("dcg_nanos"))
    perQuery
      .join(relCounts, Seq(queryIdCol), "left")
      .withColumn("n_rel", coalesce(col("n_rel"), lit(0L)))
      .withColumn("idcg_nanos",
        when(col("n_rel") > 0,
          element_at(typedLit(idcg), least(col("n_rel"), lit(k.toLong)).cast("int")))
          .otherwise(0L))
      .select(
        col(queryIdCol),
        col("n_rel"),
        col("hits_at_k"),
        expr("hits_at_k * 1000000 div greatest(n_rel, 1)").as("recall_micro"),
        (col("hits_at_k") > 0).cast("long").as("success_at_k"),
        coalesce(col("__first_rel"), lit(0L)).as("first_rel_rank"),
        when(col("__first_rel").isNull, 0L)
          .otherwise(expr("1000000 div __first_rel")).as("mrr_micro"),
        col("dcg_nanos"),
        col("idcg_nanos"),
        when(col("idcg_nanos") > 0,
          expr("dcg_nanos * 1000000 div idcg_nanos")).otherwise(0L)
          .as("ndcg_micro"))
  }
}
