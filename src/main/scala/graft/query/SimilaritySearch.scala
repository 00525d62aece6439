package graft.query

import graft.functions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Threshold-filtered top-k cosine similarity — the reference's core query
  * (A-14, reference src/clients/vector-client.ts:396-415, where it is
  * delegated wholesale to a pgvector `match_documents`-style stored
  * function: similarity + `WHERE similarity > threshold` +
  * `ORDER BY similarity DESC LIMIT count`). Here the same semantics are
  * explicit Spark plans.
  *
  * Scale notes (100 TB): the single-query path is a scan +
  * `TakeOrderedAndProject` — no shuffle of the index, only k rows reach the
  * driver. The batch path broadcasts the (small) query set so the big index
  * side never shuffles; per-query top-k is a windowed rank over
  * `queryId`-partitioned data, which shuffles only rows that survived the
  * threshold filter.
  */
object SimilaritySearch {

  /** One query vector: `filter(sim > threshold) ORDER BY sim DESC LIMIT k`.
    * Physical plan: TakeOrderedAndProject over the scan — no full sort.
    */
  def topK(
      index: DataFrame,
      embeddingCol: String,
      queryVec: Array[Float],
      k: Int,
      threshold: Double): DataFrame = {
    val sim = cosine_sim(col(embeddingCol), lit(queryVec))
    index
      .withColumn("sim", sim)
      .filter(col("sim") > threshold)
      .orderBy(col("sim").desc)
      .limit(k)
  }

  /** Batch of query vectors: broadcast the query side across the index,
    * threshold-filter, then per-query top-k with a deterministic tie-break
    * (sim desc, id asc).
    *
    * The per-query top-k is the [[graft.functions.TopKByScore]] typed
    * aggregate, NOT a `row_number()` window: a window must shuffle every
    * threshold-surviving (candidate × query) row before discarding any —
    * O(N·Q) rows at corpus size N — while the aggregate's map-side
    * partial step caps each task's contribution at k entries per query,
    * so the exchange carries O(tasks·Q·k). Same output, answer-sized
    * shuffle.
    *
    * @param queries DataFrame with (queryIdCol, queryVecCol)
    */
  def topKBatch(
      index: DataFrame,
      embeddingCol: String,
      idCol: String,
      queries: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      k: Int,
      threshold: Double): DataFrame =
    index.crossJoin(broadcast(queries))
      .withColumn("sim", cosine_sim(col(embeddingCol), col(queryVecCol)))
      .filter(col("sim") > threshold)
      .transform(topKExplode(_, queryIdCol, idCol, "sim", k))

  /** GROUP-CAPPED batch top-k — retrieval with a diversity
    * constraint: per query, keep at most `perGroupCap` hits from any
    * one group (source, domain, near-dup cluster...), then the global
    * top-k over the survivors. Cap-then-rank, not rank-then-cap: a
    * group's third-best hit never displaces another group's first,
    * which is the search-diversification contract (and what a
    * rank-then-drop would violate).
    *
    * Both stages are [[graft.functions.TopKByScore]] aggregates, so
    * the shuffles are answer-sized twice over: stage 1 caps each
    * (query, group) at `perGroupCap` entries with map-side partials,
    * stage 2 reduces those to k per query. No window ever sees the
    * candidate volume.
    *
    * @param groups (idCol, groupCol) — group assignment of the corpus
    * @return (queryIdCol, idCol, sim, rn), rn 1..k by (sim desc, id
    *         asc) over the cap survivors
    */
  def cappedTopKBatch(
      index: DataFrame,
      embeddingCol: String,
      idCol: String,
      groups: DataFrame,
      groupCol: String,
      queries: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      k: Int,
      perGroupCap: Int,
      threshold: Double): DataFrame =
    index.join(groups.select(col(idCol), col(groupCol)), idCol)
      .crossJoin(broadcast(queries))
      .withColumn("sim", cosine_sim(col(embeddingCol), col(queryVecCol)))
      .filter(col("sim") > threshold)
      .groupBy(col(queryIdCol), col(groupCol))
      .agg(topk_by(col(idCol), col("sim"), lit(perGroupCap)).as("__g"))
      .select(col(queryIdCol), explode(col("__g")).as("__e"))
      .select(col(queryIdCol),
        col("__e.id").as(idCol), col("__e.score").as("sim"))
      .transform(topKExplode(_, queryIdCol, idCol, "sim", k))

  /** Shared (group, score)-top-k tail: aggregate to per-group
    * `array<struct<id, score>>`, explode back to ranked rows
    * (groupCol, idAlias, scoreAlias, rn) with rn 1..k by (score desc,
    * id asc). Extracted so every batch-retrieval kernel shares one
    * shuffle shape.
    */
  private[graft] def topKExplode(
      scored: DataFrame,
      groupCol: String,
      idAlias: String,
      scoreAlias: String,
      k: Int): DataFrame =
    scored
      .groupBy(col(groupCol))
      .agg(topk_by(col(idAlias), col(scoreAlias), lit(k)).as("__topk"))
      .select(col(groupCol), posexplode(col("__topk")))
      .select(
        col(groupCol),
        col("col.id").as(idAlias),
        col("col.score").as(scoreAlias),
        (col("pos") + 1).cast("long").as("rn"))

  /** Per-group k-th best score by (score desc, id asc) — the floor the
    * two-pass IVF probes prune against. Groups holding fewer than k
    * rows emit nothing (their floor is the caller's threshold), and
    * k <= 0 yields an empty frame instead of an invalid array index.
    * Output: (groupCol, floorAlias).
    */
  private[graft] def kthBestScore(
      scored: DataFrame,
      groupCol: String,
      idCol: String,
      scoreCol: String,
      k: Int,
      floorAlias: String): DataFrame =
    if (k <= 0)
      scored.select(col(groupCol), col(scoreCol).as(floorAlias)).limit(0)
    else
      scored
        .groupBy(col(groupCol))
        .agg(topk_by(col(idCol), col(scoreCol), lit(k)).as("__t"))
        .filter(size(col("__t")) === k)
        .select(col(groupCol),
          element_at(col("__t"), k).getField("score").as(floorAlias))
}
