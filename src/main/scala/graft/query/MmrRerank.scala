package graft.query

import graft.Tables
import graft.functions.VectorOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One MMR-selected hit. */
case class MmrHit(query_id: Long, rank: Long, vec_id: Long, score: Double)

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998) —
  * the diversity pass a RAG retrieval stack (e.g. LangChain's
  * `maxMarginalRelevanceSearch`, the API family the reference's
  * similarity query belongs to — reference:
  * src/clients/vector-client.ts:396-415) applies after top-k: greedily
  * pick the candidate maximizing
  * `λ·sim(q, d) − (1−λ)·max_{s∈S} sim(d, s)`,
  * so later picks are penalized for being close to already-selected
  * ones. Near-duplicate hits stop crowding out coverage.
  *
  * Scale shape: the candidate generation is the existing distributed
  * top-k ([[SimilaritySearch.topKBatch]]); the greedy selection is
  * inherently sequential but operates on k' candidates PER QUERY
  * (k'=20 here) — a typed per-group fold over tiny groups, exactly the
  * [[graft.pipeline.SequencePacker]] pattern. Nothing quadratic ever
  * touches the corpus; the O(k'²) pairwise cosines happen per query
  * group on ≤ k' rows.
  *
  * Determinism: scores are fixed-order double arithmetic over the same
  * [[VectorOps.cosine]] kernel the engine uses everywhere; argmax
  * breaks ties toward the lower vec_id (ascending iteration + strict
  * `>`). The golden oracle re-implements the fold independently in
  * Python over the same parquet vectors.
  */
object MmrRerank {

  val Lambda = 0.7
  val CandidateK = 20
  val SelectK = 10

  /** Greedy MMR over one query's candidates. `cands` may arrive in any
    * order: selection iterates candidates in ascending vec_id so the
    * strict-> argmax tie-breaks identically everywhere. The redundancy
    * term is 0 for the first pick (S empty), else the true maximum
    * (which may be negative) of cosine to the selected set.
    */
  private[graft] def mmrSelect(
      cands: Seq[(Long, Double, Array[Float])],
      k: Int,
      lambda: Double): Seq[(Long, Double)] = {
    val remaining = scala.collection.mutable.LinkedHashMap(
      cands.sortBy(_._1).map(c => c._1 -> c): _*)
    val selected = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    while (out.size < k && remaining.nonEmpty) {
      var bestId = -1L
      var bestScore = Double.NegativeInfinity
      remaining.foreach { case (id, (_, simQ, emb)) =>
        val redundancy =
          if (selected.isEmpty) 0.0
          else {
            var m = Double.NegativeInfinity
            selected.foreach { s =>
              val cs = VectorOps.cosine(emb, s)
              if (cs > m) m = cs
            }
            m
          }
        val score = lambda * simQ - (1 - lambda) * redundancy
        if (score > bestScore) { bestScore = score; bestId = id }
      }
      val picked = remaining.remove(bestId).get
      selected += picked._3
      out += ((bestId, bestScore))
    }
    out.toSeq
  }

  /** Q70: MMR-re-ranked retrieval for the shared 10-query batch —
    * [[CandidateK]] exact-cosine candidates per query, [[SelectK]]
    * diversity-selected survivors with their MMR scores.
    */
  def q70(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables(spark, dir, "embeddings")
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    // threshold below any reachable cosine: MMR wants the top-k' by
    // similarity whatever the sign
    val cands = SimilaritySearch.topKBatch(
      e, "embedding", "vec_id", queries, "query_id", "qvec",
      k = CandidateK, threshold = -2.0)
    // re-attach candidate embeddings. The candidate list is tiny and
    // DRIVER-BOUNDED (queries × k' = 200 rows by contract), so collect
    // it and push the ids as an `isin` scan predicate: the fetch reads
    // only row groups whose vec_id range can hold a candidate (parquet
    // min/max pruning) instead of a second full corpus scan, and the
    // collected rows broadcast as a literal frame — the same
    // collected-ids discipline as AnnIndex.queryTopK. Like there, the
    // collect makes CONSTRUCTION eager: building this frame runs the
    // candidate-generation jobs even if the result is only explained
    val candRows = cands.select(col("query_id"), col("vec_id"), col("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // the constant-size assumption above, enforced: a future
    // CandidateK / query-batch change fails loudly here instead of
    // silently bloating the driver plan with a giant isin list
    require(candRows.length <= 10 * CandidateK,
      s"MmrRerank.q70: candidate collect (${candRows.length} rows) exceeds " +
        s"the documented bound (10 queries x $CandidateK candidates) — " +
        "re-derive the bound or move the fetch to a distributed join")
    val candDf = candRows.toSeq.toDF("query_id", "vec_id", "sim")
    val withVecs = e.select(col("vec_id"), col("embedding"))
      .filter(col("vec_id").isin(candRows.map(_._2).distinct.toSeq: _*))
      .join(broadcast(candDf), "vec_id")
      .select(col("query_id"), col("vec_id"), col("sim"), col("embedding"))
      .as[(Long, Long, Double, Array[Float])]
    withVecs
      .groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        val group = it.map(t => (t._2, t._3, t._4)).toSeq
        mmrSelect(group, SelectK, Lambda).zipWithIndex.map {
          case ((vid, score), i) => MmrHit(qid, i + 1L, vid, score)
        }.iterator
      }
      .toDF()
      .orderBy("query_id", "rank")
  }
}
