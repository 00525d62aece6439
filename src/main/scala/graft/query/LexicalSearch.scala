package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25-style lexical retrieval + reciprocal-rank hybrid fusion — the
  * keyword half of hybrid search. The reference's retrieval surface is
  * vector-only (reference src/clients/vector-client.ts:396-415); every
  * production RAG deployment of that shape pairs it with a lexical
  * (BM25) channel and fuses the two rankings, so this module completes
  * the query path: [[bm25TopK]] is the inverted-index scorer,
  * [[rrfFuse]] is Reciprocal Rank Fusion (Cormack, Clarke & Büttcher,
  * SIGIR 2009) over the two channels' ranks.
  *
  * Determinism contract (the cross-engine disciplines of q47/q52/q57):
  *
  *  - The Robertson idf `ln((N - df + ½)/(df + ½))` is replaced by the
  *    micro-quantized RATIONAL `⌊10⁶·(2N−2df+1)/(2df+1)⌋` — `ln` is a
  *    libm call with no bit guarantee across engines, while one BIGINT
  *    division is exact everywhere, and `ln` is monotone so each
  *    term's idf ORDER is preserved (sums across terms can reorder vs
  *    log-BM25; the quantized-rational scorer IS the contract).
  *  - The tf saturation `tf·(k1+1)/(tf + k1·(1−b+b·len/avglen))` with
  *    k1=6/5, b=3/4 is cleared of denominators (multiply through by
  *    20·totalLen) into `44·tf·L / (20·tf·L + 6·L + 18·len·N)` with
  *    L = Σ len — again one integer division after micro-scaling.
  *  - A term's score is `idf_micro · sat_micro` (micro² units, exact
  *    BIGINT), a document's score the integer SUM — order-independent,
  *    so partial aggregation cannot perturb ranks. Long-bound: holds to
  *    ~10¹² total corpus tokens with tf ≤ 10³ (44·tf·L·10⁶ < 2⁶³);
  *    shard corpora beyond that.
  *
  * Scale shape (100 TB): tf/df are two partial-aggregated shuffles over
  * (doc, term) / (term); the query side broadcasts; candidate scoring
  * touches only documents sharing ≥1 query term (the posting-list
  * lookup, realized as a broadcast semi-restriction of the tf table) —
  * the corpus itself never shuffles and never cross-joins.
  */
object LexicalSearch {

  /** Whitespace tokens — the q18/q19/q47 tokenization, shared so the
    * lexical channel scores the same terms the analysis suite counts.
    */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** BM25 top-k for a batch of term-set queries over a document corpus.
    *
    * @param docs       corpus with (idCol, textCol)
    * @param queryTerms SMALL frame of (queryIdCol, termCol), distinct
    *                   terms per query (duplicate query terms are not
    *                   re-weighted); broadcast to the posting lists
    * @param k          results per query; ties broken by ascending id
    * @return (queryIdCol, rank, idCol, score) — score in micro² units
    */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: DataFrame,
      queryIdCol: String,
      termCol: String,
      k: Int): DataFrame = {
    val toks = docs.select(col(idCol), tokens(col(textCol)).as("__toks"))
    val lens = toks.select(col(idCol), size(col("__toks")).cast("long").as("__len"))
    // one-row corpus stats frame, broadcast by the cross join below
    val stats = lens.agg(
      count(lit(1)).as("__n_docs"),
      sum("__len").as("__total_len"))
    val tf = toks
      .select(col(idCol), explode(col("__toks")).as(termCol))
      .groupBy(col(idCol), col(termCol))
      .agg(count(lit(1)).as("__tf"))
    // posting-list lookup: only (doc, term) rows whose term some query
    // asked for survive — the broadcast hash join is the index probe
    val qt = broadcast(queryTerms.select(col(queryIdCol), col(termCol)).distinct())
    val cand = tf.join(qt, termCol)
    // df per QUERY term only (aggregated over the full posting lists,
    // restricted before the shuffle so the agg input is already small)
    val dfq = tf.join(broadcast(qt.select(termCol).distinct()), termCol)
      .groupBy(col(termCol)).agg(count(lit(1)).as("__df"))
    val scored = cand
      .join(broadcast(dfq), termCol)
      .join(lens, idCol)
      .crossJoin(broadcast(stats))
      .withColumn("__idf_micro",
        expr("((2 * __n_docs - 2 * __df + 1) * 1000000) div (2 * __df + 1)"))
      .withColumn("__sat_micro",
        expr("(44 * __tf * __total_len * 1000000) div " +
          "(20 * __tf * __total_len + 6 * __total_len + 18 * __len * __n_docs)"))
      .groupBy(col(queryIdCol), col(idCol))
      .agg(sum(col("__idf_micro") * col("__sat_micro")).as("score"))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("score").desc, col(idCol).asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col("rank"), col(idCol), col("score"))
  }

  /** RRF rank-fusion constant — the k=60 of Cormack et al. 2009. */
  val RrfK = 60

  /** Reciprocal Rank Fusion of two ranked lists sharing an id space:
    * score(d) = Σ_channels 1/(60 + rank_channel(d)), summed over the
    * channels that returned d. Computed in exact micro-units
    * (`10¹² div (60 + rank)`) so fusion is pure BIGINT — no float sum
    * whose order could differ between engines. Channels join FULL
    * OUTER: a document needs only one channel to be fused, which is the
    * point of RRF (vector recall backstops lexical vocabulary gaps and
    * vice versa).
    *
    * @param a,b (queryIdCol, idCol, rankCol) frames — top-k' slices,
    *            at most one row per (query, id) each
    * @return (queryIdCol, rank, idCol, rrf_micro, a_rank, b_rank);
    *         per-query rank by fused score desc, id asc; missing
    *         channel ranks are null
    */
  def rrfFuse(
      a: DataFrame,
      b: DataFrame,
      queryIdCol: String,
      idCol: String,
      rankCol: String,
      k: Int): DataFrame = {
    val aa = a.select(col(queryIdCol).as("__qa"), col(idCol).as("__ia"),
      col(rankCol).cast("long").as("a_rank"))
    val bb = b.select(col(queryIdCol).as("__qb"), col(idCol).as("__ib"),
      col(rankCol).cast("long").as("b_rank"))
    val fused = aa.join(bb,
        col("__qa") === col("__qb") && col("__ia") === col("__ib"), "full_outer")
      .select(
        coalesce(col("__qa"), col("__qb")).as(queryIdCol),
        coalesce(col("__ia"), col("__ib")).as(idCol),
        col("a_rank"), col("b_rank"))
      .withColumn("rrf_micro",
        coalesce(expr(s"1000000000000 div (${RrfK} + a_rank)"), lit(0L)) +
          coalesce(expr(s"1000000000000 div (${RrfK} + b_rank)"), lit(0L)))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("rrf_micro").desc, col(idCol).asc)
    fused
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col("rank"), col(idCol),
        col("rrf_micro"), col("a_rank"), col("b_rank"))
  }
}
