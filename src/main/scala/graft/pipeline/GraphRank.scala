package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over an explicit edge list, in EXACT integer micro-mass
  * arithmetic — graph centrality as a corpus-curation signal (rank the
  * semantic k-NN graph to find prototypical vs peripheral documents;
  * PageRank-style data selection is the published shape, e.g. Wettig
  * et al. 2024's model-free rating baselines).
  *
  * Determinism discipline: float PageRank sums in nondeterministic
  * order and never hash-matches across engines, so mass is integer
  * micro-units (Scale = 10¹²) and every step is a Long multiply/`div`:
  * share(u→v) = (r(u)·85) div (100·outdeg(u)), teleport =
  * (Scale·15) div (100·N). Floor division leaks a deterministic dust
  * of mass per step (the usual integer-PageRank tradeoff) — identical
  * in Spark and the oracle's unrolled SQL, so results compare exactly.
  *
  * Scale shape: one shuffle to build (edges ⋈ outdeg) — persisted and
  * reused all iterations (internal lifecycle, released in finally) —
  * then per iteration one src-keyed join, one dst-keyed partial-agg
  * shuffle, one left join back to nodes; `localCheckpoint` truncates
  * the 10-deep lineage the way [[Dedup]]'s label propagation does.
  * Dangling nodes (no out-edges) redistribute their damped mass
  * UNIFORMLY each iteration — the standard exact treatment: their
  * pooled mass is one scalar aggregate (anti-join against the edge
  * sources, then sum — a one-row frame broadcast back), so total mass
  * is conserved up to deterministic floor-division dust on every
  * topology, sinks included, not just out-regular graphs like the
  * k-NN graph.
  *
  * Long-overflow headroom: r ≤ Scale, so r·85 ≤ 8.5·10¹³ and any
  * node's received sum ≤ total mass Scale — orders of magnitude under
  * 2⁶³.
  */
object GraphRank {

  /** Total micro-mass distributed across the graph. */
  val Scale = 1000000000000L

  /** @param nodes one `id` column, ids unique
    * @param edges `src`/`dst` columns, a subset of node ids
    * @param iters fixed iteration count (no convergence test — the
    *              oracle must run the identical number of steps)
    * @return (id, r) — r = integer micro-mass rank after `iters` steps
    */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int): DataFrame = {
    val n = nodes.count()
    require(n > 0, "pageRank over an empty node set")
    val base = Scale / n
    val teleport = (Scale * 15L) / (100L * n)
    // out-degree folded onto each edge once; persisted because every
    // iteration re-reads it (internal frame, internal lifecycle)
    val ed = edges
      .join(edges.groupBy("src").agg(count(lit(1)).as("__deg")), "src")
      .persist()
    // the dangling set is fixed across iterations: nodes absent from
    // the edge sources. Materialized ONCE as an id frame; per iteration
    // the pooled mass is then one semi-join + scalar sum against that
    // (usually tiny) frame — and on out-regular graphs like the k-NN
    // graph the set is EMPTY, in which case the dangling term is
    // exactly zero every iteration and all its per-iteration jobs
    // (anti-join, scalar agg, broadcast) are skipped outright: the sum
    // over an empty set is 0, so the recurrence is unchanged (r21
    // measurement: the dangling machinery was ~2 of the ~5 stages each
    // of the 10 iterations paid, all for a constant-zero term here).
    val dangIds = nodes
      .join(edges.select(col("src")).distinct(),
        nodes("id") === col("src"), "left_anti")
      .select(col("id").as("__did"))
      .localCheckpoint()
    val hasDangling = !dangIds.isEmpty
    try {
      ed.count()
      var ranks = nodes.select(col("id"), lit(base).as("r"))
      for (_ <- 1 to iters) {
        val contrib = ed
          .join(ranks, ed("src") === ranks("id"))
          .select(col("dst").as("id"),
            expr("(r * 85L) div (100L * __deg)").as("__c"))
          .groupBy("id").agg(sum(col("__c")).as("__s"))
        val withMass = nodes.join(contrib, Seq("id"), "left")
        ranks = (if (hasDangling) {
          // pooled damped mass of dangling nodes, shared uniformly —
          // exact conservation (up to floor dust) on sink topologies
          val dangling = ranks
            .join(dangIds, ranks("id") === col("__did"), "left_semi")
            .agg(coalesce(sum(col("r")), lit(0L)).as("__d"))
          withMass
            .crossJoin(broadcast(dangling))
            .select(col("id"),
              (lit(teleport) + coalesce(col("__s"), lit(0L)) +
                expr(s"(__d * 85L) div (100L * ${n}L)")).as("r"))
        } else {
          withMass.select(col("id"),
            (lit(teleport) + coalesce(col("__s"), lit(0L))).as("r"))
        }).localCheckpoint()
      }
      ranks
    } finally ed.unpersist()
  }
}
